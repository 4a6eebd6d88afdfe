"""Pauli-frame simulator tests (sim/frame.py).

Three independent checks pin the frame engine to the physics:

1. EXACT equivalence with the batched tableau engine on the memory
   experiment — both engines consume the PRNG keys identically, so the
   sampled fault patterns coincide and the detector histories must match
   bit for bit (the final word differs only by the reference codeword,
   invisible to syndromes and logical parity).
2. Single-fault detector signatures match the independent DEM enumeration
   (`decode.dem._round_faults`) for every gate position and X-pattern of
   the extraction circuit — the same cross-validation Stim applies to its
   detector error models.
3. Gate-propagation rules agree with the tableau's Pauli-frame
   conjugation on random circuits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcss_tpu.circuits.ir import Circuit, OPCODES
from qcss_tpu.codes import families
from qcss_tpu.decode.dem import _round_faults, extraction_gate_list
from qcss_tpu.experiments.memory import (
    _memory_circuit,
    _memory_circuit_frames,
    z_extraction_circuit,
    z_memory_experiment,
)
from qcss_tpu.sim import frame as fr
from qcss_tpu.sim import tableau as tb
from qcss_tpu.sim.noise import NoiseModel


class TestExactTableauEquivalence:
    def test_memory_circuit_bit_identical(self):
        code = families.rotated_surface(3)
        noise = NoiseModel(p_gate2=3e-3, p_meas=1e-2)
        h2 = code.raw_parity_check_c2
        ea = tuple(map(jnp.asarray,
                       z_extraction_circuit(code, checks=h2).to_arrays()))
        pa = tuple(map(jnp.asarray, code.noisy_encode_zero().to_arrays()))
        k = jax.random.key(7)
        s1, w1 = _memory_circuit(k, 256, 3, code, noise, pa, ea, h2.shape[0])
        s2, w2 = _memory_circuit_frames(k, 256, 3, code, noise, ea,
                                        h2.shape[0])
        s1, w1, s2, w2 = map(np.asarray, (s1, w1, s2, w2))
        assert (s1 == s2).all()
        lz = code.z_operator_matrix()
        assert (((w1 @ h2.T) & 1) == ((w2 @ h2.T) & 1)).all()
        assert (((w1 @ lz[0]) & 1) == ((w2 @ lz[0]) & 1)).all()

    def test_experiment_end_to_end_equal(self):
        code = families.rotated_surface(3)
        noise = NoiseModel(p_gate2=2e-3, p_meas=1e-2)
        kw = dict(rounds=3, noise=noise, batch=1 << 9, seed=3, decoder="uf")
        out_t = z_memory_experiment(code, engine="tableau", **kw)
        out_f = z_memory_experiment(code, engine="frames", **kw)
        assert out_t["logical_fail"] == out_f["logical_fail"]
        assert out_t["residual_syndrome"] == out_f["residual_syndrome"]

    def test_bit_identical_under_biased_noise(self):
        """The twirled-decoherence (tuple-rate) channel must ALSO consume
        keys identically to the tableau path — regression for the
        _inject2 tuple branch, which once split the per-gate key where
        noise.depolarize2 draws one (B, 2) uniform unsplit."""
        code = families.rotated_surface(3)
        noise = NoiseModel.from_decoherence(300e-6, 300e-6,
                                            ro_fidelity=0.99)
        h2 = code.raw_parity_check_c2
        ea = tuple(map(jnp.asarray,
                       z_extraction_circuit(code, checks=h2).to_arrays()))
        pa = tuple(map(jnp.asarray, code.noisy_encode_zero().to_arrays()))
        k = jax.random.key(21)
        s1, w1 = _memory_circuit(k, 128, 3, code, noise, pa, ea, h2.shape[0])
        s2, w2 = _memory_circuit_frames(k, 128, 3, code, noise, ea,
                                        h2.shape[0])
        assert (np.asarray(s1) == np.asarray(s2)).all()
        lz = code.z_operator_matrix()
        w1, w2 = np.asarray(w1), np.asarray(w2)
        assert (((w1 @ lz[0]) & 1) == ((w2 @ lz[0]) & 1)).all()

    def test_noiseless_is_silent(self):
        code = families.rotated_surface(3)
        out = z_memory_experiment(code, rounds=3, noise=NoiseModel(),
                                  batch=128, decoder="uf", engine="frames")
        assert out["logical_fail"] == 0.0
        assert out["residual_syndrome"] == 0.0


class TestSingleFaultVsDEM:
    def test_every_gate_and_pattern_matches_dem_signature(self):
        """Inject each single X-component fault at each gate position of
        the extraction round; the frame-sim detector history must equal
        the DEM's predicted signature (decode/dem.py:43-90)."""
        code = families.rotated_surface(3)
        h = code.raw_parity_check_c2
        r, n = h.shape
        gates = extraction_gate_list(code, h)
        ea = z_extraction_circuit(code, checks=h).to_arrays()
        ops, q0, q1 = (np.asarray(a) for a in ea)
        rounds = 3
        anc = jnp.arange(n, n + r, dtype=jnp.int32)
        data = jnp.arange(n, dtype=jnp.int32)

        # DEM per-round fault list: 3 entries per gate in order
        # (data-side X, anc-side X, exact X⊗X = their symmetric
        # difference) — decode/dem.py.
        dem_faults = _round_faults(h, gates, p_gate2=1e-3, p_meas=0.0,
                                   p_reset=0.0)
        assert len(dem_faults) == 3 * len(gates)

        # ALL (gate, pattern) cases as one frame batch — sample b carries
        # its own injection mask, XORed in right after its gate of the
        # fault round. (The original one-case-at-a-time loop dispatched
        # ~5,000 batch-1 device ops and was the slowest test in the suite.)
        fault_round = 1
        cases = []
        inj = np.zeros((len(ops), 3 * len(gates), n + r), np.uint8)
        for k in range(len(gates)):
            j, c = gates[k]
            for xd, xa in ((1, 0), (0, 1), (1, 1)):
                b = len(cases)
                if xd:
                    inj[k, b, j] = 1
                if xa:
                    inj[k, b, n + c] = 1
                cases.append((k, xd, xa))
        inj_j = jnp.asarray(inj)

        f = fr.zero_frames(len(cases), n + r)
        syns = []
        for t in range(rounds):
            for g in range(len(ops)):
                f = fr.propagate_arrays(
                    f, ops[g:g + 1], q0[g:g + 1], q1[g:g + 1])
                if t == fault_round:
                    f = fr.Frames(f.x ^ inj_j[g], f.z)
            f, syn = fr.measure_deviations(f, anc)
            f = fr.reset_qubits(f, anc)
            syns.append(np.asarray(syn))
        _, word = fr.measure_deviations(f, data)
        final = (np.asarray(word) @ h.T) & 1
        det_slices = [syns[0]]
        for t in range(1, rounds):
            det_slices.append(syns[t] ^ syns[t - 1])
        det_slices.append(final ^ syns[rounds - 1])
        all_dets = np.concatenate(det_slices, axis=1)  # [B, (rounds+1)*r]

        checked = 0
        for b, (k, xd, xa) in enumerate(cases):
            sig_data = set(dem_faults[3 * k][0])
            sig_anc = set(dem_faults[3 * k + 1][0])
            # the DEM's X⊗X entry must BE the symmetric difference the
            # frame engine measures (it used to be decomposed into both
            # component edges — calibration caught the discrepancy)
            assert set(dem_faults[3 * k + 2][0]) == sig_data ^ sig_anc
            expect = {(1, 0): sig_data, (0, 1): sig_anc,
                      (1, 1): sig_data ^ sig_anc}[(xd, xa)]
            fired = tuple(sorted(
                (int(i // r) - fault_round, int(i % r))
                for i in np.nonzero(all_dets[b])[0]
            ))
            assert fired == tuple(sorted(expect)), (k, (xd, xa), fired)
            checked += 1
        assert checked == 3 * len(gates)


class TestCompiledCircuits:
    def test_compiled_bit_identical_to_scan(self):
        """Matrix-form execution (out = in·M ⊕ faults·S with vmapped
        per-gate RNG) must reproduce the per-gate scan EXACTLY for every
        noise-model shape, including the windowed (block-offset) apply."""
        from qcss_tpu.circuits.ir import Circuit

        rng = np.random.default_rng(1)
        n = 8
        for trial in range(6):
            circ = Circuit()
            for _ in range(30):
                g = rng.choice(["h", "s", "cnot", "cz", "x"])
                a = int(rng.integers(n))
                if g in ("cnot", "cz"):
                    b = int(rng.integers(n - 1))
                    b += b >= a
                    getattr(circ, g)(a, b)
                else:
                    getattr(circ, g)(a)
            ops, q0, q1 = circ.to_arrays()
            comp = fr.compile_circuit(ops, q0, q1, n)
            B = 32
            x0 = jnp.asarray(rng.integers(0, 2, (B, n)), jnp.uint8)
            f0 = fr.Frames(x0, x0[:, ::-1])
            for model in (
                NoiseModel(),
                NoiseModel(p_gate1=0.3, p_gate2=0.4),
                NoiseModel(p_gate2=0.5),
                NoiseModel(p_gate1=0.2, p_gate2=0.3,
                           pauli1=(0.05, 0.05, 0.1),
                           pauli2=(0.1, 0.1, 0.1)),
            ):
                key = jax.random.key(trial + 10)
                a1 = fr.run_arrays_noisy(f0, ops, q0, q1, model, key)
                a2 = fr.run_compiled_noisy(f0, comp, model, key)
                assert (np.asarray(a1.x) == np.asarray(a2.x)).all()
                assert (np.asarray(a1.z) == np.asarray(a2.z)).all()
            # windowed apply inside wider frames
            NQ = n + 5
            fw = fr.Frames(
                jnp.zeros((B, NQ), jnp.uint8).at[:, 3:3 + n].set(x0),
                jnp.zeros((B, NQ), jnp.uint8).at[:, 3:3 + n].set(x0[:, ::-1]),
            )
            model = NoiseModel(p_gate2=0.4)
            key = jax.random.key(trial)
            aw = fr.run_compiled_noisy(fw, comp, model, key,
                                       qubits=jnp.arange(3, 3 + n))
            ref = fr.run_compiled_noisy(f0, comp, model, key)
            assert (np.asarray(aw.x)[:, 3:3 + n] == np.asarray(ref.x)).all()
            assert (np.asarray(aw.z)[:, 3:3 + n] == np.asarray(ref.z)).all()


class TestGatePropagation:
    def test_random_circuit_matches_tableau_frame_conjugation(self):
        """Propagate a random frame through a random Clifford circuit in
        both representations: frame rules vs injecting the frame into a
        tableau before the circuit and reading syndrome-visible effects
        after. Equivalence via measurement deviations on every qubit."""
        rng = np.random.default_rng(5)
        n = 8
        for trial in range(10):
            circ = Circuit()
            for _ in range(30):
                g = rng.choice(["H", "S", "CNOT", "CZ"])
                a = int(rng.integers(n))
                if g in ("CNOT", "CZ"):
                    b = int(rng.integers(n - 1))
                    b = b + 1 if b >= a else b
                    getattr(circ, g.lower())(a, b)
                else:
                    getattr(circ, g.lower())(a)
            ops, q0, q1 = circ.to_arrays()
            x0 = rng.integers(0, 2, (1, n)).astype(np.uint8)
            z0 = rng.integers(0, 2, (1, n)).astype(np.uint8)

            f = fr.Frames(jnp.asarray(x0), jnp.asarray(z0))
            f = fr.propagate_arrays(f, ops, q0, q1)

            # reference: conjugate through the tableau by running the
            # circuit on |0...0> with and without the injected frame and
            # comparing deterministic stabilizer expectations is overkill;
            # instead use the tableau's own frame conjugation: a Pauli P
            # propagated through circuit U satisfies U P = P' U with P'
            # given by the same column rules the tableau applies.
            xs, zs = x0[0].copy(), z0[0].copy()
            for op, a, b in zip(*(np.asarray(v) for v in (ops, q0, q1))):
                name = ("I", "X", "Y", "Z", "H", "S", "CNOT", "CZ")[op]
                if name == "H":
                    xs[a], zs[a] = zs[a], xs[a]
                elif name == "S":
                    zs[a] ^= xs[a]
                elif name == "CNOT":
                    xs[b] ^= xs[a]
                    zs[a] ^= zs[b]
                elif name == "CZ":
                    zs[a] ^= xs[b]
                    zs[b] ^= xs[a]
            assert (np.asarray(f.x)[0] == xs).all()
            assert (np.asarray(f.z)[0] == zs).all()
