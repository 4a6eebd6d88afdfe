"""Tableau simulator tests: exact cross-validation against a dense
statevector simulator on random Clifford circuits with measurements, plus
structural invariants and batched-semantics checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcss_tpu.circuits.ir import Circuit
from qcss_tpu.sim import tableau as tb
from qcss_tpu.sim.statevec import StateVector

GATES_1Q = ["H", "S", "X", "Y", "Z"]
GATES_2Q = ["CNOT", "CZ"]


def random_circuit(rng, n, depth):
    circ = Circuit()
    for _ in range(depth):
        if n >= 2 and rng.random() < 0.4:
            q1, q2 = rng.choice(n, size=2, replace=False)
            circ.gate(str(rng.choice(GATES_2Q)), int(q1), int(q2))
        else:
            circ.gate(str(rng.choice(GATES_1Q)), int(rng.integers(n)))
    return circ


def tableau_probs_match_statevec(circ, n, n_measure, seed):
    """Run circuit on both simulators; measure each qubit in sequence on the
    tableau (batch=1), replay the same outcomes on the statevector by forced
    collapse, checking the outcome was possible (prob > 0) and that
    deterministic outcomes agree exactly."""
    t = tb.zero_state(1, n)
    t = tb.run_circuit(t, circ)
    sv = StateVector(n)
    sv.run_circuit(circ)

    key = jax.random.key(seed)
    for q in range(n_measure):
        key, sub = jax.random.split(key)
        p1 = sv.prob_one(q)
        t, outcome = tb.measure_z(t, q, sub)
        o = int(outcome[0])
        if p1 < 1e-9:
            assert o == 0, f"tableau says 1, statevec prob_one=0 (qubit {q})"
        elif p1 > 1 - 1e-9:
            assert o == 1, f"tableau says 0, statevec prob_one=1 (qubit {q})"
        else:
            assert abs(p1 - 0.5) < 1e-9, "Clifford probs must be 0, 1/2, 1"
        sv.collapse(q, o)


class TestAgainstStatevector:
    @pytest.mark.parametrize("seed", range(20))
    def test_random_circuits_n3(self, seed):
        rng = np.random.default_rng(seed)
        circ = random_circuit(rng, 3, 25)
        tableau_probs_match_statevec(circ, 3, 3, seed)

    @pytest.mark.parametrize("seed", range(10))
    def test_random_circuits_n4_with_mid_measure(self, seed):
        """Interleave measurements with gates."""
        rng = np.random.default_rng(100 + seed)
        n = 4
        t = tb.zero_state(1, n)
        sv = StateVector(n)
        key = jax.random.key(seed)
        for _ in range(6):
            circ = random_circuit(rng, n, 8)
            t = tb.run_circuit(t, circ)
            sv.run_circuit(circ)
            q = int(rng.integers(n))
            key, sub = jax.random.split(key)
            p1 = sv.prob_one(q)
            t, outcome = tb.measure_z(t, q, sub)
            o = int(outcome[0])
            if p1 < 1e-9:
                assert o == 0
            elif p1 > 1 - 1e-9:
                assert o == 1
            sv.collapse(q, o)


class TestDeterministicCircuits:
    def test_bell_pair_correlations(self):
        t = tb.zero_state(256, 2)
        t = tb.run_circuit(t, Circuit().h(0).cnot(0, 1))
        key = jax.random.key(0)
        k1, k2 = jax.random.split(key)
        t, o1 = tb.measure_z(t, 0, k1)
        t, o2 = tb.measure_z(t, 1, k2)
        o1, o2 = np.asarray(o1), np.asarray(o2)
        # Perfectly correlated, roughly balanced.
        assert np.array_equal(o1, o2)
        assert 0.3 < o1.mean() < 0.7

    def test_ghz(self):
        t = tb.zero_state(128, 3)
        t = tb.run_circuit(t, Circuit().h(0).cnot(0, 1).cnot(0, 2))
        key = jax.random.key(1)
        outs = []
        for q in range(3):
            key, sub = jax.random.split(key)
            t, o = tb.measure_z(t, q, sub)
            outs.append(np.asarray(o))
        assert np.array_equal(outs[0], outs[1])
        assert np.array_equal(outs[0], outs[2])

    def test_x_flips_outcome(self):
        t = tb.zero_state(4, 1)
        t = tb.apply_x(t, 0)
        t, o = tb.measure_z(t, 0, jax.random.key(0))
        assert np.all(np.asarray(o) == 1)

    def test_remeasure_is_stable(self):
        # After a random measurement, re-measuring gives the same outcome.
        t = tb.zero_state(512, 1)
        t = tb.apply_h(t, 0)
        key = jax.random.key(2)
        k1, k2 = jax.random.split(key)
        t, o1 = tb.measure_z(t, 0, k1)
        t, o2 = tb.measure_z(t, 0, k2)
        assert np.array_equal(np.asarray(o1), np.asarray(o2))
        assert 0.3 < np.asarray(o1).mean() < 0.7

    def test_hzh_is_x(self):
        t = tb.zero_state(2, 1)
        t = tb.run_circuit(t, Circuit().h(0).z(0).h(0))
        t, o = tb.measure_z(t, 0, jax.random.key(3))
        assert np.all(np.asarray(o) == 1)

    def test_s_squared_is_z(self):
        t = tb.zero_state(2, 1)
        t = tb.run_circuit(t, Circuit().h(0).s(0).s(0).h(0))  # HZH = X
        t, o = tb.measure_z(t, 0, jax.random.key(4))
        assert np.all(np.asarray(o) == 1)


class TestReset:
    def test_reset_from_one(self):
        t = tb.zero_state(8, 2)
        t = tb.apply_x(t, 0)
        t = tb.reset_z(t, 0, jax.random.key(0))
        t, o = tb.measure_z(t, 0, jax.random.key(1))
        assert np.all(np.asarray(o) == 0)

    def test_reset_from_superposition(self):
        t = tb.zero_state(64, 1)
        t = tb.apply_h(t, 0)
        t = tb.reset_z(t, 0, jax.random.key(2))
        t, o = tb.measure_z(t, 0, jax.random.key(3))
        assert np.all(np.asarray(o) == 0)


class TestBatchedSemantics:
    def test_masked_circuit_application(self):
        t = tb.zero_state(4, 1)
        mask = jnp.asarray([1, 0, 1, 0], dtype=jnp.uint8)
        t = tb.run_circuit_masked(t, Circuit().x(0), mask)
        t, o = tb.measure_z(t, 0, jax.random.key(0))
        assert np.array_equal(np.asarray(o), [1, 0, 1, 0])

    def test_pauli_frame_injection(self):
        t = tb.zero_state(3, 2)
        x_flips = jnp.asarray([[1, 0], [0, 0], [0, 1]], dtype=jnp.uint8)
        z_flips = jnp.zeros((3, 2), dtype=jnp.uint8)
        t = tb.apply_pauli_frame(t, x_flips, z_flips)
        t, o0 = tb.measure_z(t, 0, jax.random.key(0))
        t, o1 = tb.measure_z(t, 1, jax.random.key(1))
        assert np.array_equal(np.asarray(o0), [1, 0, 0])
        assert np.array_equal(np.asarray(o1), [0, 0, 1])

    def test_frame_matches_gates(self):
        # apply_pauli_frame == applying the individual X/Z gates.
        rng = np.random.default_rng(5)
        n = 4
        circ = random_circuit(rng, n, 20)
        base = tb.run_circuit(tb.zero_state(1, n), circ)
        x_f = jnp.asarray(rng.integers(0, 2, (1, n)), dtype=jnp.uint8)
        z_f = jnp.asarray(rng.integers(0, 2, (1, n)), dtype=jnp.uint8)
        via_frame = tb.apply_pauli_frame(base, x_f, z_f)
        via_gates = base
        for q in range(n):
            if int(x_f[0, q]):
                via_gates = tb.apply_x(via_gates, q)
            if int(z_f[0, q]):
                via_gates = tb.apply_z(via_gates, q)
        assert np.array_equal(np.asarray(via_frame.r), np.asarray(via_gates.r))
        assert np.array_equal(np.asarray(via_frame.x), np.asarray(via_gates.x))


class TestEncodingNetworksOnTableau:
    """The tableau simulator must reproduce the symplectic verifier's result
    for encoding networks (it generalizes it with phases/destabilizers)."""

    def test_steane_encode_zero_stabilizer_space(self):
        from qcss_tpu.codes import families
        from qcss_tpu.ops import gf2

        code = families.steane()
        n = code.n
        t = tb.zero_state(1, n)
        t = tb.run_circuit(t, code.noisy_encode_zero())
        got = np.asarray(t.stabilizer_check_matrix()[0])
        # Expected stabilizer group: X checks + Z checks + Z̄.
        rows = []
        for i in range(code.r_1):
            row = np.zeros(2 * n, np.uint8)
            row[:n] = code.parity_check_c1[i]
            rows.append(row)
        for i in range(code.r_2):
            row = np.zeros(2 * n, np.uint8)
            row[n:] = code.parity_check_c2[i]
            rows.append(row)
        zbar = np.zeros(2 * n, np.uint8)
        zbar[n:] = code.z_operator_matrix()[0]
        rows.append(zbar)
        assert np.array_equal(gf2.rref(got), gf2.rref(np.array(rows)))
        # All signs positive: starting from |0>^n with H/CNOT only.
        assert not np.any(np.asarray(t.r[0, n:]))

    def test_logical_zero_measures_zero(self):
        from qcss_tpu.codes import families

        code = families.steane()
        t = tb.zero_state(16, code.n)
        t = tb.run_circuit(t, code.noisy_encode_zero())
        # Measure logical Z̄ = product of Z on its support, via measuring all
        # qubits and computing the parity over the Z̄ support.
        key = jax.random.key(7)
        outs = []
        for q in range(code.n):
            key, sub = jax.random.split(key)
            t, o = tb.measure_z(t, q, sub)
            outs.append(np.asarray(o))
        outs = np.stack(outs, axis=1)  # [B, n]
        zbar = code.z_operator_matrix()[0].astype(int)
        parity = (outs.astype(int) @ zbar) & 1
        assert not np.any(parity)
        # Codeword constraint: H2 syndrome of the measured word is 0.
        syn = (outs.astype(int) @ code.parity_check_c2.T.astype(int)) & 1
        assert not np.any(syn)
