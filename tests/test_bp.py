"""BP(+OSD) decoder and the qLDPC code families it serves.

The reference has no qLDPC analogue (its only decoder is the emitted
syndrome-table scan, reference: css_code.py:649-685); these tests pin the
framework's own guarantees: published [[n, k, d]] parameters reproduce,
the redundant check sets are permutation-consistent with the reduced
ones, BP+OSD is exact on every weight <= t error of the flagship BB
code, the OSD fallback always satisfies the syndrome, and the spacetime
Tanner decode suppresses phenomenological noise.
"""

import os
from itertools import combinations

import numpy as np
import pytest

from qcss_tpu.codes import families
from qcss_tpu.decode.bp import (
    BPDecoder,
    bp_logical_error_rate,
    bp_phenomenological_error_rate,
    spacetime_tanner,
)
from qcss_tpu.ops import gf2


@pytest.mark.parametrize(
    "ctor, n, k",
    [
        (families.bb72, 72, 12),
        (families.bb90, 90, 8),
        (families.bb144, 144, 12),
    ],
)
def test_bb_parameters(ctor, n, k):
    code = ctor()
    assert code.n == n
    assert code.k == k
    # weight-6 checks, 3 per qubit per sector (the BB LDPC property)
    h1 = code.redundant_parity_check_c1
    h2 = code.redundant_parity_check_c2
    assert h1.shape == (n // 2, n) and h2.shape == (n // 2, n)
    assert (h1.sum(axis=1) == 6).all() and (h2.sum(axis=1) == 6).all()
    assert (h1.sum(axis=0) == 3).all() and (h2.sum(axis=0) == 3).all()


def test_hypergraph_product_parameters():
    # repetition-code product: the [[41, 1, 4/5]] surface-like code
    h = np.zeros((4, 5), np.uint8)
    for i in range(4):
        h[i, i] = h[i, i + 1] = 1
    code = families.hypergraph_product(h, h)
    assert code.n == 4 * 4 + 5 * 5
    assert code.k == 1


@pytest.mark.parametrize("ctor", [families.bb72, families.bb90])
def test_redundant_checks_match_reduced_rowspace(ctor):
    """The full (rank-deficient) check sets, mapped through column_perm
    into internal qubit order, must span exactly the same space as the
    independent rows the CSSCode was built from — this is what makes
    their syndromes decodable against the code's own operators."""
    code = ctor()
    for red, raw in [
        (code.redundant_parity_check_c1, code.raw_parity_check_c1),
        (code.redundant_parity_check_c2, code.raw_parity_check_c2),
    ]:
        r_red = gf2.rank(red)
        assert r_red == gf2.rank(raw)
        assert gf2.rank(np.concatenate([red, raw], axis=0)) == r_red


def test_hypergraph_product_end_to_end():
    """HGP of Hamming(7,4) with itself: [[58,16,3]] — every weight-1
    error decodes exactly through BP+OSD, and the phenomenological
    spacetime memory runs at sane failure rates."""
    from qcss_tpu.decode.bp import bp_phenomenological_error_rate

    h = np.array([[0, 0, 0, 1, 1, 1, 1],
                  [0, 1, 1, 0, 0, 1, 1],
                  [1, 0, 1, 0, 1, 0, 1]], np.uint8)
    code = families.hypergraph_product(h, h, distance=3)
    assert (code.n, code.k) == (58, 16)
    hz = code.redundant_parity_check_c2
    lz = code.z_operator_matrix()
    errs = np.eye(code.n, dtype=np.uint8)
    true = (errs.astype(np.int64) @ lz.T.astype(np.int64)) & 1
    # plain min-sum CONVERGES to wrong-class weight-4 estimates on 7 of
    # the 58 weight-1 errors (4-cycle-rich HGP graph, any alpha >= 0.6);
    # osd='always' weight tie-break restores exactness
    dec_plain = BPDecoder(hz, 0.01, logicals=lz, iters=48)
    flips_p, _ = dec_plain.decode_obs((errs @ hz.T) & 1)
    assert 0 < (flips_p ^ true).any(axis=1).sum() <= 10
    dec = BPDecoder(hz, 0.01, logicals=lz, iters=48, osd="always")
    flips, _ = dec.decode_obs((errs @ hz.T) & 1)
    assert not (flips ^ true).any(), "weight-1 error mis-decoded"

    out = bp_phenomenological_error_rate(code, 3, 2e-3, 2e-3, batch=256,
                                         seed=0, iters=32)
    assert out["x_fail"] < 0.1


def test_bp_exact_on_correctable_errors():
    """Every weight <= t = 2 X error of BB72 decodes to the right
    observable flip, with BP converging on its own (no OSD needed)."""
    code = families.bb72()
    h2 = code.redundant_parity_check_c2
    lz = code.z_operator_matrix()
    errs = [np.zeros(code.n, np.uint8)]
    for w in (1, 2):
        for qs in combinations(range(code.n), w):
            e = np.zeros(code.n, np.uint8)
            e[list(qs)] = 1
            errs.append(e)
    errs = np.stack(errs)
    syn = (errs @ h2.T) & 1
    true_flip = (errs @ lz.T) & 1
    dec = BPDecoder(h2, 0.01, logicals=lz, iters=64)
    flips, conv = dec.decode_obs(syn)
    assert conv.all()
    np.testing.assert_array_equal(flips, true_flip)


def test_osd_fallback_satisfies_syndrome():
    """Crippled BP (iters=2) forces the OSD path; its solutions must
    satisfy every syndrome exactly."""
    code = families.bb72()
    h2 = code.redundant_parity_check_c2
    rng = np.random.default_rng(0)
    errs = (rng.random((256, code.n)) < 0.03).astype(np.uint8)
    syn = (errs @ h2.T) & 1
    dec = BPDecoder(h2, 0.03, iters=2, osd=True)
    e_hat, conv = dec.decode_batch(syn)
    assert not conv.all()  # the point of the test
    np.testing.assert_array_equal((e_hat @ h2.T) & 1, syn)


def test_device_osd_bit_identical_to_host():
    """The batched on-device OSD-0 elimination must be BIT-identical to
    the host loop (`BPDecoder._osd0`) — guaranteed structurally because
    the pivot column set is row-choice-independent and the solution on it
    unique, but pinned here across code-capacity, spacetime-Tanner, and
    random dense graphs, with whole-batch and tail-only entry points."""
    from qcss_tpu.decode.bp import spacetime_tanner

    rng = np.random.default_rng(7)
    code = families.bb72()
    h2 = np.asarray(code.redundant_parity_check_c2, np.uint8) & 1
    dec = BPDecoder(h2, 0.03, iters=2, osd_backend="device")
    errs = (rng.random((128, code.n)) < 0.06).astype(np.uint8)
    syn = (errs @ h2.T) & 1
    soft = rng.normal(size=(128, code.n)).astype(np.float32)
    np.testing.assert_array_equal(dec._osd0_any(syn, soft),
                                  dec._osd0(syn, soft))

    tan, priors, obs, _ = spacetime_tanner(
        h2, 3, 0.01, 0.01,
        logicals=np.asarray(code.z_operator_matrix(), np.uint8))
    dec2 = BPDecoder(tan, priors, iters=2, osd_backend="device")
    ev = (rng.random((64, tan.shape[1])) < 0.02).astype(np.uint8)
    syn2 = (ev @ tan.T) & 1
    soft2 = rng.normal(size=(64, tan.shape[1])).astype(np.float32)
    np.testing.assert_array_equal(dec2._osd0_any(syn2, soft2),
                                  dec2._osd0(syn2, soft2))

    for trial in range(10):
        r, n = int(rng.integers(3, 12)), int(rng.integers(10, 50))
        h = (rng.random((r, n)) < 0.4).astype(np.uint8)
        if not h.any():
            continue
        d = BPDecoder(h, 0.05, iters=2, osd_backend="device")
        e = (rng.random((8, n)) < 0.2).astype(np.uint8)
        s = (e @ h.T) & 1
        sf = rng.normal(size=(8, n)).astype(np.float32)
        np.testing.assert_array_equal(d._osd0_any(s, sf), d._osd0(s, sf),
                                      err_msg=f"trial {trial}")

    # end-to-end: crippled BP + device-OSD tail decodes identically to
    # crippled BP + host-OSD tail
    e_dev, conv_dev = dec.decode_batch(syn)
    dec_host = BPDecoder(h2, 0.03, iters=2, osd_backend="host")
    e_host, conv_host = dec_host.decode_batch(syn)
    np.testing.assert_array_equal(e_dev, e_host)
    np.testing.assert_array_equal(conv_dev, conv_host)

    # gap decoding (augmented [h; L_j] systems) identical across backends
    lz = np.asarray(code.z_operator_matrix(), np.uint8) & 1
    dg = BPDecoder(h2, 0.03, logicals=lz, iters=8, osd_backend="device")
    hg = BPDecoder(h2, 0.03, logicals=lz, iters=8, osd_backend="host")
    syn_g = syn[:32]
    fd, cd, gapd = dg.decode_obs_gap(syn_g)
    fh, ch, gaph = hg.decode_obs_gap(syn_g)
    np.testing.assert_array_equal(fd, fh)
    np.testing.assert_allclose(gapd, gaph)


def test_bb72_code_capacity_suppression():
    res = bp_logical_error_rate(families.bb72(), 0.01, batch=2048, seed=0)
    # 12 logical qubits on 72 data qubits at p=1e-2: word failure well
    # under the ~11% chance of ANY unprotected dozen flipping
    assert res["word_fail"] < 0.02
    assert res["bp_converged"] > 0.98


def test_spacetime_tanner_decode():
    code = families.steane()
    rounds, p = 3, 0.003
    tan, priors, obs, n_data = spacetime_tanner(
        code.parity_check_c2, rounds, p, p,
        logicals=code.z_operator_matrix())
    r, n = code.parity_check_c2.shape
    assert tan.shape == ((rounds + 1) * r, (rounds + 1) * n + rounds * r)
    assert n_data == (rounds + 1) * n
    dec = BPDecoder(tan, priors, logicals=obs, iters=64)
    rng = np.random.default_rng(1)
    ev = (rng.random((1024, tan.shape[1])) < priors[None, :]).astype(np.uint8)
    syn = (ev @ tan.T) & 1
    flips, _ = dec.decode_obs(syn)
    fail = ((flips ^ ((ev @ obs.T) & 1)).any(axis=1)).mean()
    # raw per-round flip chance is ~2% over 4 layers; decoded must be well
    # below single-qubit exposure
    assert fail < 0.04


def test_phenomenological_bp_surface_matches_uf_physics():
    """Same sampler, same seed, two decoders: spacetime BP must land in
    the same regime as spacetime union-find on the d=3 surface code
    (measured 1.66% vs 2.0% at p=q=1e-2)."""
    from qcss_tpu.decode.uf import uf_phenomenological_error_rate

    code = families.rotated_surface(3)
    bp = bp_phenomenological_error_rate(code, 3, 0.01, 0.01,
                                        batch=2048, seed=0)
    uf = uf_phenomenological_error_rate(code, 0.01, rounds=3,
                                        samples=2048, batch=2048, seed=0)
    assert bp["x_fail"] < 1.8 * uf["logical_fail"] + 0.01


def test_phenomenological_bp_bb72():
    res = bp_phenomenological_error_rate(families.bb72(), 4, 0.004, 0.004,
                                         batch=1024, seed=1)
    assert res["x_fail"] < 0.01
    assert res["bp_converged"] > 0.95


def test_dense_and_gather_layouts_agree_on_convergence():
    """Both total-computation layouts must reach the same convergence set
    and produce syndrome-satisfying estimates (solutions may differ by
    degenerate choices: f32 summation order)."""
    code = families.bb72()
    h2 = code.redundant_parity_check_c2
    rng = np.random.default_rng(3)
    errs = (rng.random((256, code.n)) < 0.01).astype(np.uint8)
    syn = (errs @ h2.T) & 1
    for layout in ("dense", "gather"):
        e, conv = BPDecoder(h2, 0.01, layout=layout, osd=False).decode_batch(
            syn)
        sat = (((e.astype(np.int64) @ h2.T) & 1) == syn).all(axis=1)
        assert sat[conv].all()  # converged means syndrome-satisfying
        assert conv.mean() > 0.95


class TestCircuitLevel:
    """Circuit-level detector-fault Tanner graphs (`decode.bp_dem`)."""

    def test_tanner_structure_surface(self):
        from qcss_tpu.decode.bp_dem import build_circuit_tanner
        from qcss_tpu.sim.noise import NoiseModel

        code = families.rotated_surface(3)
        rounds = 3
        tan = build_circuit_tanner(code, rounds, NoiseModel(
            p_gate2=2e-3, p_meas=5e-3), sector="z")
        r_c = code.raw_parity_check_c2.shape[0]
        assert tan.n_detectors == (rounds + 1) * r_c
        assert tan.obs.shape == (1, tan.n_faults)
        assert (tan.checks.sum(axis=0) >= 1).all()  # no detector-free cols
        assert ((tan.priors > 0) & (tan.priors < 0.5)).all()

    def test_surface_circuit_bp_beats_matching(self):
        """Same shots, same physics: exact compound-fault Tanner BP must
        be at least as accurate as the edge-decomposed matching pipeline
        (measured 4.7x lower word-fail at d=3, p_gate2=2e-3)."""
        from qcss_tpu.experiments.memory_qldpc import qldpc_memory_experiment
        from qcss_tpu.experiments.memory_xz import xz_memory_experiment
        from qcss_tpu.sim.noise import NoiseModel

        noise = NoiseModel(p_gate2=2e-3, p_meas=5e-3)
        code = families.rotated_surface(3)
        bp = qldpc_memory_experiment(code, rounds=3, noise=noise,
                                     batch=2048, seed=0)
        uf = xz_memory_experiment(code, rounds=3, noise=noise,
                                  batch=2048, seed=0)
        assert bp["word_fail"] <= uf["word_fail"]
        assert bp["bp_converged_z"] > 0.97

    def test_bb72_circuit_memory(self):
        from qcss_tpu.experiments.memory_qldpc import qldpc_memory_experiment
        from qcss_tpu.sim.noise import NoiseModel

        res = qldpc_memory_experiment(
            families.bb72(), rounds=2, noise=NoiseModel(
                p_gate2=1e-3, p_meas=1e-3),
            batch=256, seed=0, sectors="z")
        assert res["x_fail"] < 0.05
        assert res["faults_z"] > 500
        assert res["bp_converged_z"] > 0.9


class TestJointCircuitBP:
    """Joint two-sector circuit-level BP (`bp_dem.build_joint_circuit_tanner`)
    and the per-shot-prior machinery behind correlated two-pass decoding."""

    def test_joint_reduces_to_disjoint_union_without_y_faults(self):
        """With measurement noise only there are no cross-sector faults:
        the joint graph must be exactly the per-sector graphs side by
        side (same variable count, block-diagonal incidence)."""
        from qcss_tpu.decode.bp_dem import (
            build_circuit_tanner,
            build_joint_circuit_tanner,
        )
        from qcss_tpu.sim.noise import NoiseModel

        code = families.rotated_surface(3)
        noise = NoiseModel(p_meas=5e-3)
        tz = build_circuit_tanner(code, 3, noise, sector="z")
        tx = build_circuit_tanner(code, 3, noise, sector="x")
        tj = build_joint_circuit_tanner(code, 3, noise)
        assert tj.n_faults == tz.n_faults + tx.n_faults
        rz = code.raw_parity_check_c2.shape[0]
        ndz = 4 * rz
        # every variable touches exactly one sector's detector block
        touches_z = tj.checks[:ndz].any(axis=0)
        touches_x = tj.checks[ndz:].any(axis=0)
        assert not (touches_z & touches_x).any()

    def test_joint_atoms_channel_mass(self):
        """The 15 patterns of each CNOT's depolarizing channel must carry
        total probability p2 (4 patterns land in each of
        `_fault_species`' exclusive X-support classes: 4*p2/15 each)."""
        from qcss_tpu.decode.bp_dem import _joint_fault_atoms
        from qcss_tpu.decode.dem2 import _RoundCircuit
        from qcss_tpu.sim.noise import NoiseModel

        code = families.steane()
        p2 = 1e-3
        circ = _RoundCircuit(code)
        atoms = _joint_fault_atoms(circ, NoiseModel(p_gate2=p2))
        n_cnots = sum(1 for op in circ.ops if op[0] == "cnot")
        assert len(atoms) == 15 * n_cnots
        assert abs(sum(p for *_, p in atoms) - n_cnots * p2) < 1e-12

    def test_joint_beats_independent_surface3(self):
        """Same shots: joint decoding (Y faults one variable) must not be
        worse than independent per-sector decoding (measured 0.49% vs
        0.68% word-fail at 8k shots, p_gate2=2e-3/p_meas=5e-3)."""
        from qcss_tpu.experiments.memory_qldpc import qldpc_memory_experiment
        from qcss_tpu.sim.noise import NoiseModel

        noise = NoiseModel(p_gate2=2e-3, p_meas=5e-3)
        out = qldpc_memory_experiment(
            families.rotated_surface(3), rounds=3, noise=noise,
            batch=4096, seed=0, joint=True, iters=96)
        assert out["word_fail_joint"] <= out["word_fail"] + 0.002
        assert out["z_fail_joint"] <= out["z_fail"]
        assert out["bp_converged_joint"] > 0.9

    def test_per_shot_priors_default_equivalence(self):
        """decode_batch(priors=tile(base)) must equal decode_batch()
        bit-for-bit — the per-shot-prior path computes identical LLRs."""
        code = families.bb72()
        h = code.redundant_parity_check_c2
        rng = np.random.default_rng(0)
        errs = (rng.random((64, code.n)) < 0.01).astype(np.uint8)
        syn = (errs @ h.T) & 1
        dec = BPDecoder(h, 0.01, iters=24)
        e0, c0 = dec.decode_batch(syn)
        pb = np.tile(dec.priors, (64, 1))
        e1, c1 = dec.decode_batch(syn, priors=pb)
        assert (e0 == e1).all() and (c0 == c1).all()

    def test_circuit_level_gap_postselection(self):
        """Gap post-selection on the realistic noise tier: circuit-level
        d=3 memory measures 0.66% -> 0.027% x-fail at 8.7% abort (24x)."""
        from qcss_tpu.experiments.memory_qldpc import qldpc_memory_experiment
        from qcss_tpu.sim.noise import NoiseModel

        out = qldpc_memory_experiment(
            families.rotated_surface(3), rounds=3,
            noise=NoiseModel(p_gate2=3e-3, p_meas=8e-3), batch=4096,
            seed=0, sectors="z", gap_tau=8.0, iters=64)
        assert out["gap_keep"] > 0.8
        assert out["x_fail_postselected"] < 0.3 * out["x_fail"]

    def test_two_pass_correlated_runs(self):
        """The BP two-pass analogue of the matching reweighting: runs,
        couples a nonzero pair set, and stays within MC noise of the
        independent z-sector result (measured statistically neutral —
        the per-sector BP graph already carries exact compound priors,
        unlike the decomposed matching graphs where the same reweighting
        wins; see decode.dem2 / experiments.memory_xz)."""
        from qcss_tpu.experiments.memory_qldpc import qldpc_memory_experiment
        from qcss_tpu.sim.noise import NoiseModel

        noise = NoiseModel(p_gate2=2e-3, p_meas=5e-3)
        out = qldpc_memory_experiment(
            families.rotated_surface(3), rounds=3, noise=noise,
            batch=2048, seed=1, correlated=True, iters=64)
        assert out["pairs"] > 0
        assert abs(out["z_fail_corr"] - out["z_fail"]) < 0.01
        assert out["bp_converged_corr"] > 0.9


class TestStreamingBP:
    """Sliding-window BP (`decode.bp_streaming`) vs whole-history BP."""

    def test_matches_whole_history(self):
        import jax

        from qcss_tpu.decode.bp_streaming import BPStreamingDecoder
        from qcss_tpu.decode.streaming import sample_phenomenological_stream

        code = families.bb72()
        h2 = code.redundant_parity_check_c2
        lz = code.z_operator_matrix()
        rounds, p, batch = 10, 0.006, 128
        dets, par = sample_phenomenological_stream(
            jax.random.key(1), p, p, batch, rounds, h2, lz)
        dets, par = np.asarray(dets, np.uint8), np.asarray(par, np.uint8)
        tan, priors, obs, _ = spacetime_tanner(h2, rounds, p, p, logicals=lz)
        whole, _ = BPDecoder(tan, priors, logicals=obs,
                             iters=48).decode_obs(dets.reshape(batch, -1))
        stream, _ = BPStreamingDecoder(
            h2, lz, p, p, window=6, commit=3,
            iters=48).decode_stream(dets)
        agree = (stream == whole).all(axis=1).mean()
        assert agree > 0.97
        # and both must actually decode: failure well below raw exposure
        assert (stream ^ par).any(axis=1).mean() < 0.1

    def test_window_contract(self):
        from qcss_tpu.decode.bp_streaming import BPStreamingDecoder

        code = families.bb72()
        with pytest.raises(ValueError):
            BPStreamingDecoder(code.redundant_parity_check_c2,
                               code.z_operator_matrix(), 0.01, 0.01,
                               window=3, commit=3)


def _sample_circuit_dets(code, noise, rounds, batch, seed, hz, hx):
    """Two-sector circuit-level Z-detector stream ([B, R+1, rz]) plus the
    true logical-X parities, via the frame sampler (the exact machinery of
    `experiments.memory_qldpc`)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from qcss_tpu.decode.spacetime import detector_history
    from qcss_tpu.experiments.memory import (
        x_extraction_circuit,
        z_extraction_circuit,
    )
    from qcss_tpu.experiments.memory_xz import _sample_two_sector
    from qcss_tpu.sim import frame as fr

    rz, rx = hz.shape[0], hx.shape[0]
    n = code.n
    z_arrays = tuple(map(jnp.asarray, z_extraction_circuit(
        code, checks=hz).to_arrays()))
    x_arrays = tuple(map(jnp.asarray, x_extraction_circuit(
        code, anc_offset=n + rz, checks=hx).to_arrays()))
    nq = n + rz + rx
    fn = jax.jit(
        partial(_sample_two_sector, code=code, noise=noise,
                z_arrays=z_arrays, x_arrays=x_arrays,
                z_comp=fr.maybe_compile(z_arrays, nq),
                x_comp=fr.maybe_compile(x_arrays, nq), rz=rz, rx=rx),
        static_argnames=("batch", "rounds"))
    syns_z, _, x_err, _ = fn(jax.random.key(seed), batch, rounds)
    syns_z, x_err = np.asarray(syns_z), np.asarray(x_err)
    final_z = ((x_err.astype(np.int64) @ hz.T) & 1).astype(np.uint8)
    dets = detector_history(syns_z, final_z).reshape(batch, rounds + 1, rz)
    lz = np.asarray(code.z_operator_matrix(), np.uint8) & 1
    par = ((x_err.astype(np.int64) @ lz.T) & 1).astype(np.uint8)
    return dets, par


class TestCircuitStreamingBP:
    """Circuit-level sliding-window BP (`CircuitBPStreamingDecoder`) vs
    whole-history `circuit_bp_decoder` on identical frame-sampled shots."""

    def test_matches_whole_history_steane(self):
        from qcss_tpu.decode.bp_dem import circuit_bp_decoder
        from qcss_tpu.decode.bp_streaming import CircuitBPStreamingDecoder
        from qcss_tpu.sim.noise import NoiseModel

        code = families.steane()
        noise = NoiseModel(p_gate2=2e-3, p_meas=5e-3)
        hz = np.asarray(code.raw_parity_check_c2, np.uint8) & 1
        hx = np.asarray(code.raw_parity_check_c1, np.uint8) & 1
        rounds, batch = 12, 192
        dets, par = _sample_circuit_dets(code, noise, rounds, batch, 0,
                                         hz, hx)
        whole, _ = circuit_bp_decoder(
            code, rounds, noise, sector="z",
            iters=48).decode_obs(dets.reshape(batch, -1))
        dec = CircuitBPStreamingDecoder(code, noise, sector="z", window=8,
                                        commit=4, iters=48)
        stream, _ = dec.decode_stream(dets)
        agree = (stream == whole).all(axis=1).mean()
        assert agree > 0.97
        fail_s = (stream ^ par).any(axis=1).mean()
        fail_w = (whole ^ par).any(axis=1).mean()
        assert abs(fail_s - fail_w) < 0.03

    def test_committed_faults_fully_observed(self):
        """Window-graph invariants: every committed fault's signature fits
        inside the window (so the committing decode sees all of it), carry
        columns are committed-only, and the horizon contract is enforced."""
        from qcss_tpu.decode.bp_dem import open_window_circuit_tanner
        from qcss_tpu.decode.dem2 import _HORIZON
        from qcss_tpu.sim.noise import NoiseModel

        code = families.steane()
        noise = NoiseModel(p_gate2=1e-3, p_meas=2e-3, p_reset=1e-3)
        wt = open_window_circuit_tanner(code, 6, 2, noise, sector="z")
        assert (wt.carry[:, ~wt.committed] == 0).all()
        assert (wt.obs[:, ~wt.committed] == 0).all()
        assert (wt.checks.sum(axis=0) >= 1).all()
        # carry toggles live strictly below commit + horizon
        r_c = wt.checks.shape[0] // 6
        layers = np.nonzero(wt.carry.any(axis=1))[0] // r_c
        assert layers.size and layers.max() < _HORIZON
        with pytest.raises(ValueError):
            open_window_circuit_tanner(code, 2 + _HORIZON - 1, 2, noise)

    def test_stream_rate_end_to_end(self):
        """Unbounded-R pipeline: chunked two-sector sampling interleaved
        with window decodes. Streaming must be NO WORSE than the
        whole-history experiment at the same operating point — measured
        it is substantially BETTER at this depth (x_fail ~7% vs ~15% at
        Steane R=20: min-sum degrades on the deep whole-history graph
        while each window decodes near its small-graph optimum), so the
        bound is one-sided."""
        from qcss_tpu.experiments.memory_qldpc import (
            qldpc_memory_experiment,
            qldpc_stream_memory_rate,
        )
        from qcss_tpu.sim.noise import NoiseModel

        code = families.steane()
        noise = NoiseModel(p_gate2=2e-3, p_meas=5e-3)
        out = qldpc_stream_memory_rate(code, noise, rounds=20, batch=256,
                                       window=8, commit=4, iters=48, seed=3)
        assert out["round_shots_per_sec"] > 0
        ref = qldpc_memory_experiment(code, rounds=20, noise=noise,
                                      batch=256, seed=5, iters=48,
                                      sectors="z")
        assert out["x_fail"] <= ref["x_fail"] + 0.05

    def test_stream_rate_both_sectors(self):
        from qcss_tpu.experiments.memory_qldpc import qldpc_stream_memory_rate
        from qcss_tpu.sim.noise import NoiseModel

        out = qldpc_stream_memory_rate(
            families.steane(), NoiseModel(p_gate2=1e-3, p_meas=2e-3),
            rounds=10, batch=128, window=8, commit=4, iters=32, seed=0,
            sectors="both")
        assert 0.0 <= out["word_fail"] <= 0.5
        assert out["word_fail"] >= max(out["x_fail"], out["z_fail"])

    @pytest.mark.skipif(
        not os.environ.get("QCSS_SLOW_TESTS"),
        reason="bb72 circuit-level stream (~6 min CPU); set QCSS_SLOW_TESTS=1",
    )
    def test_matches_whole_history_bb72(self):
        from qcss_tpu.decode.bp_dem import circuit_bp_decoder
        from qcss_tpu.decode.bp_streaming import CircuitBPStreamingDecoder
        from qcss_tpu.sim.noise import NoiseModel

        code = families.bb72()
        noise = NoiseModel(p_gate2=1e-3, p_gate1=1e-3, p_meas=1e-3,
                           p_reset=1e-3)
        hz = np.asarray(code.redundant_parity_check_c2, np.uint8) & 1
        hx = np.asarray(code.redundant_parity_check_c1, np.uint8) & 1
        rounds, batch = 18, 128
        dets, par = _sample_circuit_dets(code, noise, rounds, batch, 0,
                                         hz, hx)
        whole, _ = circuit_bp_decoder(
            code, rounds, noise, sector="z", iters=64, hz=hz,
            hx=hx).decode_obs(dets.reshape(batch, -1))
        dec = CircuitBPStreamingDecoder(code, noise, sector="z", window=8,
                                        commit=4, iters=64, hz=hz, hx=hx)
        stream, _ = dec.decode_stream(dets)
        assert (stream == whole).all(axis=1).mean() > 0.97
        assert (stream ^ par).any(axis=1).mean() <= (
            (whole ^ par).any(axis=1).mean() + 0.03)


def test_gap_postselection():
    """Soft-output gap decoding: flips identical to the standard decode,
    and post-selecting on the complementary gap buys conditional accuracy
    (bb72 code capacity p=0.03: ~6x at ~13% abort)."""
    code = families.bb72()
    h = code.redundant_parity_check_c2
    lz = code.z_operator_matrix()
    p = 0.03
    rng = np.random.default_rng(0)
    B = 1024
    errs = (rng.random((B, code.n)) < 2 * p / 3).astype(np.uint8)
    syn = (errs @ h.T) & 1
    true_flip = (errs.astype(np.int64) @ lz.T) & 1
    dec = BPDecoder(h, 2 * p / 3, logicals=lz, iters=48)
    f_std, _ = dec.decode_obs(syn)
    f_gap, _, gap = dec.decode_obs_gap(syn)
    assert (f_std == f_gap).all()
    assert gap.shape == (B,) and (gap >= 0).all()
    fail = (f_gap ^ true_flip).any(axis=1)
    keep = gap >= 10.0
    assert keep.mean() > 0.7
    assert fail[keep].mean() < 0.6 * fail.mean()


def test_priors_validation():
    with pytest.raises(ValueError):
        BPDecoder(np.eye(3, dtype=np.uint8), 0.6)


class TestRound4Depth:
    """Round-4 BP-at-depth machinery: OSD-E combination sweep, message
    damping (memory-BP) and perturbed restarts."""

    def _instance(self, seed=0, B=64, p=0.05):
        code = families.bb72()
        h = np.asarray(code.raw_parity_check_c2, np.uint8)
        rng = np.random.default_rng(seed)
        err = (rng.random((B, h.shape[1])) < p).astype(np.uint8)
        return h, err, (err @ h.T) & 1

    def test_osde_native_matches_python(self):
        from qcss_tpu import native
        from qcss_tpu.decode.bp import _osde_py

        h, err, synd = self._instance(B=48)
        rng = np.random.default_rng(7)
        soft = rng.standard_normal(
            (synd.shape[0], h.shape[1])).astype(np.float32)
        for order, l1, l2 in ((0, 0, 0), (1, 12, 0), (2, 16, 10)):
            py = _osde_py(h, synd, soft, order, l1, l2)
            assert (((py @ h.T) & 1) == synd).all()
            nat = native.osde_batch_native(h, synd, soft, order, l1, l2)
            if nat is None:
                continue  # no toolchain: python path already verified
            assert (((nat @ h.T) & 1) == synd).all()
            w = np.abs(soft)
            np.testing.assert_allclose((nat * w).sum(1), (py * w).sum(1),
                                       atol=1e-4)
            if order == 0:
                o0 = native.osd0_batch_native(h, synd, soft)
                np.testing.assert_array_equal(nat, o0)

    def test_osde_never_heavier_than_osd0(self):
        from qcss_tpu.decode.bp import _osde_py

        h, err, synd = self._instance(seed=3, B=48)
        rng = np.random.default_rng(11)
        soft = rng.standard_normal(
            (synd.shape[0], h.shape[1])).astype(np.float32)
        w = np.abs(soft)
        e0 = _osde_py(h, synd, soft, 0, 0, 0)
        e2 = _osde_py(h, synd, soft, 2, 16, 10)
        assert ((e2 * w).sum(1) <= (e0 * w).sum(1) + 1e-5).all()

    def test_osd_order_improves_word_fail(self):
        code = families.bb72()
        h = np.asarray(code.raw_parity_check_c2, np.uint8)
        lz = np.asarray(code.z_operator_matrix(), np.uint8)
        rng = np.random.default_rng(1)
        B, p = 2048, 0.06
        err = (rng.random((B, h.shape[1])) < p).astype(np.uint8)
        synd = (err @ h.T) & 1
        truth = (err @ lz.T) & 1
        fails = {}
        for order in (0, 2):
            dec = BPDecoder(h, p, logicals=lz, iters=32, osd_order=order,
                            osd_lambda=(20, 12))
            flips, _ = dec.decode_obs(synd)
            fails[order] = (flips != truth).any(axis=1).mean()
        # measured 0.261 -> 0.248 at this operating point; assert
        # no-worse with margin for statistical wiggle on reruns
        assert fails[2] <= fails[0] + 1e-9

    def test_damping_restarts_raise_convergence(self):
        code = families.bb72()
        h = np.asarray(code.raw_parity_check_c2, np.uint8)
        H, priors, _, _ = spacetime_tanner(h, 12, 0.004, 0.004)
        rng = np.random.default_rng(3)
        B = 256
        err = (rng.random((B, H.shape[1]))
               < np.broadcast_to(priors, (B, H.shape[1]))).astype(np.uint8)
        synd = (err @ H.T) & 1
        base = BPDecoder(H, priors, iters=48, osd=False)
        e_b, conv_b = base.decode_batch(synd)
        deep = BPDecoder(H, priors, iters=48, osd=False, gamma=0.4,
                         restarts=2)
        e_d, conv_d = deep.decode_batch(synd)
        # every claimed convergence is real
        ok = (((e_d @ H.T) & 1) == synd).all(axis=1)
        assert ok[conv_d].all()
        assert conv_d.mean() >= conv_b.mean()

    def test_restart_zero_is_identity(self):
        h, err, synd = self._instance(B=32)
        a = BPDecoder(h, 0.05, iters=16, osd=False)
        b = BPDecoder(h, 0.05, iters=16, osd=False, restarts=0, gamma=0.0)
        ea, ca = a.decode_batch(synd)
        eb, cb = b.decode_batch(synd)
        np.testing.assert_array_equal(ea, eb)
        np.testing.assert_array_equal(ca, cb)


class TestDeviceOsdE:
    """Round 5: the order-E combination sweep on device
    (`bp._osde_device_kernel` — the blocked OSD-0 elimination plus the
    lam1-singles / lam2-pairs re-solve on the reduced block). Contract
    (same as the C++ sweep, per CLAUDE.md): same enumeration order and
    strict-< / first-candidate tie-break rule; soft weights agree;
    solutions can differ only on float-tie candidates."""

    def test_matches_host_sweep(self):
        from qcss_tpu.decode.bp import _osde_device_kernel, _osde_py

        rng = np.random.default_rng(3)
        for trial in range(3):
            r, n = 28 + 12 * trial, 72 + 24 * trial
            h = (rng.random((r, n)) < 0.12).astype(np.uint8)
            B = 48
            e_true = (rng.random((B, n)) < 0.05).astype(np.uint8)
            synd = (e_true @ h.T) & 1
            soft = rng.normal(0, 1, (B, n)).astype(np.float64)
            import jax.numpy as jnp

            for order in (1, 2):
                ref = _osde_py(h, synd, soft, order, 12, 8)
                dev, ok = _osde_device_kernel(
                    jnp.asarray(h.T), jnp.asarray(synd),
                    jnp.asarray(soft), min(n, r + 256), order, 12, 8)
                dev, ok = np.asarray(dev), np.asarray(ok)
                assert ok.all()
                assert (((dev @ h.T) & 1) == synd).all()
                w = np.abs(soft)
                np.testing.assert_allclose((w * dev).sum(1),
                                           (w * ref).sum(1), atol=1e-6)

    def test_backend_policy_routes_device(self):
        """osd_backend='device' + osd_order runs the device sweep end
        to end through the public decode path; never worse than OSD-0
        in solution weight by construction."""
        rng = np.random.default_rng(7)
        r, n = 40, 110
        h = (rng.random((r, n)) < 0.1).astype(np.uint8)
        B = 64
        e_true = (rng.random((B, n)) < 0.06).astype(np.uint8)
        synd = (e_true @ h.T) & 1
        d0 = BPDecoder(h, 0.06, iters=4, osd="always",
                       osd_backend="device")
        de = BPDecoder(h, 0.06, iters=4, osd="always", osd_order=2,
                       osd_lambda=(12, 8), osd_backend="device")
        e0, _ = d0.decode_batch(synd)
        ee, _ = de.decode_batch(synd)
        assert (((np.asarray(ee) @ h.T) & 1) == synd).all()
        w = -np.log(0.06 / 0.94)
        assert (np.asarray(ee).sum(1) * w).sum() <= \
            (np.asarray(e0).sum(1) * w).sum() + 1e-6
