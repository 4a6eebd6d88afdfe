"""Batched decode pipeline tests (BASELINE configs 1 and 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcss_tpu.codes import families
from qcss_tpu.decode import lut as lut_mod
from qcss_tpu.decode import montecarlo as mc
from qcss_tpu.ops import gf2, gf2_jax


@pytest.fixture(scope="module")
def steane():
    return families.steane()


class TestSyndromeExtraction:
    def test_dense_matches_host(self, steane):
        rng = np.random.default_rng(0)
        errs = rng.integers(0, 2, size=(64, 7), dtype=np.uint8)
        h = steane.parity_check_c2
        got = np.asarray(gf2_jax.syndromes_dense(jnp.asarray(errs), jnp.asarray(h)))
        want = (errs.astype(int) @ h.T.astype(int)) & 1
        assert np.array_equal(got, want)

    def test_packed_matches_dense(self, steane):
        rng = np.random.default_rng(1)
        for n in (7, 31, 32, 33, 100):
            h = rng.integers(0, 2, size=(5, n), dtype=np.uint8)
            errs = rng.integers(0, 2, size=(16, n), dtype=np.uint8)
            dense = np.asarray(
                gf2_jax.syndromes_dense(jnp.asarray(errs), jnp.asarray(h))
            )
            packed = np.asarray(
                gf2_jax.syndromes_packed(
                    gf2_jax.pack_bits(errs), gf2_jax.pack_bits(h)
                )
            )
            assert np.array_equal(dense, packed), n

    def test_pack_unpack_roundtrip(self):
        rng = np.random.default_rng(2)
        for n in (1, 31, 32, 33, 64, 241):
            bits = rng.integers(0, 2, size=(3, n), dtype=np.uint8)
            packed = gf2_jax.pack_bits(bits)
            assert packed.shape == (3, gf2_jax.packed_width(n))
            assert np.array_equal(np.asarray(gf2_jax.unpack_bits(packed, n)), bits)


class TestDecodeAllWeight1:
    """BASELINE config 1: decode all weight-1 Pauli errors bit-exactly."""

    def test_all_single_qubit_paulis_corrected(self, steane):
        dev = steane.device
        # All 21 single-qubit Paulis (X, Y, Z on each of 7 qubits) plus I.
        x_errs, z_errs = [np.zeros(7, np.uint8)], [np.zeros(7, np.uint8)]
        for q in range(7):
            for pauli in ("X", "Y", "Z"):
                x = np.zeros(7, np.uint8)
                z = np.zeros(7, np.uint8)
                if pauli in ("X", "Y"):
                    x[q] = 1
                if pauli in ("Y", "Z"):
                    z[q] = 1
                x_errs.append(x)
                z_errs.append(z)
        fails = mc.decode_failures(
            jnp.asarray(np.array(x_errs)),
            jnp.asarray(np.array(z_errs)),
            dev.h1, dev.h2, dev.lut_c1, dev.lut_c2,
            dev.logical_x, dev.logical_z,
        )
        assert int(fails["word_fail"].sum()) == 0

    def test_correction_is_exact_error(self, steane):
        # For a distance-3 non-degenerate code, the decoded correction must
        # equal the injected weight-1 error exactly.
        dev = steane.device
        for q in range(7):
            err = np.zeros((1, 7), np.uint8)
            err[0, q] = 1
            syn = gf2_jax.syndromes_dense(jnp.asarray(err), dev.h2)
            corr = lut_mod.decode_corrections(syn, dev.lut_c2)
            assert np.array_equal(np.asarray(corr), err)

    def test_weight2_fails_as_expected(self, steane):
        # t=1: some weight-2 X errors must produce a logical failure.
        dev = steane.device
        fails = 0
        for q1 in range(7):
            for q2 in range(q1 + 1, 7):
                err = np.zeros((1, 7), np.uint8)
                err[0, [q1, q2]] = 1
                out = mc.decode_failures(
                    jnp.asarray(err), jnp.zeros((1, 7), jnp.uint8),
                    dev.h1, dev.h2, dev.lut_c1, dev.lut_c2,
                    dev.logical_x, dev.logical_z,
                )
                fails += int(out["x_fail"][0])
        assert fails > 0


class TestCorrectDetect:
    def test_correct_errors_roundtrip(self, steane):
        """correct_errors must reproduce quil_classical_correct semantics:
        given measured = codeword ^ e with known frame f, the new frame is
        f ^ decode(H(measured^f)) (reference: css_code.py:649-685)."""
        dev = steane.device
        rng = np.random.default_rng(3)
        # random C2 codewords: nullspace basis of h2
        basis = gf2.nullspace(steane.parity_check_c2)
        coeffs = rng.integers(0, 2, size=(32, basis.shape[0]), dtype=np.uint8)
        words = (coeffs.astype(int) @ basis.astype(int)) & 1
        # inject weight-1 errors
        errs = np.zeros_like(words)
        for i in range(32):
            errs[i, rng.integers(0, 7)] = 1
        measured = (words ^ errs).astype(np.uint8)
        frame = np.zeros_like(measured)
        corrected, new_frame = lut_mod.correct_errors(
            jnp.asarray(measured), jnp.asarray(frame), dev.h2, dev.lut_c2
        )
        assert np.array_equal(np.asarray(new_frame), errs)
        assert np.array_equal(np.asarray(corrected), words)

    def test_detect_errors(self, steane):
        dev = steane.device
        clean = np.zeros((1, 7), np.uint8)
        assert int(lut_mod.detect_errors(jnp.asarray(clean), jnp.asarray(clean), dev.h2)[0]) == 0
        dirty = clean.copy()
        dirty[0, 0] = 1
        assert int(lut_mod.detect_errors(jnp.asarray(dirty), jnp.asarray(clean), dev.h2)[0]) == 1
        # known frame explains the error -> no detection
        assert int(lut_mod.detect_errors(jnp.asarray(dirty), jnp.asarray(dirty), dev.h2)[0]) == 0


class TestMonteCarlo:
    def test_zero_noise_zero_failures(self, steane):
        out = mc.logical_error_rate(steane, 0.0, samples=1 << 12, batch=1 << 12)
        assert out["word_fail"] == 0.0

    def test_rate_scaling(self, steane):
        # Logical error rate ~ c p^2 for small p: check monotonicity and
        # rough magnitude at two points.
        r1 = mc.logical_error_rate(steane, 0.01, samples=1 << 16, batch=1 << 16, seed=1)
        r2 = mc.logical_error_rate(steane, 0.05, samples=1 << 16, batch=1 << 16, seed=2)
        assert r1["word_fail"] < r2["word_fail"]
        # At p=0.01 the Steane X-sector rate is ~21*(2p/3)^2 ≈ 1e-3.
        assert 1e-4 < r2["word_fail"] < 0.2

    def test_analytic_weight2_rate(self, steane):
        """With exactly-weight-2 X errors, failure must be deterministic per
        pattern; MC at p small must agree with exhaustive enumeration."""
        dev = steane.device
        # Exhaustive: fraction of weight-2 X patterns that fail.
        n_fail = 0
        from itertools import combinations

        for q1, q2 in combinations(range(7), 2):
            err = np.zeros((1, 7), np.uint8)
            err[0, [q1, q2]] = 1
            out = mc.decode_failures(
                jnp.asarray(err), np.zeros((1, 7), np.uint8),
                dev.h1, dev.h2, dev.lut_c1, dev.lut_c2,
                dev.logical_x, dev.logical_z,
            )
            n_fail += int(out["x_fail"][0])
        # Every weight-2 error on a perfect (Hamming) code decodes to a
        # wrong codeword: residual weight-3 logical operator.
        assert n_fail == 21


class TestParallel:
    def test_sharded_counts_match_expectation(self, steane):
        from qcss_tpu.parallel import make_mesh, sharded_mc_step

        mesh = make_mesh()
        assert mesh.devices.size == 8  # conftest forces 8 virtual devices
        key = jax.random.key(0)
        counts = sharded_mc_step(steane, mesh, key, batch=8 * 1024, p=0.05)
        assert counts["word_fail"].shape == ()
        # Rough magnitude sanity: E[fail] ≈ 21*(2p/3)^2 * batch ≈ 190 for
        # the X sector alone; allow wide MC tolerance.
        assert 10 < int(counts["word_fail"]) < 2000

    def test_sharded_frame_memory(self):
        """The frame-sampler memory pipeline sharded over the mesh: runs,
        decodes, and lands within MC tolerance of the single-device frames
        engine at the same operating point."""
        from qcss_tpu.codes import families
        from qcss_tpu.experiments.memory import z_memory_experiment
        from qcss_tpu.parallel import ShardedFrameMemory, make_mesh
        from qcss_tpu.sim.noise import NoiseModel

        code = families.rotated_surface(3)
        noise = NoiseModel(p_gate2=3e-3, p_meas=1e-2)
        sfm = ShardedFrameMemory(code, noise, make_mesh())
        out = sfm.error_rate(rounds=3, batch=8 * 512, seed=3, decoder="uf")
        ref = z_memory_experiment(code, rounds=3, noise=noise,
                                  batch=8 * 512, seed=4, decoder="uf",
                                  engine="frames")
        assert out["residual_syndrome"] == 0.0
        assert abs(out["logical_fail"] - ref["logical_fail"]) < 0.02

    def test_sharded_bp_memory(self):
        """The fused qLDPC BP memory pipeline sharded over the mesh: the
        per-device sample+spacetime-BP program runs, psums counts, and
        lands within MC tolerance of the single-device decode at the same
        operating point."""
        from qcss_tpu.codes import families
        from qcss_tpu.decode.bp import bp_phenomenological_error_rate
        from qcss_tpu.parallel import make_mesh, sharded_bp_memory

        code = families.bb72()
        out = sharded_bp_memory(code, make_mesh(), rounds=3, p=3e-3, q=3e-3,
                                batch=8 * 64, seed=1, iters=24)
        assert out["decoder"] == "device-bp"
        assert 0.0 <= out["x_fail"] <= 0.1
        assert out["bp_unconverged"] <= 0.05
        ref = bp_phenomenological_error_rate(code, 3, 3e-3, 3e-3,
                                             batch=512, seed=2, iters=24)
        assert abs(out["x_fail"] - ref["x_fail"]) < 0.03

    def test_sharded_soft_memory(self):
        """The fused analog-readout pipeline sharded over the mesh (the
        device union-find kernel's per-shot weights inside shard_map):
        lands within MC tolerance of the host soft decode at the same
        operating point."""
        from qcss_tpu.codes import families
        from qcss_tpu.experiments.soft import (
            soft_phenomenological_error_rate)
        from qcss_tpu.parallel import make_mesh, sharded_soft_memory

        code = families.rotated_surface(3)
        out = sharded_soft_memory(code, make_mesh(), rounds=3, p=5e-3,
                                  sigma=0.7, batch=8 * 512, seed=1)
        assert out["decoder"] == "device-uf-soft"
        ref = soft_phenomenological_error_rate(
            code, 5e-3, 0.7, rounds=3, samples=4096, seed=2, soft=True)
        assert abs(out["logical_fail"] - ref["logical_fail"]) < 0.02

    def test_sharded_qldpc_circuit_memory(self):
        """Circuit-level qLDPC pipeline fused on the mesh: frame-sampled
        two-sector circuits + detector-fault-Tanner BP inside shard_map,
        within MC tolerance of the host experiment at the same point."""
        from qcss_tpu.codes import families
        from qcss_tpu.experiments.memory_qldpc import qldpc_memory_experiment
        from qcss_tpu.parallel import make_mesh, sharded_qldpc_circuit_memory
        from qcss_tpu.sim.noise import NoiseModel

        code = families.bb72()
        noise = NoiseModel(p_gate2=1e-3, p_meas=1e-3)
        out = sharded_qldpc_circuit_memory(code, make_mesh(), rounds=2,
                                           noise=noise, batch=8 * 32,
                                           seed=1, iters=24)
        assert out["decoder"] == "device-circuit-bp"
        assert 0.0 <= out["x_fail"] <= 0.1
        ref = qldpc_memory_experiment(code, rounds=2, noise=noise,
                                      batch=256, seed=2, iters=24,
                                      sectors="z")
        assert abs(out["x_fail"] - ref["x_fail"]) < 0.05

    def test_sharded_magic_factory(self):
        """Mesh-parallel circuit-level distillation: psummed counts land
        within MC tolerance of the single-device kernel, and with trivial
        Clifford noise within tolerance of the exact protocol map."""
        from qcss_tpu.ftqc import magic
        from qcss_tpu.parallel import make_mesh, sharded_magic_factory
        from qcss_tpu.sim.noise import NoiseModel

        mesh = make_mesh()
        quiet = NoiseModel()
        out = sharded_magic_factory(mesh, quiet, 0.03, 8 * 2048, seed=1)
        exact = magic.distill_exact(0.03)
        assert abs(out["p_accept"] - exact["p_accept"]) < 0.02
        assert out["p_out"] < 0.01
        # one compile serves a p sweep (traced p_in)
        out2 = sharded_magic_factory(mesh, quiet, 0.1, 8 * 2048, seed=1)
        assert out2["p_accept"] < out["p_accept"]
        noisy = NoiseModel(p_gate1=1e-3, p_gate2=1e-3, p_meas=1e-3,
                           p_reset=1e-3)
        ref = magic.distill_circuit(noisy, 0.03, 4096, seed=2)
        out3 = sharded_magic_factory(mesh, noisy, 0.03, 8 * 512, seed=3)
        assert abs(out3["p_accept"] - ref["p_accept"]) < 0.05
        assert abs(out3["p_out"] - ref["p_out"]) < 0.02

    def test_sharded_logical_program(self):
        """Mesh-parallel compiled logical program (pipeline #8): quiet
        run exactly zero; noisy psummed rates within MC tolerance of the
        single-device fused pipeline on the same model."""
        from qcss_tpu.experiments.logical import LogicalProgram
        from qcss_tpu.parallel import make_mesh, sharded_logical_program

        mesh = make_mesh()
        prog = LogicalProgram(3, 2).cnot(0, 1)
        model = prog.build()
        quiet = sharded_logical_program(model, mesh, p=1e-9,
                                        batch=8 * 64, seed=1)
        assert quiet["word_fail"] == 0.0
        out = sharded_logical_program(model, mesh, p=3e-3,
                                      batch=8 * 1024, seed=2)
        ref = prog.run(3e-3, batch=1 << 13, seed=3, decoder="device-uf")
        assert abs(out["word_fail"] - ref["word_fail"]) < 0.02
        assert set(k for k in out if k.endswith("_fail")) >= {
            "z0_fail", "z1_fail", "word_fail"}

    def test_sharded_two_level_memory(self):
        """Mesh-parallel hierarchical memory (pipeline #9): quiet run
        exactly zero at both levels; noisy psummed rates within MC
        tolerance of the single-device fused two-level pipeline, with
        level 2 correcting below level 1."""
        from qcss_tpu.experiments import logical_repetition_memory
        from qcss_tpu.parallel import make_mesh, sharded_two_level_memory

        mesh = make_mesh()
        quiet = sharded_two_level_memory(3, 3, 2, mesh, p=1e-9,
                                         batch=8 * 64, seed=1)
        assert quiet["word_fail_l1"] == 0.0
        assert quiet["word_fail_l2"] == 0.0
        out = sharded_two_level_memory(3, 3, 2, mesh, p=4e-3,
                                       batch=8 * 512, seed=2)
        assert out["word_fail_l2"] < out["word_fail_l1"]
        ref = logical_repetition_memory(3, 3, 2, 4e-3, batch=1 << 12,
                                        seed=3, decoder="device-uf")
        assert abs(out["word_fail_l1"] - ref["word_fail_l1"]) < 0.05
        assert abs(out["word_fail_l2"] - ref["word_fail_l2"]) < 0.03

    def test_sharded_rate_close_to_single_device(self, steane):
        from qcss_tpu.parallel import make_mesh, sharded_logical_error_rate

        p = 0.05
        single = mc.logical_error_rate(steane, p, samples=1 << 15, batch=1 << 15, seed=5)
        multi = sharded_logical_error_rate(
            steane, p, mesh=make_mesh(), samples=1 << 15, batch=1 << 15, seed=6
        )
        assert abs(single["word_fail"] - multi["word_fail"]) < 0.01
