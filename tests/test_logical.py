"""The logical-program compiler (experiments/logical.py).

The tableau golds run the compiled protocol EXACTLY as declared — the
phases' Z-check rounds, the conjugate-basis initializations (H's), the
scored Z readouts and silent X measurements at each transition, the
final transversal Z word — and evaluate the model's own outcome-space
recipe (`build(with_recipe=True)`): every detector combination must be
zero noiselessly on every random measurement branch, and the observable
combinations must equal the program's truth table. This validates every
compiler rule at once: the seam-even m1 combinations, the move frames
(check-transfer and readout-parity), the M_A readout parity, the
Z̄-row-through-the-seam bit, init detectors, and closure detectors."""

import os

import numpy as np
import pytest

from qcss_tpu.decode.uf import UFDecoder
from qcss_tpu.experiments.logical import LogicalProgram


class TestCompiledCnot:
    def test_singles_and_quiet(self):
        prog = LogicalProgram(3, 2).cnot(0, 1)
        model = prog.build()
        dec = UFDecoder(model.graph)
        _, corr = dec.decode_batch(model.F.T.astype(np.uint8),
                                   want_corrections=False)
        for i in range(model.obs.shape[0]):
            assert not ((model.obs[i] ^ ((corr >> i) & 1)) == 1).any()
        out = prog.run(0.0, 0.0, batch=64)
        assert out["word_fail"] == 0.0

    def test_long_range_cnot_builds(self):
        """cnot(0, 2) routes the ancilla across the middle data qubit's
        column — more moves, same guards."""
        prog = LogicalProgram(3, 3).cnot(0, 2)
        model = prog.build()
        dec = UFDecoder(model.graph)
        _, corr = dec.decode_batch(model.F.T.astype(np.uint8),
                                   want_corrections=False)
        for i in range(model.obs.shape[0]):
            assert not ((model.obs[i] ^ ((corr >> i) & 1)) == 1).any()

    def test_suppression_with_distance(self):
        lo = LogicalProgram(3, 2).cnot(0, 1).run(2e-3, batch=1 << 13,
                                                 seed=3)
        hi = LogicalProgram(5, 2).cnot(0, 1).run(2e-3, batch=1 << 13,
                                                 seed=3)
        assert hi["word_fail"] < lo["word_fail"]


class TestDevicePipeline:
    def test_fused_device_matches_host(self):
        """The fully fused device pipeline (sample + UF decode + count in
        one compiled program) is quiet-exact and statistically
        interchangeable with the host decode on the compiled CNOT."""
        prog = LogicalProgram(3, 2).cnot(0, 1)
        quiet = prog.run(0.0, 0.0, batch=256, decoder="device-uf")
        assert quiet["word_fail"] == 0.0
        host = prog.run(2e-3, batch=1 << 12, seed=5)
        dev = prog.run(2e-3, batch=1 << 12, seed=5, decoder="device-uf")
        n = 1 << 12
        # device pairing may differ from host peeling on degenerate
        # shots; rates must agree within combined binomial error
        for k in ("z0_fail", "z1_fail", "word_fail"):
            sd = (host[k] * (1 - host[k]) / n) ** 0.5 + \
                (dev[k] * (1 - dev[k]) / n) ** 0.5 + 1e-9
            assert abs(host[k] - dev[k]) < 5 * sd + 2 / n, (k, host[k],
                                                            dev[k])


class TestTGadgetOp:
    def test_t_quiet_and_singles(self):
        prog = LogicalProgram(3, 1).t(0)
        model = prog.build()
        assert model.meta["obs_names"][0].startswith("t0_m1")
        dec = UFDecoder(model.graph)
        _, corr = dec.decode_batch(model.F.T.astype(np.uint8),
                                   want_corrections=False)
        for i in range(model.obs.shape[0]):
            assert not ((model.obs[i] ^ ((corr >> i) & 1)) == 1).any()
        out = prog.run(0.0, 0.0, batch=64)
        assert out["word_fail"] == 0.0


# -- tableau gold machinery ---------------------------------------------------


# The protocol runner is a package feature (batched per-round segments,
# both sectors, premeasured reference operators); the golds here drive
# it and assert the recipes.
from qcss_tpu.experiments.protocol import (  # noqa: E402
    run_compiled_protocol as _run_compiled_protocol,
)


def _xflip_qubits(prog, i):
    """X̄ support of data patch i (its block's first column)."""
    r0, c0 = prog._origin((0, 2 * i))
    return [(r0 + r) * prog.cols_q + c0 for r in range(prog.d)]


class TestTableauGoldCnot:
    @pytest.mark.parametrize("zc,zt", [
        (1, 0),
        pytest.param(0, 0, marks=pytest.mark.skipif(
            not os.environ.get("QCSS_SLOW_TESTS"),
            reason="slow tableau gold; set QCSS_SLOW_TESTS=1")),
        pytest.param(0, 1, marks=pytest.mark.skipif(
            not os.environ.get("QCSS_SLOW_TESTS"),
            reason="slow tableau gold; set QCSS_SLOW_TESTS=1")),
        pytest.param(1, 1, marks=pytest.mark.skipif(
            not os.environ.get("QCSS_SLOW_TESTS"),
            reason="slow tableau gold; set QCSS_SLOW_TESTS=1")),
    ])
    def test_truth_table(self, zc, zt):
        import jax

        prog = LogicalProgram(3, 2).cnot(0, 1)
        model = prog.build(with_recipe=True)
        recipe = model.meta["recipe"]
        flips = ([] if not zc else _xflip_qubits(prog, 0)) + \
            ([] if not zt else _xflip_qubits(prog, 1))
        n_seeds = 2 if os.environ.get("QCSS_SLOW_TESTS") else 1
        for seed in range(n_seeds):
            o = _run_compiled_protocol(
                prog, model, jax.random.key(131 + 2 * zc + zt + 10 * seed),
                prep_x_flips=flips)
            dets = (recipe["D"].astype(np.int64) @ o.astype(np.int64)) & 1
            assert not dets.any()
            vals = (recipe["obs"].astype(np.int64) @ o.astype(np.int64)) & 1
            names = model.meta["obs_names"]
            got = dict(zip(names, vals))
            assert got["z0"] == zc
            assert got["z1"] == (zt ^ zc)


class TestMzzOp:
    def test_singles_quiet_and_expected(self):
        prog = LogicalProgram(3, 2).x(0).mzz(0, 1)
        model = prog.build()
        assert model.meta["obs_names"][0].startswith("mzz01")
        assert model.meta["obs_expected"] == [1, 1, 0]
        dec = UFDecoder(model.graph)
        _, corr = dec.decode_batch(model.F.T.astype(np.uint8),
                                   want_corrections=False)
        for i in range(model.obs.shape[0]):
            assert not ((model.obs[i] ^ ((corr >> i) & 1)) == 1).any()
        out = prog.run(0.0, 0.0, batch=64)
        assert out["word_fail"] == 0.0

    def test_x_ordering_through_cnot(self):
        """x(c) BEFORE cnot(c,t) flips both outputs; AFTER flips only
        z_c — the tracked bits honor program order."""
        before = LogicalProgram(3, 2).x(0).cnot(0, 1).build()
        after = LogicalProgram(3, 2).cnot(0, 1).x(0).build()
        assert before.meta["obs_expected"] == [1, 1]
        assert after.meta["obs_expected"] == [1, 0]
        # the x op itself adds no phases and no fault locations
        plain = LogicalProgram(3, 2).cnot(0, 1).build()
        assert before.F.shape == plain.F.shape

    @pytest.mark.skipif(not os.environ.get("QCSS_SLOW_TESTS"),
                        reason="slow; set QCSS_SLOW_TESTS=1")
    def test_suppression_with_distance(self):
        lo = LogicalProgram(3, 2).mzz(0, 1).run(2e-3, batch=1 << 13,
                                                seed=3)
        hi = LogicalProgram(5, 2).mzz(0, 1).run(2e-3, batch=1 << 13,
                                                seed=3)
        assert hi["word_fail"] < lo["word_fail"]


class TestTableauGoldMzz:
    @pytest.mark.parametrize("za,zb", [
        (1, 0),
        pytest.param(1, 1, marks=pytest.mark.skipif(
            not os.environ.get("QCSS_SLOW_TESTS"),
            reason="slow tableau gold; set QCSS_SLOW_TESTS=1")),
    ])
    def test_gold(self, za, zb):
        """mzz reads Z̄_a·Z̄_b non-destructively: every detector zero,
        the mzz combination equals za ⊕ zb, and BOTH patch logicals
        survive to the final readout — with the inputs set by the
        compiler's own x() op (exercising meta['x_ops'] end to end)."""
        import jax

        prog = LogicalProgram(3, 2)
        if za:
            prog.x(0)
        if zb:
            prog.x(1)
        prog.mzz(0, 1)
        model = prog.build(with_recipe=True)
        recipe = model.meta["recipe"]
        o = _run_compiled_protocol(prog, model,
                                   jax.random.key(71 + 2 * za + zb))
        dets = (recipe["D"].astype(np.int64) @ o.astype(np.int64)) & 1
        assert not dets.any()
        vals = (recipe["obs"].astype(np.int64) @ o.astype(np.int64)) & 1
        got = dict(zip(model.meta["obs_names"], vals))
        assert got[model.meta["obs_names"][0]] == za ^ zb
        assert got["z0"] == za
        assert got["z1"] == zb
        assert list(vals) == model.meta["obs_expected"]


class TestTableauGoldT:
    @pytest.mark.parametrize("zd,magic_plus", [
        (1, False),
        pytest.param(0, False, marks=pytest.mark.skipif(
            not os.environ.get("QCSS_SLOW_TESTS"),
            reason="slow tableau gold; set QCSS_SLOW_TESTS=1")),
        pytest.param(1, True, marks=pytest.mark.skipif(
            not os.environ.get("QCSS_SLOW_TESTS"),
            reason="slow tableau gold; set QCSS_SLOW_TESTS=1")),
    ])
    def test_gold(self, zd, magic_plus):
        """With the magic patch as a Z-definite stand-in (|0̄⟩: skip its
        H's), m1 must equal z_d ⊕ 0 deterministically; with the declared
        |+̄⟩ prep m1 is projection-random but every detector must still
        be zero and Z̄_D must read back."""
        import jax

        prog = LogicalProgram(3, 1).t(0)
        model = prog.build(with_recipe=True)
        recipe = model.meta["recipe"]
        skip = () if magic_plus else (
            tuple(ci.phase for ci in prog._conj)
            + tuple(ei.phase for ei in prog._enc_init))
        flips = [] if not zd else _xflip_qubits(prog, 0)
        n_seeds = 2 if os.environ.get("QCSS_SLOW_TESTS") else 1
        for seed in range(n_seeds):
            o = _run_compiled_protocol(
                prog, model, jax.random.key(57 + zd + 10 * seed),
                prep_x_flips=flips, skip_h_phases=skip)
            dets = (recipe["D"].astype(np.int64) @ o.astype(np.int64)) & 1
            assert not dets.any()
            vals = (recipe["obs"].astype(np.int64) @ o.astype(np.int64)) & 1
            got = dict(zip(model.meta["obs_names"], vals))
            assert got["z0"] == zd
            if not magic_plus:
                assert got[model.meta["obs_names"][0]] == zd


class TestXSector:
    """The compiled programs' X-CHECK sector (build_x): Z-error faults,
    the t gadgets' OUT frame channels (see surgery_t's bespoke X
    sector)."""

    def test_t_builds_and_singles(self):
        prog = LogicalProgram(3, 1).t(0)
        mx = prog.build_x()
        assert mx.meta["obs_names"] == ["t0_out_0"]
        dec = UFDecoder(mx.graph)
        _, corr = dec.decode_batch(mx.F.T.astype(np.uint8),
                                   want_corrections=False)
        for i in range(mx.obs.shape[0]):
            assert not ((mx.obs[i] ^ ((corr >> i) & 1)) == 1).any()

    def test_cnot_x_sector_guards(self):
        """A cnot program's X sector carries no observable (its X
        readouts are gauge for Z-basis programs) but the mirror
        schedule must still pass every build-time guard."""
        prog = LogicalProgram(3, 2).cnot(0, 1)
        mx = prog.build_x()
        assert mx.obs.shape[0] == 0
        assert mx.F.shape[0] > 0

    def test_run_full_quiet_and_noisy(self):
        out = LogicalProgram(3, 1).t(0).run_full(0.0, 0.0, batch=64)
        assert out["word_fail"] == 0.0
        assert "t0_out_0_fail" in out and "t0_m1_0_fail" in out
        noisy = LogicalProgram(3, 1).t(0).run_full(4e-3, batch=1 << 12,
                                                   seed=2)
        assert noisy["t0_out_0_fail"] > 0
        assert noisy["word_fail"] >= noisy["t0_out_0_fail"]

    @pytest.mark.skipif(not os.environ.get("QCSS_SLOW_TESTS"),
                        reason="slow; set QCSS_SLOW_TESTS=1")
    def test_out_suppression_with_distance(self):
        lo = LogicalProgram(3, 1).t(0).run_full(4e-3, batch=1 << 13,
                                                seed=3)
        hi = LogicalProgram(5, 1).t(0).run_full(4e-3, batch=1 << 13,
                                                seed=3)
        assert hi["t0_out_0_fail"] < lo["t0_out_0_fail"]


class TestTableauGoldTXSector:
    def test_gold(self):
        """The X-sector recipe of the compiled T gadget, golded on the
        tableau engine: ONE projective run measures both sectors' checks
        every round, the X measure-outs, and the final word in X; the
        preserved product X̄_D X̄_M is premeasured right after the magic
        patch's |+̄⟩ prep, and the model's OUT combination must
        reproduce it on every branch (the |+⟩ seam transfers it:
        X̄_merged = X̄_D X_s X̄_M with X_s = +1 at merge start, and the
        split's seam X readout returns X_s)."""
        import jax

        prog = LogicalProgram(3, 1).t(0)
        model = prog.build(with_recipe=True)
        mx = prog.build_x(with_recipe=True)
        recipe_x = mx.meta["recipe"]
        sup = (prog._xrep((0, 0)) ^ prog._xrep((1, 0))).astype(np.uint8)
        prep_ph = prog._enc_init[0].phase   # the magic patch's prep phase
        for seed in (11, 12):
            _, ox, pre = _run_compiled_protocol(
                prog, model, jax.random.key(seed), x_model=mx,
                final_basis="x", premeasure_x=(prep_ph, sup))
            dets = (recipe_x["D"].astype(np.int64)
                    @ ox.astype(np.int64)) & 1
            assert not dets.any()
            vals = (recipe_x["obs"].astype(np.int64)
                    @ ox.astype(np.int64)) & 1
            assert len(pre) == 1
            assert int(vals[0]) == pre[0]


class TestFrameOpsAndH:
    """z/y Pauli frame ops, the transversal-H rotation op, and the
    S-state-injection gadget (round 4: the reference's full test-program
    set at the surgery tier — reference: test/test_ftqc.py:22-113)."""

    def test_reference_program_expected_tables(self):
        # X X X -> 1 ; Y -> 1 ; Y Z -> 1 ; H Z H -> 1
        assert LogicalProgram(3, 1).x(0).x(0).x(0).build() \
            .meta["obs_expected"] == [1]
        assert LogicalProgram(3, 1).y(0).build() \
            .meta["obs_expected"] == [1]
        assert LogicalProgram(3, 1).y(0).z(0).build() \
            .meta["obs_expected"] == [1]
        hzh = LogicalProgram(3, 1).h(0).idle().z(0).idle().h(0)
        m = hzh.build()
        assert m.meta["obs_expected"] == [1]
        # frame ops add no phases and no fault locations
        plain = LogicalProgram(3, 1).idle().idle().build()
        assert m.F.shape == plain.F.shape
        assert (m.F == plain.F).all()

    def test_hzh_quiet_and_singles(self):
        prog = LogicalProgram(3, 1).h(0).idle().z(0).idle().h(0)
        model = prog.build()
        dec = UFDecoder(model.graph)
        _, corr = dec.decode_batch(model.F.T.astype(np.uint8),
                                   want_corrections=False)
        for i in range(model.obs.shape[0]):
            assert not ((model.obs[i] ^ ((corr >> i) & 1)) == 1).any()
        assert prog.run(0.0, 0.0, batch=64)["word_fail"] == 0.0

    def test_h_measure_routes_to_x_sector(self):
        """An odd-H-parity patch's final readout is the ROTATED code's
        Z̄' (interior column) and scores in the build_x schedule."""
        prog = LogicalProgram(3, 1).x(0).h(0).idle()
        prog.measure()
        model = prog.build()
        assert "z0" not in model.meta["obs_names"]
        mx = prog.build_x()
        assert mx.meta["obs_names"] == ["z0"]
        assert mx.meta["obs_expected"] == [None]
        with pytest.raises(ValueError, match="run_full"):
            prog.run(0.0, 0.0, batch=64)
        out = prog.run_full(0.0, 0.0, batch=64)
        assert out["word_fail"] == 0.0
        assert "z0_fail" in out

    def test_h_guards(self):
        with pytest.raises(ValueError, match="frame terms"):
            LogicalProgram(3, 2).cnot(0, 1).h(1)
        with pytest.raises(ValueError, match="odd-H-parity"):
            LogicalProgram(3, 2).h(0).cnot(0, 1)
        with pytest.raises(ValueError, match="Z-basis"):
            LogicalProgram(3, 1).h(0).t(0)
        # round 5: the circuit tier MODELS h (rotated extraction
        # shapes, schedule_circuit.round_ops) — mid-program rotations
        # build instead of raising, with zero residual ambiguity
        from qcss_tpu.sim.noise import NoiseModel
        m = LogicalProgram(3, 1).h(0).idle().h(0).build_circuit(
            NoiseModel(p_gate2=1e-3))
        assert m.meta["ambiguous_sigs"] == 0

    def test_s_state_machine_and_gadget(self):
        # H S S H == H Z H -> 1 (S^2 = Z); each s() emits a full
        # merge-split gadget with its own m1 and OUT channels
        prog = LogicalProgram(3, 1).h(0)
        with pytest.raises(ValueError, match="even-H-parity"):
            prog.s(0)
        prog = LogicalProgram(3, 1).s(0)
        model = prog.build()
        assert model.meta["obs_names"][0].startswith("s0_m1")
        assert model.meta["obs_expected"] == [None, 0]
        mx = prog.build_x()
        assert mx.meta["obs_names"] == ["s0_out_0"]
        dec = UFDecoder(model.graph)
        _, corr = dec.decode_batch(model.F.T.astype(np.uint8),
                                   want_corrections=False)
        for i in range(model.obs.shape[0]):
            assert not ((model.obs[i] ^ ((corr >> i) & 1)) == 1).any()
        assert prog.run_full(0.0, 0.0, batch=64)["word_fail"] == 0.0

    def test_s_matches_t_fault_model(self):
        """The S gadget's schedule and fault surface are IDENTICAL to
        the T gadget's (stand-in semantics); only names and the tracked
        state differ."""
        ms = LogicalProgram(3, 1).s(0).build()
        mt = LogicalProgram(3, 1).t(0).build()
        assert (ms.F == mt.F).all()
        assert (ms.obs == mt.obs).all()


class TestMxAndFeedback:
    """mx (non-destructive X̄ measurement via a horizontal XX merge) and
    x_if (classical feedback as observable algebra). The reference's
    measure-and-correct program (H; MEASURE -> m; if m: X; MEASURE -> 0,
    test/test_ftqc.py:104-113) compiles to mx + h + x_if via the
    channel identity MZ∘H = H∘MX."""

    def test_mx_builds_and_expected(self):
        prog = LogicalProgram(3, 1).mx(0)
        prog.measure()
        mx = prog.build_x()
        assert mx.meta["obs_names"] == ["mx0_0"]
        assert mx.meta["obs_expected"] == [None]   # X̄ of |0̄> is random
        # after mx (no h) the patch's Z̄ is re-projected GAUGE — the
        # final z0 is not a decodable channel and is dropped (declaring
        # it trips the build-time same-signature guard)
        model = prog.build()
        assert model.meta["obs_names"] == []
        assert model.meta["unscored"] == ["z0"]
        # on a |+̄>-prepped abstraction (h first) mx is deterministic:
        prog2 = LogicalProgram(3, 1)
        prog2.h(0)
        with pytest.raises(ValueError, match="odd-H-parity"):
            prog2.mx(0)
        assert prog.run_full(0.0, 0.0, batch=64)["word_fail"] == 0.0

    def test_feedback_program_deterministic(self):
        prog = LogicalProgram(3, 1).mx(0).h(0).x_if(0, "mx0_0")
        prog.measure()
        mx = prog.build_x()
        assert mx.meta["obs_names"] == ["mx0_0", "z0"]
        assert mx.meta["obs_expected"] == [None, 0]
        out = prog.run_full(0.0, 0.0, batch=64)
        assert out["word_fail"] == 0.0
        # noisy: the feedback channel decodes and suppresses with d
        lo = LogicalProgram(3, 1).mx(0).h(0).x_if(0, "mx0_0") \
            .run_full(3e-3, batch=1 << 12, seed=3)
        assert 0 < lo["z0_fail"] < 0.1

    def test_x_if_guards(self):
        with pytest.raises(ValueError, match="no measured outcome"):
            LogicalProgram(3, 1).x_if(0, "nope")
        # cross-sector feedback refused: an mx outcome conditioning an
        # even (Z-scored) patch cannot be decoded by independent sectors
        prog = LogicalProgram(3, 2).mx(1).x_if(0, "mx1_0")
        with pytest.raises(ValueError, match="sector"):
            prog.measure()
        # mx without h: the patch's own z0 is gauge and DROPPED (not an
        # error; its x_if terms go with it)
        prog2 = LogicalProgram(3, 1).mx(0).x_if(0, "mx0_0")
        prog2.measure()
        assert prog2._unscored == ["z0"]


class TestMzOp:
    """mz (non-destructive Z̄ measurement via a |0̄⟩ ancilla ZZ merge) —
    the reference's mid-program MEASURE (css_code.py:542-589) at the
    surgery tier."""

    def test_mz_deterministic_and_conditional(self):
        prog = LogicalProgram(3, 1).x(0).mz(0)
        model = prog.build()
        assert model.meta["obs_names"] == ["mz0_0", "z0"]
        assert model.meta["obs_expected"] == [1, 1]   # no collapse on Z
        dec = UFDecoder(model.graph)
        _, corr = dec.decode_batch(model.F.T.astype(np.uint8),
                                   want_corrections=False)
        for i in range(model.obs.shape[0]):
            assert not ((model.obs[i] ^ ((corr >> i) & 1)) == 1).any()
        assert prog.run(0.0, 0.0, batch=64)["word_fail"] == 0.0
        # x_if on a DETERMINISTIC outcome folds into the tracked bit
        prog2 = LogicalProgram(3, 1).x(0).mz(0).x_if(0, "mz0_0")
        m2 = prog2.build()
        assert m2.meta["obs_expected"] == [1, 0]
        assert prog2.run(0.0, 0.0, batch=64)["word_fail"] == 0.0

    def test_mz_guards_and_flags(self):
        with pytest.raises(ValueError, match="odd-H-parity"):
            LogicalProgram(3, 1).h(0).mz(0)
        # X̄ is randomized by the joint: a later h readout is unanchored
        prog = LogicalProgram(3, 1).mz(0).h(0).idle()
        prog.measure()
        assert prog._unscored == ["z0"]

    def test_mz_gold(self):
        """x-mz-x_if: every detector zero, mz reads 1, the conditioned
        final z0 reads 0 — on the real projective protocol."""
        import jax

        prog = LogicalProgram(3, 1).x(0).mz(0).x_if(0, "mz0_0")
        model = prog.build(with_recipe=True)
        recipe = model.meta["recipe"]
        o = _run_compiled_protocol(prog, model, jax.random.key(77))
        dets = (recipe["D"].astype(np.int64) @ o.astype(np.int64)) & 1
        assert not dets.any()
        vals = (recipe["obs"].astype(np.int64) @ o.astype(np.int64)) & 1
        got = dict(zip(model.meta["obs_names"], vals))
        assert got["mz0_0"] == 1
        assert got["z0"] == 0


class TestTableauGoldFrameOps:
    def test_yz_gold(self):
        """y(0) z(0): Ȳ then Z̄ chains applied physically; z0 reads 1."""
        import jax

        prog = LogicalProgram(3, 1).y(0).z(0)
        model = prog.build(with_recipe=True)
        recipe = model.meta["recipe"]
        o = _run_compiled_protocol(prog, model, jax.random.key(201))
        dets = (recipe["D"].astype(np.int64) @ o.astype(np.int64)) & 1
        assert not dets.any()
        vals = (recipe["obs"].astype(np.int64) @ o.astype(np.int64)) & 1
        assert list(vals) == [1]

    def test_hzh_gold(self):
        """h-idle-z-idle-h: the rotated interval's hz rows are measured
        as X-TYPE operators (the rotated code's X checks) with the
        transversal H applied at each recorded boundary — every
        detector zero on random branches, z0 == 1."""
        import jax

        prog = LogicalProgram(3, 1).h(0).idle().z(0).idle().h(0)
        model = prog.build(with_recipe=True)
        recipe = model.meta["recipe"]
        seeds = (31, 32) if os.environ.get("QCSS_SLOW_TESTS") else (31,)
        for seed in seeds:
            o = _run_compiled_protocol(prog, model, jax.random.key(seed))
            dets = (recipe["D"].astype(np.int64) @ o.astype(np.int64)) & 1
            assert not dets.any()
            vals = (recipe["obs"].astype(np.int64) @ o.astype(np.int64)) & 1
            assert list(vals) == [1]

    def test_h_measure_gold_both_sectors(self):
        """x-h-idle (odd parity at readout): the Z-sector recipe closes
        fictitiously (X word) and the X-sector recipe closes on the REAL
        Z word — both detector sets must be zero on random branches."""
        import jax

        prog = LogicalProgram(3, 1).x(0).h(0).idle()
        model = prog.build(with_recipe=True)
        recipe = model.meta["recipe"]
        o = _run_compiled_protocol(prog, model, jax.random.key(41))
        dets = (recipe["D"].astype(np.int64) @ o.astype(np.int64)) & 1
        assert not dets.any()
        mx = prog.build_x(with_recipe=True)
        recipe_x = mx.meta["recipe"]
        _, ox, _ = _run_compiled_protocol(prog, model, jax.random.key(42),
                                          x_model=mx, final_basis="x")
        dets_x = (recipe_x["D"].astype(np.int64) @ ox.astype(np.int64)) & 1
        assert not dets_x.any()

    def test_feedback_gold(self):
        """mx-h-x_if (the reference's measure-and-correct program): one
        projective run, X-sector recipe — every detector zero and z0
        EXACTLY 0 on every random measurement branch (the mx outcome is
        a fair coin; the x_if combination cancels it)."""
        import jax

        prog = LogicalProgram(3, 1).mx(0).h(0).x_if(0, "mx0_0")
        model = prog.build(with_recipe=True)
        mx = prog.build_x(with_recipe=True)
        recipe_x = mx.meta["recipe"]
        seen = set()
        seeds = (61, 62, 63) if os.environ.get("QCSS_SLOW_TESTS") else (61,)
        for seed in seeds:
            _, ox, _ = _run_compiled_protocol(
                prog, model, jax.random.key(seed), x_model=mx,
                final_basis="x")
            dets_x = (recipe_x["D"].astype(np.int64)
                      @ ox.astype(np.int64)) & 1
            assert not dets_x.any()
            vals = (recipe_x["obs"].astype(np.int64)
                    @ ox.astype(np.int64)) & 1
            got = dict(zip(mx.meta["obs_names"], vals))
            assert got["z0"] == 0
            seen.add(int(got["mx0_0"]))
        assert len(seen) >= 1   # coin outcomes observed

    def test_s_gold_z_definite_standin(self):
        """With the stand-in patch Z-definite (skip its H's), the S
        gadget's m1 must equal z_d deterministically — same contract as
        the T gold (the gadgets share their fault model)."""
        import jax

        prog = LogicalProgram(3, 1).x(0).s(0)
        model = prog.build(with_recipe=True)
        recipe = model.meta["recipe"]
        skip = (tuple(ci.phase for ci in prog._conj)
                + tuple(ei.phase for ei in prog._enc_init))
        o = _run_compiled_protocol(prog, model, jax.random.key(51),
                                   skip_h_phases=skip)
        dets = (recipe["D"].astype(np.int64) @ o.astype(np.int64)) & 1
        assert not dets.any()
        vals = (recipe["obs"].astype(np.int64) @ o.astype(np.int64)) & 1
        got = dict(zip(model.meta["obs_names"], vals))
        assert got["z0"] == 1
        assert got[model.meta["obs_names"][0]] == 1


class TestMzzLayer:
    def test_one_pair_bit_identical_to_mzz(self):
        """A single-pair layer compiles the EXACT schedule mzz emits —
        the parallel emitters share the single-op semantics."""
        a = LogicalProgram(3, 2).mzz(0, 1).build()
        b = LogicalProgram(3, 2).mzz_layer([(0, 1)]).build()
        assert (a.F == b.F).all()
        assert (a.obs == b.obs).all()
        assert (a.graph.edges == b.graph.edges).all()
        assert (a.graph.edge_obs == b.graph.edge_obs).all()

    def test_parallel_layer_builds_and_decodes(self):
        """Two simultaneous disjoint joints: phase count independent of
        the pair count (the bus serialization removed), every guard
        passes, singles decode exactly, expected values track x ops."""
        prog = LogicalProgram(3, 4).x(1).mzz_layer([(0, 1), (2, 3)])
        model = prog.build()
        seq = LogicalProgram(3, 4).mzz(0, 1).mzz(2, 3)
        seq.measure()
        assert len(prog._phases) < len(seq._phases) * 0.6
        assert model.meta["obs_expected"] == [1, 0, 0, 1, 0, 0]
        dec = UFDecoder(model.graph)
        _, corr = dec.decode_batch(model.F.T.astype(np.uint8),
                                   want_corrections=False)
        for i in range(model.obs.shape[0]):
            assert not ((model.obs[i] ^ ((corr >> i) & 1)) == 1).any()
        out = prog.run(0.0, 0.0, batch=64)
        assert out["word_fail"] == 0.0

    def test_overlap_guard(self):
        with pytest.raises(ValueError, match="overlap"):
            LogicalProgram(3, 3).mzz_layer([(0, 1), (1, 2)])

    @pytest.mark.skipif(not os.environ.get("QCSS_SLOW_TESTS"),
                        reason="slow tableau gold; set QCSS_SLOW_TESTS=1")
    def test_gold_two_pairs(self):
        """Tableau gold of a 2-pair brickwork layer (189-qubit grid):
        every detector zero, both joints and all four finals exact."""
        import jax

        prog = LogicalProgram(3, 4).x(1).x(2).mzz_layer([(0, 1), (2, 3)])
        model = prog.build(with_recipe=True)
        recipe = model.meta["recipe"]
        o = _run_compiled_protocol(prog, model, jax.random.key(97))
        dets = (recipe["D"].astype(np.int64) @ o.astype(np.int64)) & 1
        assert not dets.any()
        vals = (recipe["obs"].astype(np.int64) @ o.astype(np.int64)) & 1
        assert list(vals) == model.meta["obs_expected"]
