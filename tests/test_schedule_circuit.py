"""Circuit-level declarative schedules: enumerator-vs-sampler exactness.

The load-bearing test is the differential: every enumerated circuit
fault component's detector signature and observable effect must be
reproduced by injecting that exact fault into the frame engine running
the SAME per-phase extraction circuits (prefix-propagate, inject,
suffix-propagate) — the guard that keeps dem/dem2/surgery_circuit
honest, extended to the generic schedule tier (time-varying checks,
transitions, readouts, conjugate inits, moves)."""

import jax
import numpy as np
import pytest

from qcss_tpu.experiments import schedule_circuit as SC
from qcss_tpu.experiments.logical import LogicalProgram
from qcss_tpu.sim import frame as fr
from qcss_tpu.sim.noise import NoiseModel

NOISE = NoiseModel(p_gate1=1e-3, p_gate2=1e-3, p_meas=1e-3, p_reset=1e-3)

# eager lax.scan dispatches op-by-op; one jitted wrapper per gate-array
# shape serves every injection
_PROP = jax.jit(fr.propagate_arrays)


def _inject_and_assemble(plan, meta):
    """Raw-outcome deviation vector of one fault via frame propagation
    through the actual circuits — independent of the enumerator's walk.
    Handles the round-5 generalizations: h rotation boundaries,
    Z-sector injections on rotated-check gates ('2qz'/'2qzf'/'initz'),
    per-read and per-qubit final deviation bases."""
    kind = meta[0]
    f = fr.zero_frames(1, plan.nq)
    outs_all = []
    read_bits = [0] * plan.n_read

    def put(wires, comp):
        pat = np.zeros(plan.nq, np.uint8)
        pat[list(wires)] = 1
        if comp == "x":
            return fr.Frames(f.x ^ np.asarray(pat[None, :]), f.z)
        return fr.Frames(f.x, f.z ^ np.asarray(pat[None, :]))

    for ph in range(plan.n_ph):
        if ph > 0 and plan.ro_at[ph]:
            fx = np.asarray(f.x)[0]
            fzv = np.asarray(f.z)[0]
            for qb, ridx, from_z in plan.ro_at[ph]:
                b = int(fzv[qb] if from_z else fx[qb])
                if kind == "read" and meta[1] == ph and meta[2] == qb:
                    b ^= 1
                read_bits[ridx] = b
        if ph > 0 and plan.gone_at[ph]:
            f = fr.reset_qubits(f, np.asarray(plan.gone_at[ph]))
        if kind == "init" and meta[1] == ph:
            f = put([meta[2]], "x")
        if kind == "initz" and meta[1] == ph:
            f = put([meta[2]], "z")
        if plan.h_at[ph]:
            hq = np.asarray(plan.h_at[ph])
            x2 = np.asarray(f.x).copy()
            z2 = np.asarray(f.z).copy()
            x2[:, hq], z2[:, hq] = np.asarray(f.z)[:, hq], \
                np.asarray(f.x)[:, hq]
            f = fr.Frames(x2, z2)
        ops_a, q0_a, q1_a = (np.asarray(a) for a in plan.arrays[ph])
        idx = np.arange(ops_a.shape[0])
        anc_z = np.arange(plan.n, plan.n + plan.rz[ph])
        anc_rest = np.arange(plan.n + plan.rz[ph], plan.nq)
        for t_rel in range(plan.rounds[ph]):
            t_abs = plan.starts[ph] + t_rel
            if (kind in ("2q", "2qf", "2qz", "2qzf") and meta[1] == ph
                    and meta[-1] == t_abs):
                k = meta[2]
                # fixed-shape prefix/suffix (gates masked to I)
                f = _PROP(
                    f, np.where(idx <= k, ops_a, 0), q0_a, q1_a)
                op = plan.ops[ph][k]
                comp = "z" if kind in ("2qz", "2qzf") else "x"
                if kind in ("2q", "2qz"):
                    wires = {"c": [op[1]], "t": [op[2]],
                             "ct": [op[1], op[2]]}[meta[3]]
                else:            # first gate: reduced channel
                    wires = [op[2]]
                f = put(wires, comp)
                f = _PROP(
                    f, np.where(idx > k, ops_a, 0), q0_a, q1_a)
            else:
                f = _PROP(f, ops_a, q0_a, q1_a)
            _, o = fr.measure_deviations(f, anc_z)
            o = np.asarray(o)[0].copy()
            if kind == "meas" and meta[1] == ph and meta[3] == t_abs:
                o[meta[2]] ^= 1
            outs_all.append(o)
            f = fr.reset_qubits(f, anc_z)
            if anc_rest.size:
                f = fr.reset_qubits(f, anc_rest)
            if kind == "reset" and meta[1] == ph and meta[3] == t_abs:
                f = put([plan.n + meta[2]], "x")

    fz = np.asarray(plan.final_from_z, np.uint8)
    final = np.where(fz > 0, np.asarray(f.z)[0, : plan.n],
                     np.asarray(f.x)[0, : plan.n])
    raw = np.concatenate(
        [np.concatenate(outs_all),
         np.asarray(read_bits, np.uint8),
         final]).astype(np.int64)
    dets = (plan.D.astype(np.int64) @ raw) & 1
    obs = (plan.obs_D.astype(np.int64) @ raw) & 1
    return dets, obs


def _model(prog):
    return prog.build_circuit(NOISE)


@pytest.fixture(scope="module")
def cnot_model():
    return _model(LogicalProgram(3, 2).cnot(0, 1))


class TestDifferential:
    def test_enumerator_matches_frame_injection(self, cnot_model):
        """Every fault class of the compiled CNOT, sampled across
        phases/rounds, reproduces in the frame engine."""
        m = cnot_model
        rng = np.random.default_rng(0)
        by_kind: dict[str, list] = {}
        for dets, ob, meta in m.fault_sigs:
            by_kind.setdefault(meta[0], []).append((dets, ob, meta))
        assert set(by_kind) == {"2q", "2qf", "meas", "reset", "init",
                                "read"}
        checked = 0
        for kind, sigs in by_kind.items():
            take = min(len(sigs), 16 if kind == "2q" else 8)
            for i in rng.choice(len(sigs), size=take, replace=False):
                dets_want, ob_want, meta = sigs[int(i)]
                dets, obs = _inject_and_assemble(m.plan, meta)
                got = tuple(np.nonzero(dets)[0])
                ob_got = 0
                for j in range(obs.shape[0]):
                    ob_got |= int(obs[j]) << j
                assert got == dets_want, (meta, got, dets_want)
                assert ob_got == ob_want, (meta, ob_got, ob_want)
                checked += 1
        assert checked >= 50

    def test_mzz_program_differential(self):
        """The mzz op's schedule (seam reuse, silent ancilla exit)
        also reproduces — a structurally different program."""
        m = _model(LogicalProgram(3, 2).mzz(0, 1))
        rng = np.random.default_rng(1)
        idx = rng.choice(len(m.fault_sigs), size=24, replace=False)
        for i in idx:
            dets_want, ob_want, meta = m.fault_sigs[int(i)]
            dets, obs = _inject_and_assemble(m.plan, meta)
            assert tuple(np.nonzero(dets)[0]) == dets_want, meta
            ob_got = 0
            for j in range(obs.shape[0]):
                ob_got |= int(obs[j]) << j
            assert ob_got == ob_want, meta


    def test_t_program_differential(self):
        """The T-gadget path inside a larger program: since round 5 the
        m1 row is KEPT at circuit level (the encoded-arrival magic
        patch removed the stabilizer-at-birth gauge that forced the
        round-4 drop), and every booked fault reproduces in the frame
        engine against all three rows."""
        m = _model(LogicalProgram(3, 2).t(0).cnot(0, 1))
        assert m.meta["dropped_obs"] == []
        assert m.meta["obs_names"] == ["t0_m1_0", "z0", "z1"]
        assert m.meta["ambiguous_sigs"] == 0
        rng = np.random.default_rng(3)
        idx = rng.choice(len(m.fault_sigs), size=16, replace=False)
        for i in idx:
            dets_want, ob_want, meta = m.fault_sigs[int(i)]
            dets, obs = _inject_and_assemble(m.plan, meta)
            assert tuple(np.nonzero(dets)[0]) == dets_want, meta
            ob_got = 0
            for j in range(obs.shape[0]):
                ob_got |= int(obs[j]) << j
            assert ob_got == ob_want, meta


class TestEndToEnd:
    def test_quiet_run_exactly_zero(self, cnot_model):
        dets, obs = SC.sample_circuit_schedule(
            cnot_model, NoiseModel(), batch=16, seed=0)
        assert not dets.any() and not obs.any()

    def test_single_faults_decode_exactly(self, cnot_model):
        """Every merged fault variable's own syndrome decodes to its
        own observable effect (sampled subset; weight-1 exactness)."""
        from qcss_tpu.decode.bp import BPDecoder

        m = cnot_model
        rng = np.random.default_rng(2)
        idx = rng.choice(m.F.shape[1], size=96, replace=False)
        dets = m.F[:, idx].T.astype(np.uint8)
        dec = BPDecoder(m.F, np.clip(m.priors, 1e-12, 0.499),
                        logicals=m.obs, iters=48, alpha=0.8, osd=True)
        flips, _ = dec.decode_obs(dets)
        want = m.obs[:, idx].T
        assert (flips.astype(np.uint8) == want).all()

    def test_compiled_cnot_under_circuit_noise(self, cnot_model):
        out = SC.circuit_schedule_memory(cnot_model, NOISE,
                                         batch=2048, seed=3)
        assert out["bp_converged"] > 0.9
        assert out["word_fail"] < 0.06
        # noise is ON: some detectors must fire
        dets, _ = SC.sample_circuit_schedule(cnot_model, NOISE,
                                             batch=64, seed=4)
        assert dets.any()

    def test_run_circuit_names_and_rates(self):
        out = LogicalProgram(3, 2).cnot(0, 1).run_circuit(
            NOISE, batch=1024, seed=5)
        assert {"z0_fail", "z1_fail", "word_fail"} <= set(out)
        assert 0.0 <= out["word_fail"] <= 0.1


class TestCircuitLevelH:
    """Round 5: mid-program transversal-H rotation at the circuit tier
    (rotated patches extract through the opposite circuit shapes) and
    the X-sector circuit model (`build_circuit_x`) — the feedback
    program's home. The differential guard is the oracle, exactly as
    for the unrotated classes."""

    @pytest.fixture(scope="class")
    def hih_model(self):
        # h(0); idle; h(0): a genuinely ROTATED middle phase (adjacent
        # h's would cancel — the idle keeps extraction rounds between)
        return LogicalProgram(3, 1).h(0).idle().h(0).build_circuit(NOISE)

    @pytest.fixture(scope="class")
    def feedback_x_model(self):
        prog = LogicalProgram(3, 1).mx(0).h(0).x_if(0, "mx0_0")
        return prog.build_circuit_x(NOISE)

    def test_rotated_phase_emits_opposite_shapes(self, hih_model):
        plan = hih_model.plan
        assert any(plan.rot[ph].any() for ph in range(plan.n_ph))
        # a rotated phase's ops include the scored ancilla H sandwich
        rot_ph = next(ph for ph in range(plan.n_ph)
                      if plan.rot[ph].any())
        assert any(op[0] == "h" for op in plan.ops[rot_ph])
        assert plan.h_at[rot_ph] or any(
            plan.h_at[p] for p in range(plan.n_ph))

    def test_hih_differential(self, hih_model):
        """Every fault class of the rotated program reproduces in the
        frame engine — including the z-sector classes on rotated-check
        gates and faults whose residuals cross the h boundaries."""
        m = hih_model
        rng = np.random.default_rng(11)
        by_kind: dict[str, list] = {}
        for dets, ob, meta in m.fault_sigs:
            by_kind.setdefault(meta[0], []).append((dets, ob, meta))
        assert "2qz" in by_kind and "2qzf" in by_kind
        for kind, sigs in by_kind.items():
            take = min(len(sigs), 16 if kind.startswith("2q") else 8)
            for i in rng.choice(len(sigs), size=take, replace=False):
                dets_want, ob_want, meta = sigs[int(i)]
                dets, obs = _inject_and_assemble(m.plan, meta)
                assert tuple(np.nonzero(dets)[0]) == dets_want, meta
                ob_got = 0
                for j in range(obs.shape[0]):
                    ob_got |= int(obs[j]) << j
                assert ob_got == ob_want, meta

    def test_feedback_x_differential(self, feedback_x_model):
        """The X-sector circuit model (all scored checks extract as
        fan-outs; z-sector fault classes throughout) reproduces in the
        frame engine for every class."""
        m = feedback_x_model
        assert m.meta["obs_names"] == ["z0"]
        assert m.meta["dropped_obs"] == ["mx0_0"]
        rng = np.random.default_rng(12)
        by_kind: dict[str, list] = {}
        for dets, ob, meta in m.fault_sigs:
            by_kind.setdefault(meta[0], []).append((dets, ob, meta))
        assert "2qz" in by_kind and "2qzf" in by_kind
        for kind, sigs in by_kind.items():
            take = min(len(sigs), 16 if kind.startswith("2q") else 8)
            for i in rng.choice(len(sigs), size=take, replace=False):
                dets_want, ob_want, meta = sigs[int(i)]
                dets, obs = _inject_and_assemble(m.plan, meta)
                assert tuple(np.nonzero(dets)[0]) == dets_want, meta
                ob_got = 0
                for j in range(obs.shape[0]):
                    ob_got |= int(obs[j]) << j
                assert ob_got == ob_want, meta

    def test_quiet_runs_exactly_zero(self, hih_model, feedback_x_model):
        for m in (hih_model, feedback_x_model):
            dets, obs = SC.sample_circuit_schedule(
                m, NoiseModel(), batch=16, seed=0)
            assert not dets.any() and not obs.any()

    def test_single_faults_decode_exactly(self, hih_model,
                                          feedback_x_model):
        from qcss_tpu.decode.bp import BPDecoder

        for m in (hih_model, feedback_x_model):
            rng = np.random.default_rng(13)
            idx = rng.choice(m.F.shape[1], size=min(96, m.F.shape[1]),
                             replace=False)
            dets = m.F[:, idx].T.astype(np.uint8)
            dec = BPDecoder(m.F, np.clip(m.priors, 1e-12, 0.499),
                            logicals=m.obs, iters=48, alpha=0.8,
                            osd=True)
            flips, _ = dec.decode_obs(dets)
            assert (flips.astype(np.uint8) == m.obs[:, idx].T).all()

    def test_hzh_and_feedback_run_circuit(self):
        """The reference's hardest programs (HZH, measure-and-correct —
        test/test_ftqc.py:68-113) run end to end at the circuit tier."""
        out = LogicalProgram(3, 1).h(0).z(0).h(0).run_circuit(
            NOISE, batch=1024, seed=7)
        assert {"z0_fail", "word_fail"} <= set(out)
        assert 0.0 <= out["word_fail"] <= 0.1
        out2 = LogicalProgram(3, 1).mx(0).h(0).x_if(0, "mx0_0") \
            .run_circuit(NOISE, batch=1024, seed=8)
        assert "z0_fail" in out2
        assert 0.0 <= out2["word_fail"] <= 0.1


class TestTwoSectorCircuitT:
    """Round 5 (the twice-deferred VERDICT item): the T/S gadget's m1
    and OUT channels at CIRCUIT level, both sectors. Enabled by the
    encoded-arrival gadget ancilla + encoded data init (no
    stabilizer-at-birth gauge — the round-4 drop reason) and the
    final-boundary OUT scoring; verified by the same differential
    guard as every other class."""

    @pytest.fixture(scope="class")
    def t_models(self):
        prog = LogicalProgram(3, 1).t(0)
        return prog.build_circuit(NOISE), prog.build_circuit_x(NOISE)

    def test_channels_kept_and_unambiguous(self, t_models):
        mz, mx = t_models
        assert mz.meta["obs_names"] == ["t0_m1_0", "z0"]
        assert mz.meta["dropped_obs"] == []
        assert mx.meta["obs_names"] == ["t0_out_0"]
        assert mx.meta["dropped_obs"] == []
        assert mz.meta["ambiguous_sigs"] == 0
        assert mx.meta["ambiguous_sigs"] == 0

    def test_t_differentials_both_sectors(self, t_models):
        for m in t_models:
            rng = np.random.default_rng(21)
            by_kind: dict[str, list] = {}
            for dets, ob, meta in m.fault_sigs:
                by_kind.setdefault(meta[0], []).append((dets, ob, meta))
            for kind, sigs in by_kind.items():
                take = min(len(sigs), 12 if kind.startswith("2q") else 6)
                for i in rng.choice(len(sigs), size=take, replace=False):
                    dets_want, ob_want, meta = sigs[int(i)]
                    dets, obs = _inject_and_assemble(m.plan, meta)
                    assert tuple(np.nonzero(dets)[0]) == dets_want, meta
                    ob_got = 0
                    for j in range(obs.shape[0]):
                        ob_got |= int(obs[j]) << j
                    assert ob_got == ob_want, meta

    def test_single_faults_decode_exactly(self, t_models):
        from qcss_tpu.decode.bp import BPDecoder

        for m in t_models:
            rng = np.random.default_rng(22)
            idx = rng.choice(m.F.shape[1], size=min(96, m.F.shape[1]),
                             replace=False)
            dets = m.F[:, idx].T.astype(np.uint8)
            dec = BPDecoder(m.F, np.clip(m.priors, 1e-12, 0.499),
                            logicals=m.obs, iters=48, alpha=0.8,
                            osd=True)
            flips, _ = dec.decode_obs(dets)
            assert (flips.astype(np.uint8) == m.obs[:, idx].T).all()

    def test_quiet_runs_exactly_zero(self, t_models):
        for m in t_models:
            dets, obs = SC.sample_circuit_schedule(
                m, NoiseModel(), batch=16, seed=0)
            assert not dets.any() and not obs.any()

    def test_run_circuit_composes_both_sectors(self):
        out = LogicalProgram(3, 1).t(0).run_circuit(NOISE, batch=2048,
                                                    seed=9)
        assert {"t0_m1_0_fail", "t0_out_0_fail", "z0_fail",
                "word_fail_z", "word_fail_x", "word_fail"} <= set(out)
        assert 0.0 <= out["word_fail"] <= 0.1
