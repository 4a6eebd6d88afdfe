"""Circuit-level tier for declarative patch schedules: the compiled
logical programs (and any `patches.build_schedule` input) with REAL
extraction circuits instead of phenomenological per-round faults.

The phenomenological tier charges one scored-sector error per active
qubit per round plus measurement flips. This tier runs the actual
ancilla-based extraction circuits of BOTH stabilizer sectors every
round — conjugate-sector (X-check) fan-outs whose mid-fan-out ancilla
X errors HOOK into several data qubits, scored-sector (Z-check)
collection CNOTs, noisy measurement/reset, init errors at activation —
so every circuit fault location appears with its exact multi-detector
signature. Signatures exceed weight 2, so decoding is BP(+device OSD)
over a detector-fault Tanner graph, the same architecture as the
circuit-level qLDPC memories (`decode.bp_dem`) and the circuit-level
XX merge (`experiments.surgery_circuit`), here generalized to ANY
declarative schedule: time-varying check sets, patch activation /
deactivation, mid-program scored readouts, conjugate-basis inits,
moves, joint measurements.

Tier consistency is BY CONSTRUCTION, not by re-derivation: the
phenomenological builder's outcome-space recipe
(`build_schedule(with_recipe=True)`) exposes the detector and
observable assembly as linear maps D / obs_D over RAW outcomes
(scored-check outcomes, readout bits, final data word). Circuit faults
are linear in raw outcomes too, so the circuit fault Tanner graph is
one matmul, F = D @ O (O = per-fault raw-outcome deviations), and the
sampler's detectors ride the SAME D — both tiers share one detector
semantics (transition partners, init/closure rows, conjugate-init
drops, joint solves) with zero duplicated assembly logic.

Scored-sector conventions (Z-scored, matching `experiments.logical`):
X errors are the fault sector; Z-check outcomes and Z-basis readouts
see them; Z errors are the mirror-image sector and are never booked
(they cannot flip any scored outcome: data wires see no H, and
ancilla Z errors either stay on the ancilla or land on conjugate
outcomes that are discarded). The noise channel decomposition uses
EXCLUSIVE X-support classes (ctrl-only / tgt-only / both at 4p/15 per
CNOT) — the same partition `decode.dem2._fault_species` uses,
avoiding the X⊗X double-booking bug calibration caught there. The
X-ancilla H sandwich carries no scored-relevant noise (every
component is either the identity on the fresh |+⟩ or a flip of the
discarded conjugate outcome — see `round_ops`), so `p_gate1` is not
charged in this tier; these circuits contain two-qubit gates,
measurements and resets only.

What stays idealized (documented, matching the bespoke circuit tier
`surgery_circuit.py`): the FINAL transversal readout is perfect (the
phenomenological boundary-slot convention), conjugate-sector
measurement outcomes are discarded (their flips cannot enter any
scored detector), and `p_idle` is refused.

No reference analogue at any tier: the reference has one code block,
one extraction protocol and no multi-patch machinery (reference:
ftqc.py:42-120, css_code.py:436-470).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from qcss_tpu.experiments import patches as P
from qcss_tpu.sim import frame as fr
from qcss_tpu.sim import noise as noise_mod


# -- per-phase round circuits -------------------------------------------------


def round_ops(hz: np.ndarray, hx: np.ndarray, n: int, rz_max: int):
    """One extraction round as op tuples + frame-engine gate arrays —
    ONE source of truth for gate order (enumerator and sampler agree on
    hook timing). Conjugate (X) checks first: per-check CNOT fan-outs
    ancilla→data; then scored (Z) checks: per-check CNOT collections
    data→ancilla. All ancillas measure/reset simultaneously at round
    end (handled outside these ops).

    The X-ancillas' H sandwich is NOT emitted — every component of
    both H noise locations is provably scored-gauge: on the opening H
    the ancilla is a fresh product |+⟩, so the X component is the
    IDENTITY (booking it over-counts a branch relabel of projection-
    random joints as a logical deviation — the circuit-level form of
    the conjugate-init fault exemption; it fired the undetectable-
    logical guard on the compiled T gadget's m1 as a detector-silent
    full-check frame) and Y/Z flip only the X-check outcome, which is
    DISCARDED (not a scored detector input); on the closing H every
    component flips at most that same discarded outcome. Likewise an
    X-ancilla |+⟩-reset error is gauge (X component identity, Z flips
    the discarded outcome), so the sampler clears those wires
    noiselessly. The mid-fan-out hook channel (2q depolarizing on the
    fan-out CNOTs) is untouched and complete — a ctrl-X after the j-th
    CNOT hooks into the remaining targets, the real physics — EXCEPT on
    the FIRST fan-out CNOT of each X-check, where the post-gate state
    is stabilized by X_anc·X_target (CNOT|+⟩|ψ⟩ is the entangled pair),
    so the depolarizing classes reduce modulo that stabilizer:
    both-sides ≡ identity, ctrl-only ≡ tgt-only — ONE class, X on the
    target at 8p/15 (`first_flags` marks these gates; enumerator and
    sampler both apply the reduced channel there). Booking the generic
    classes instead re-creates the same detector-silent gauge frame
    through the X⊗X component."""
    from qcss_tpu.circuits.ir import Circuit

    rz, rx = hz.shape[0], hx.shape[0]
    ax0 = n + rz_max
    ops = []
    flags = []
    circ = Circuit()
    for c in range(rx):
        for i, j in enumerate(np.nonzero(hx[c])[0]):
            ops.append(("cnot", ax0 + c, int(j)))
            flags.append(1 if i == 0 else 0)
            circ.cnot(ax0 + c, int(j))
    for c in range(rz):
        for j in np.nonzero(hz[c])[0]:
            ops.append(("cnot", int(j), n + c))
            flags.append(0)
            circ.cnot(int(j), n + c)
    return ops, circ.to_arrays(), np.asarray(flags, np.int32)


def _walk(ops, nq: int, start: int, x0: np.ndarray):
    """Propagate an X-sector Pauli injected AFTER op index `start`
    (-1 = round start) to the end of the round; H converts through the
    z component. Returns the final (x, z) frame."""
    x = x0.copy()
    z = np.zeros(nq, np.uint8)
    for op in ops[start + 1:]:
        if op[0] == "cnot":
            _, c, t = op
            x[t] ^= x[c]
            z[c] ^= z[t]
        else:
            q = op[1]
            x[q], z[q] = z[q], x[q]
    return x, z


# -- the assembled model ------------------------------------------------------


@dataclass(frozen=True)
class CircuitScheduleModel:
    """Circuit-level fault model of a declarative schedule."""

    n: int
    n_phases: int
    F: np.ndarray           # [n_dets, nv] merged fault Tanner graph
    priors: np.ndarray      # [nv]
    obs: np.ndarray         # [n_obs, nv]
    fault_sigs: list        # per raw component: (dets tuple, obs int, meta)
    plan: "_Plan"
    meta: dict = field(default_factory=dict)


@dataclass(frozen=True)
class _Plan:
    """Static sampling/enumeration plan shared by model and sampler."""

    n: int
    nq: int
    n_ph: int
    rz: tuple[int, ...]
    rz_max: int
    rx_max: int
    rounds: tuple[int, ...]
    starts: tuple[int, ...]
    ops: tuple            # per phase: op tuple list
    arrays: tuple         # per phase: (ops, q0, q1) numpy gate arrays
    flags: tuple          # per phase: first-fan-out CNOT marks [n_ops]
    # transitions INTO phase ph (ph >= 1):
    ro_at: tuple          # per phase: tuple of (qubit, ridx)
    gone_at: tuple        # per phase: tuple of qubits cleared
    init_scored_at: tuple  # per phase (incl. 0): scored-basis inits
    init_conj_at: tuple    # per phase (incl. 0): conjugate inits
    n_meas: int
    n_read: int
    D: np.ndarray          # [n_dets, n_out] recipe detector map
    obs_D: np.ndarray      # [n_obs, n_out] recipe observable map


def build_circuit_schedule(n: int, phases: list[P.Phase],
                           active: np.ndarray,
                           observables: list[list[tuple]],
                           conj_checks: list[np.ndarray],
                           readouts: tuple[P.Readout, ...] = (),
                           conjugate_init: tuple[P.Readout, ...] = (),
                           *, noise: noise_mod.NoiseModel,
                           drop_obs: tuple[int, ...] = ()
                           ) -> CircuitScheduleModel:
    """Assemble the circuit-level fault Tanner graph of a declarative
    schedule. Inputs are `patches.build_schedule`'s, plus `conj_checks`:
    the conjugate sector's check matrices per phase (the real patches'
    X stabilizers — the hook-fault source a scored-sector-only circuit
    cannot model).

    `drop_obs` excludes observable rows from circuit-level scoring.
    Needed for PROJECTION-RANDOM standalone joints (the compiled T
    gadget's m1, `obs_expected is None`): their raw deviation is
    GAUGE-DEPENDENT — an X-frame that stabilizes a fresh |+̄⟩ patch at
    birth (e.g. a hook landing pre-collect in the projection round) is
    physically the identity yet relabels the m1 coin, so no
    outcome-space row can score that channel at circuit level in a
    single-sector model (the undetectable-logical guard rejects the
    attempt). Gauge-INVARIANT rows — final logicals, mzz combinations
    (both joints relabel consistently), cnot m1 composed with its
    readout terms — score fine. The m1 channel's circuit-level physics
    lives in the two-sector bespoke tier (`experiments.surgery_t`)."""
    if noise.p_idle:
        raise ValueError("circuit-level schedules charge no idle "
                         "locations (see NoiseModel.p_idle docs)")
    n_ph = len(phases)
    active = np.asarray(active, dtype=np.uint8)
    if len(conj_checks) != n_ph:
        raise ValueError("need one conjugate check matrix per phase")
    for ph in range(n_ph):
        if (conj_checks[ph] & (1 - active[ph])[None, :]).any():
            raise AssertionError(
                f"phase {ph} conjugate checks touch inactive qubits")

    base = P.build_schedule(n, phases, active, observables,
                            readouts=readouts,
                            conjugate_init=conjugate_init,
                            with_recipe=True)
    rec = base.meta["recipe"]
    if rec.get("has_anchored"):
        raise ValueError(
            "circuit-level schedules cannot consume logical_at terms: "
            "the recipe's anchored rows fall back to the final readout, "
            "which mis-places circuit faults that occur after the anchor")
    D, obs_D = rec["D"], rec["obs"]
    if drop_obs:
        keep_obs = [i for i in range(obs_D.shape[0]) if i not in drop_obs]
        obs_D = obs_D[keep_obs]
    else:
        keep_obs = list(range(obs_D.shape[0]))
    meas_order, read_order = rec["meas_order"], rec["read_order"]
    n_meas, n_read = rec["n_meas"], rec["n_read"]
    n_out = n_meas + n_read + n
    out_idx = {mtc: i for i, mtc in enumerate(meas_order)}
    read_idx = {pq: i for i, pq in enumerate(read_order)}

    rz = [Ph.checks.shape[0] for Ph in phases]
    rx = [h.shape[0] for h in conj_checks]
    rz_max, rx_max = max(rz), max(rx)
    nq = n + rz_max + rx_max
    starts = np.concatenate([[0], np.cumsum([Ph.rounds for Ph in phases])])

    conj_init_at: dict[int, set[int]] = {}
    for ci in conjugate_init:
        conj_init_at.setdefault(ci.phase, set()).update(ci.qubits)

    # per-qubit activity intervals — same derivation as build_schedule
    # (recomputed rather than refactored: the phenomenological builder
    # is bit-identity-pinned against the bespoke models, see CLAUDE.md)
    intervals: list[list[tuple]] = [[] for _ in range(n)]
    for qb in range(n):
        ph = 0
        while ph < n_ph:
            if not active[ph, qb]:
                ph += 1
                continue
            ph_a = ph
            while ph + 1 < n_ph and active[ph + 1, qb]:
                ph += 1
            ph_b = ph
            ridx = read_idx.get((ph_b + 1, qb))
            intervals[qb].append((ph_a, ph_b, ridx, ph_b == n_ph - 1))
            ph += 1

    def interval_of(qb: int, ph: int):
        for iv in intervals[qb]:
            if iv[0] <= ph <= iv[1]:
                return iv
        raise AssertionError(f"fault on inactive qubit {qb} at phase {ph}")

    # residual future map: X residual on data qubit qb at the END of
    # round (ph0, t0) -> raw-outcome deviation vector (later same-phase
    # rounds, later phases while active, readout bit, final word bit)
    fut_cache: dict[tuple[int, int, int], np.ndarray] = {}

    def future_vec(qb: int, ph0: int, t0: int) -> np.ndarray:
        key = (qb, ph0, t0)
        v = fut_cache.get(key)
        if v is not None:
            return v
        v = np.zeros(n_out, np.uint8)
        _, ph_b, ridx, fin = interval_of(qb, ph0)
        col = np.nonzero(phases[ph0].checks[:, qb])[0]
        for t in range(int(starts[ph0]) + t0 + 1, int(starts[ph0 + 1])):
            for c in col:
                v[out_idx[(ph0, t, int(c))]] ^= 1
        for ph in range(ph0 + 1, ph_b + 1):
            col = np.nonzero(phases[ph].checks[:, qb])[0]
            for t in range(int(starts[ph]), int(starts[ph + 1])):
                for c in col:
                    v[out_idx[(ph, t, int(c))]] ^= 1
        if ridx is not None:
            v[n_meas + ridx] ^= 1
        if fin:
            v[n_meas + n_read + qb] ^= 1
        fut_cache[key] = v
        return v

    # -- enumerate per-phase circuit components ------------------------------
    all_ops, all_arrays, all_flags = [], [], []
    for ph in range(n_ph):
        ops, arrays, flags = round_ops(phases[ph].checks, conj_checks[ph],
                                       n, rz_max)
        all_ops.append(tuple(ops))
        all_arrays.append(arrays)
        all_flags.append(flags)

    if noise.pauli2 is not None:
        raise ValueError("circuit-level schedules assume uniform 2q "
                         "depolarizing (the exclusive-class and "
                         "first-fan-out reductions are depolarizing "
                         "identities)")
    p2 = noise.p_gate2

    def phase_components(ph: int):
        """(own flips over scored checks, residual x over data, prob,
        meta) per component of one round of phase ph."""
        ops = all_ops[ph]
        out = []

        def add(start, wires, prob, meta):
            x0 = np.zeros(nq, np.uint8)
            x0[list(wires)] = 1
            x, _ = _walk(ops, nq, start, x0)
            out.append((np.nonzero(x[n: n + rz[ph]])[0],
                        x[:n].copy(), prob, meta))

        flags = all_flags[ph]
        for k, op in enumerate(ops):
            if op[0] == "cnot" and p2:
                a, b = op[1], op[2]
                if flags[k]:
                    # first fan-out CNOT: channel reduced modulo the
                    # X_anc·X_tgt pair stabilizer (see round_ops)
                    add(k, [b], 8 * p2 / 15, ("2qf", ph, k))
                    continue
                # exclusive X-support classes of 2q depolarizing
                add(k, [a], 4 * p2 / 15, ("2q", ph, k, "c"))
                add(k, [b], 4 * p2 / 15, ("2q", ph, k, "t"))
                add(k, [a, b], 4 * p2 / 15, ("2q", ph, k, "ct"))
        if noise.p_meas:
            for c in range(rz[ph]):
                out.append((np.asarray([c]), np.zeros(n, np.uint8),
                            noise.p_meas, ("meas", ph, c)))
        return out

    comps = [phase_components(ph) for ph in range(n_ph)]

    # -- place components into raw-outcome space -----------------------------
    # chunked: the raw placement count scales as (phases x rounds x
    # circuit locations) — d=5 compiled programs reach ~10^5 columns,
    # so F_raw is computed per chunk and merged incrementally instead
    # of materializing the full [n_out, nf] incidence
    cols: list[np.ndarray] = []
    metas: list[tuple] = []
    probs: list[float] = []
    merged: dict[tuple, float] = {}
    fault_sigs: list[tuple] = []
    _CHUNK = 16384

    def flush():
        if not cols:
            return
        O = np.stack(cols, axis=1)
        # GF(2) matmuls in float32 (exact: row sums << 2^24)
        f_raw = (D.astype(np.float32)
                 @ O.astype(np.float32)).astype(np.int64) & 1
        o_raw = (obs_D.astype(np.float32)
                 @ O.astype(np.float32)).astype(np.int64) & 1
        for f in range(O.shape[1]):
            dets = tuple(np.nonzero(f_raw[:, f])[0])
            ob = 0
            for i in range(o_raw.shape[0]):
                ob |= int(o_raw[i, f]) << i
            fault_sigs.append((dets, ob, metas[f]))
            if not dets:
                if ob:
                    raise AssertionError(
                        f"undetectable logical circuit fault {metas[f]}")
                continue
            key = (dets, ob)
            old = merged.get(key, 0.0)
            merged[key] = old * (1 - probs[f]) + probs[f] * (1 - old)
        cols.clear()
        metas.clear()
        probs.clear()

    def place(vec, prob, meta):
        cols.append(vec)
        probs.append(prob)
        metas.append(meta)
        if len(cols) >= _CHUNK:
            flush()

    for ph in range(n_ph):
        t_lo, t_hi = int(starts[ph]), int(starts[ph + 1])
        for t in range(t_lo, t_hi):
            for flips, resid, prob, meta in comps[ph]:
                vec = np.zeros(n_out, np.uint8)
                for c in flips:
                    vec[out_idx[(ph, t, int(c))]] ^= 1
                for qb in np.nonzero(resid)[0]:
                    vec ^= future_vec(int(qb), ph, t - t_lo)
                place(vec, prob, meta + (t,))
            if noise.p_reset:
                # scored-ancilla reset X: flips whatever check the SAME
                # slot measures next round (possibly next phase); slots
                # past the next phase's check count are noiselessly
                # cleared before they are ever measured (see sampler)
                for c in range(rz[ph]):
                    if t + 1 < t_hi:
                        tgt = (ph, t + 1, c)
                    elif ph + 1 < n_ph and c < rz[ph + 1]:
                        tgt = (ph + 1, t + 1, c)
                    else:
                        continue
                    vec = np.zeros(n_out, np.uint8)
                    vec[out_idx[tgt]] ^= 1
                    place(vec, noise.p_reset, ("reset", ph, c, t))

    if noise.p_reset:
        # data init errors: X at scored-basis activation (|0⟩ prep),
        # walked through the activation round. Conjugate inits are
        # exempt — X on a fresh |+⟩ is the identity (the projection
        # coin is untossed; see patches.build_schedule's fault rules).
        for ph in range(n_ph):
            prev = active[ph - 1] if ph else np.zeros(n, np.uint8)
            newly = np.nonzero(active[ph] & (1 - prev))[0]
            cset = conj_init_at.get(ph, set())
            for qb in newly:
                if int(qb) in cset:
                    continue
                x0 = np.zeros(nq, np.uint8)
                x0[int(qb)] = 1
                x, _ = _walk(all_ops[ph], nq, -1, x0)
                vec = np.zeros(n_out, np.uint8)
                t0 = int(starts[ph])
                for c in np.nonzero(x[n: n + rz[ph]])[0]:
                    vec[out_idx[(ph, t0, int(c))]] ^= 1
                for q2 in np.nonzero(x[:n])[0]:
                    vec ^= future_vec(int(q2), ph, 0)
                place(vec, noise.p_reset, ("init", ph, int(qb)))

    if noise.p_meas:
        for (ph, qb), ridx in read_idx.items():
            vec = np.zeros(n_out, np.uint8)
            vec[n_meas + ridx] ^= 1
            place(vec, noise.p_meas, ("read", ph, qb))

    flush()
    if not merged:
        raise ValueError("noise model books no circuit fault locations "
                         "(all rates zero?) — nothing to decode")

    n_det = D.shape[0]
    nv = len(merged)
    F = np.zeros((n_det, nv), np.uint8)
    priors = np.empty(nv, np.float64)
    n_obs = obs_D.shape[0]
    obs = np.zeros((n_obs, nv), np.uint8)
    for v, ((dets, ob), prob) in enumerate(sorted(merged.items())):
        F[list(dets), v] = 1
        priors[v] = prob
        for i in range(n_obs):
            obs[i, v] = (ob >> i) & 1

    ro_at, gone_at, init_s_at, init_c_at = [], [], [], []
    for ph in range(n_ph):
        prev = active[ph - 1] if ph else np.zeros(n, np.uint8)
        ro = tuple((int(qb), read_idx[(ph, int(qb))])
                   for qb in range(n) if (ph, qb) in read_idx)
        gone = tuple(int(qb)
                     for qb in np.nonzero(prev & (1 - active[ph]))[0])
        newly = np.nonzero(active[ph] & (1 - prev))[0]
        cset = conj_init_at.get(ph, set())
        init_s_at.append(tuple(int(qb) for qb in newly
                               if int(qb) not in cset))
        init_c_at.append(tuple(int(qb) for qb in newly
                               if int(qb) in cset))
        ro_at.append(ro)
        gone_at.append(gone)

    plan = _Plan(
        n=n, nq=nq, n_ph=n_ph, rz=tuple(rz), rz_max=rz_max, rx_max=rx_max,
        rounds=tuple(Ph.rounds for Ph in phases),
        starts=tuple(int(s) for s in starts),
        ops=tuple(all_ops), arrays=tuple(all_arrays),
        flags=tuple(all_flags),
        ro_at=tuple(ro_at), gone_at=tuple(gone_at),
        init_scored_at=tuple(init_s_at), init_conj_at=tuple(init_c_at),
        n_meas=n_meas, n_read=n_read, D=D, obs_D=obs_D)
    meta = dict(base.meta)
    meta.pop("recipe", None)
    meta["n_fault_vars"] = nv
    meta["kept_obs"] = keep_obs
    return CircuitScheduleModel(
        n=n, n_phases=n_ph, F=F, priors=priors, obs=obs,
        fault_sigs=fault_sigs, plan=plan, meta=meta)


# -- the frame sampler --------------------------------------------------------


def _run_round_noisy(f, ops_a, q0_a, q1_a, flags_a, noise, key):
    """One round's gates with per-gate 2q depolarizing — the
    `fr.run_arrays_noisy` channel, except that gates flagged as an
    X-check's FIRST fan-out CNOT get the stabilizer-reduced channel
    (X on the target at 8p/15; see `round_ops`). These circuits are
    CNOT-only, so no 1q locations exist."""
    if not noise.p_gate2:
        return fr.propagate_arrays(f, ops_a, q0_a, q1_a)
    p_first = jnp.float32(8 * noise.p_gate2 / 15)
    keys = jax.random.split(key, max(int(ops_a.shape[0]), 1))

    def body(carry, xs):
        op, a, b, fl, k = xs
        carry = jax.lax.switch(op, fr._FRAME_BRANCHES, carry, a, b)

        def flagged(s):
            hit = jax.random.bernoulli(
                k, p_first, (s.batch,)).astype(jnp.uint8)
            return fr.Frames(s.x.at[:, b].set(s.x[:, b] ^ hit), s.z)

        def generic(s):
            return fr._inject2(s, a, b, noise.rate2, k)

        return jax.lax.cond(fl == 1, flagged, generic, carry), None

    f, _ = jax.lax.scan(body, f, (ops_a, q0_a, q1_a, flags_a, keys))
    return f


def _sample_plan(key, batch: int, plan: _Plan,
                 noise: noise_mod.NoiseModel):
    """Frame-sample `batch` runs of the schedule's circuits; returns the
    raw outcome deviations [B, n_out] in recipe order."""
    n, nq = plan.n, plan.nq
    f = fr.zero_frames(batch, nq)
    outs_all = []
    read_bits: list = [None] * plan.n_read
    k_ph = jax.random.split(key, plan.n_ph + 1)

    for ph in range(plan.n_ph):
        k_tr1, k_tr2, k_rounds = jax.random.split(k_ph[ph], 3)
        if ph > 0 and plan.ro_at[ph]:
            q_ro = jnp.asarray([qb for qb, _ in plan.ro_at[ph]], jnp.int32)
            f, bits = fr.measure_deviations(f, q_ro, k_tr1, noise.p_meas)
            for i, (_, ridx) in enumerate(plan.ro_at[ph]):
                read_bits[ridx] = bits[:, i]
        if ph > 0 and plan.gone_at[ph]:
            f = fr.reset_qubits(
                f, jnp.asarray(plan.gone_at[ph], jnp.int32))
        if plan.init_scored_at[ph]:
            f = fr.reset_qubits(
                f, jnp.asarray(plan.init_scored_at[ph], jnp.int32),
                k_tr2, noise.p_reset)
        if plan.init_conj_at[ph]:
            f = fr.reset_qubits(
                f, jnp.asarray(plan.init_conj_at[ph], jnp.int32))

        ops_a, q0_a, q1_a = (jnp.asarray(a) for a in plan.arrays[ph])
        flags_a = jnp.asarray(plan.flags[ph])
        anc_z = jnp.arange(n, n + plan.rz[ph], dtype=jnp.int32)
        anc_rest = jnp.arange(n + plan.rz[ph], nq, dtype=jnp.int32)

        def round_body(carry, k, ops_a=ops_a, q0_a=q0_a, q1_a=q1_a,
                       flags_a=flags_a, anc_z=anc_z, anc_rest=anc_rest):
            fc = carry
            ka, kb, kc = jax.random.split(k, 3)
            fc = _run_round_noisy(fc, ops_a, q0_a, q1_a, flags_a,
                                  noise, ka)
            fc, outs = fr.measure_deviations(fc, anc_z, kb, noise.p_meas)
            fc = fr.reset_qubits(fc, anc_z, kc, noise.p_reset)
            # conjugate + unused scored slots clear noiselessly: a reset
            # X on a conjugate ancilla provably cannot touch any scored
            # outcome, and unused slots must not carry stale frames
            fc = fr.reset_qubits(fc, anc_rest)
            return fc, outs

        f, outs = jax.lax.scan(round_body, f,
                               jax.random.split(k_rounds, plan.rounds[ph]))
        outs_all.append(outs.transpose(1, 0, 2).reshape(batch, -1))

    final = f.x[:, :n]
    parts = outs_all
    if plan.n_read:
        parts.append(jnp.stack(read_bits, axis=1))
    parts.append(final)
    return jnp.concatenate(parts, axis=1)


def sample_circuit_schedule(model: CircuitScheduleModel,
                            noise: noise_mod.NoiseModel, *,
                            batch: int, seed: int = 0):
    """Sample the schedule's circuits; returns (detectors [B, n_dets],
    observable deviations [B, n_obs]) as numpy uint8."""
    plan = model.plan
    fn = jax.jit(partial(_sample_plan, batch=batch, plan=plan,
                         noise=noise))
    raw = fn(jax.random.key(seed))
    d_t = jnp.asarray(plan.D.T.astype(np.int32))
    o_t = jnp.asarray(plan.obs_D.T.astype(np.int32))
    raw32 = raw.astype(jnp.int32)
    dets = (raw32 @ d_t) & 1
    obs = (raw32 @ o_t) & 1
    return (np.asarray(dets, np.uint8), np.asarray(obs, np.uint8))


def circuit_decoded_obs(model: CircuitScheduleModel,
                        noise: noise_mod.NoiseModel, *,
                        batch: int = 1 << 12, seed: int = 0,
                        iters: int = 48, alpha: float = 0.8,
                        osd: bool = True) -> np.ndarray:
    """Sample + decode; return the per-shot DECODED observable
    deviations [B, n_obs] uint8 (sampled deviation XOR decoder flip) —
    the circuit-tier mirror of `patches.schedule_decoded_obs`, feeding
    higher-level consumers (the two-level concatenated memory)."""
    from qcss_tpu.decode.bp import BPDecoder

    dets, obs_dev = sample_circuit_schedule(model, noise, batch=batch,
                                            seed=seed)
    dec = BPDecoder(model.F, np.clip(model.priors, 1e-12, 0.499),
                    logicals=model.obs, iters=iters, alpha=alpha,
                    osd=osd)
    flips, _ = dec.decode_obs(dets)
    return obs_dev ^ flips.astype(np.uint8)


def circuit_schedule_memory(model: CircuitScheduleModel,
                            noise: noise_mod.NoiseModel, *,
                            batch: int = 1 << 12, seed: int = 0,
                            iters: int = 48, alpha: float = 0.8,
                            osd: bool = True) -> dict:
    """Run the circuit-level schedule end to end: frame-sampled
    extraction circuits, recipe detector assembly, BP(+OSD) decode on
    the circuit fault Tanner graph; per-observable failure rates."""
    from qcss_tpu.decode.bp import BPDecoder

    dets, obs_dev = sample_circuit_schedule(model, noise, batch=batch,
                                            seed=seed)
    dec = BPDecoder(model.F, np.clip(model.priors, 1e-12, 0.499),
                    logicals=model.obs, iters=iters, alpha=alpha,
                    osd=osd)
    flips, conv = dec.decode_obs(dets)
    fail = (obs_dev ^ flips.astype(np.uint8)) == 1
    out = {
        "word_fail": float(fail.any(axis=1).mean()),
        "bp_converged": float(np.asarray(conv).mean()),
        "samples": batch,
        "detectors": int(model.F.shape[0]),
        "fault_vars": int(model.F.shape[1]),
    }
    for i in range(model.obs.shape[0]):
        out[f"obs{i}_fail"] = float(fail[:, i].mean())
    return out
