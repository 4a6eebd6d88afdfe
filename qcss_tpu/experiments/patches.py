"""Declarative multi-patch surgery schedules — the generic layer under
the bespoke lattice-surgery experiments.

`experiments.surgery` and `experiments.surgery_t` each hand-assemble one
fault model: phase check sets, qubit activation windows, partner-matched
transition detectors, seam-readout closures, GF(2)-solved joint-
measurement combinations. This module is that machinery ONCE, as a
declarative builder: a `PatchSchedule` lists the phases (check matrix +
rounds), per-phase qubit activity, scored-basis readout events, and the
observables (final logicals, joint measurements, readout bits, XOR
combos) — `build_schedule` mechanizes the rest by single-fault
propagation, exactly the construction the bespoke builders use
(validated by bit-identity: tests/test_patches.py re-derives the
merge-split cycle, the surgery CNOT and both T-gadget sectors through
this builder and asserts F/obs/graph equal the bespoke outputs
column-for-column).

What the declarative form buys is COMPOSITION: schedules that no
bespoke builder exists for — sequential joint measurements sharing a
patch, seam reuse, logical-level parity-check networks — assemble in a
few lines and inherit every build-time guard (weight ≤ 2 per fault,
signature-sharing observable consistency, no undetectable logical
fault). `parity_chain_model` below measures Z̄ᵢZ̄ᵢ₊₁ down a column of
patches — the logical-level repetition-code syndrome network, i.e.
surgery as the EC layer OF logical qubits — and is tableau-gold-tested
for every input in tests/test_patches.py.

Semantics notes (the physics the asserts enforce, learned building the
bespoke models — see surgery.build_surgery_cnot and surgery_t
docstrings):
  * a transition detector exists for every new-phase check whose
    restriction to the persistently-active qubits equals exactly one
    previous-phase check (partner matching); genuinely new checks get
    none (projection randomness);
  * when qubits are measured out in the SCORED basis at a split, their
    readout bits are fault locations of their own and close the
    extended partner transitions;
  * `mode='even'` joint combinations solve the UNMASKED check system,
    so they have even support on every seam qubit — deterministic for
    ANY seam initialization; `mode='masked'` solves off-seam and is
    valid only when the seam init basis matches the measured product.

The reference has no multi-patch machinery of any kind (its scope is a
single code block; reference: ftqc.py:42-120).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from qcss_tpu.codes import families
from qcss_tpu.decode.uf import MatchingGraph, UFDecoder
from qcss_tpu.experiments.surgery import (
    _graph_from_signatures,
    _sample,
    _solve_gf2,
)


@dataclass(frozen=True)
class Phase:
    """One schedule phase: `rounds` extraction rounds of `checks`.

    `checks` is the [r, n] GF(2) incidence of the SCORED sector's
    stabilizers active during the phase (Z checks for an X-error model
    and vice versa)."""

    checks: np.ndarray
    rounds: int


@dataclass(frozen=True)
class Readout:
    """Qubits measured out in the scored basis at the transition INTO
    `phase` (a split). Their readout bits are fault locations and close
    the extended-check transition detectors; order fixes bit order."""

    phase: int
    qubits: tuple[int, ...]


@dataclass(frozen=True)
class ScheduleModel:
    """Assembled fault model: F/obs linear maps + the matching graph."""

    n: int
    n_phases: int
    fault_probs_class: np.ndarray  # [nf] 0 = data (rate p), 1 = meas/read (q)
    F: np.ndarray                  # [n_dets, nf]
    obs: np.ndarray                # [n_obs, nf]
    graph: MatchingGraph
    meta: dict = field(default_factory=dict)


def logical(support: np.ndarray) -> tuple:
    """Observable term: the final transversal readout of `support`."""
    return ("logical", np.asarray(support, dtype=np.uint8))


def joint(phase: int, target: np.ndarray, mode: str = "even") -> tuple:
    """Observable term: the joint measurement a merge performs — the
    GF(2)-solved combination of the new phase's first-round and the
    previous phase's last-round outcomes whose product is `target`.

    mode='even' solves over the UNMASKED system (even seam support —
    deterministic for any seam init, immune to seam-init errors);
    mode='masked' solves the off-seam restriction (only valid when the
    seam initializes in the measured product's basis)."""
    if mode not in ("even", "masked"):
        raise ValueError("joint mode must be 'even' or 'masked'")
    return ("joint", phase, np.asarray(target, dtype=np.uint8), mode)


def readout_bit(phase: int, qubit: int) -> tuple:
    """Observable term: one scored-basis readout bit of a split."""
    return ("readout", phase, qubit)


def build_schedule(n: int, phases: list[Phase], active: np.ndarray,
                   observables: list[list[tuple]],
                   readouts: tuple[Readout, ...] = (),
                   p: float | None = None,
                   q: float | None = None) -> ScheduleModel:
    """Mechanize a patch schedule into its single-fault model.

    `active` is [n_phases, n]: which qubits participate in each phase.
    Every fault — one scored-sector error per active qubit per time slot
    (slot t errors precede round t's measurements; init and pre-readout
    boundary slots included), one flip per check measurement, one per
    readout bit — is propagated through the outcome linear model into
    detector/observable incidences, exactly the construction the bespoke
    surgery builders use. Build-time guards: every fault must flip ≤ 2
    detectors, signature-sharing faults must agree on observables, and
    no undetectable fault may touch an observable.
    """
    n_ph = len(phases)
    active = np.asarray(active, dtype=np.uint8)
    if active.shape != (n_ph, n):
        raise ValueError(f"active must be [{n_ph}, {n}]")
    for ph, P in enumerate(phases):
        if P.rounds < 1:
            raise ValueError("every phase needs >= 1 round")
        if P.checks.shape[1] != n:
            raise ValueError("check matrix width != n")
        if (P.checks & (1 - active[ph])[None, :]).any():
            raise AssertionError(
                f"phase {ph} has checks on inactive qubits")
    starts = np.concatenate([[0], np.cumsum([P.rounds for P in phases])])
    total = int(starts[-1])

    # readout index map ------------------------------------------------------
    read_idx: dict[tuple[int, int], int] = {}
    for ro in readouts:
        if not (1 <= ro.phase < n_ph):
            raise ValueError("readout phase out of range (the final "
                             "transversal readout is implicit)")
        for qb in ro.qubits:
            if active[ro.phase, qb]:
                raise AssertionError(
                    f"readout qubit {qb} still active in phase {ro.phase}")
            if not active[ro.phase - 1, qb]:
                raise AssertionError(
                    f"readout qubit {qb} not active before phase {ro.phase}")
            if (ro.phase, qb) in read_idx:
                raise ValueError("duplicate readout qubit")
            read_idx[(ro.phase, qb)] = len(read_idx)
    n_read = len(read_idx)

    # per-qubit activity intervals -------------------------------------------
    # each interval: (ph_a, ph_b, slot_end_exclusive, read_index | None,
    #                 reaches_final)
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
            reaches_final = ph_b == n_ph - 1
            ridx = read_idx.get((ph_b + 1, qb))
            end = int(starts[ph_b + 1])
            # boundary slot: before the perfect final readout, or before
            # a scored-basis readout (flips only the readout bit)
            if reaches_final or ridx is not None:
                end += 1
            intervals[qb].append((ph_a, ph_b, end, ridx, reaches_final))
            ph += 1

    # fault inventory (orderings match the bespoke builders) -----------------
    slot_int: dict[tuple[int, int], tuple] = {}
    for qb in range(n):
        for iv in intervals[qb]:
            for t in range(int(starts[iv[0]]), iv[2]):
                slot_int[(t, qb)] = iv
    data_faults = [(t, qb) for t in range(total + 1) for qb in range(n)
                   if (t, qb) in slot_int]
    meas_faults = [(ph, t, c) for ph in range(n_ph)
                   for t in range(int(starts[ph]), int(starts[ph + 1]))
                   for c in range(phases[ph].checks.shape[0])]
    n_data, n_meas = len(data_faults), len(meas_faults)
    nf = n_data + n_meas + n_read

    # outcome deviations ------------------------------------------------------
    o_ph = [np.zeros((P.rounds, P.checks.shape[0], nf), dtype=np.uint8)
            for P in phases]
    w_final = np.zeros((n, nf), dtype=np.uint8)
    sread = np.zeros((max(n_read, 1), nf), dtype=np.uint8)
    for f, (t0, qb) in enumerate(data_faults):
        ph_a, ph_b, _end, ridx, reaches_final = slot_int[(t0, qb)]
        if reaches_final:
            w_final[qb, f] = 1
        for ph in range(ph_a, ph_b + 1):
            col = phases[ph].checks[:, qb]
            for t in range(max(t0, int(starts[ph])), int(starts[ph + 1])):
                o_ph[ph][t - int(starts[ph]), :, f] ^= col
        if ridx is not None:
            sread[ridx, f] ^= 1
    for j, (ph, t, c) in enumerate(meas_faults):
        o_ph[ph][t - int(starts[ph]), c, n_data + j] ^= 1
    for (ph, qb), ridx in read_idx.items():
        sread[ridx, n_data + n_meas + ridx] ^= 1

    # partner matching per transition -----------------------------------------
    partners: list[np.ndarray] = [np.empty(0, np.int64)]
    for ph in range(1, n_ph):
        h_new, h_old = phases[ph].checks, phases[ph - 1].checks
        mask = (active[ph] & active[ph - 1]).astype(np.uint8)
        partner = np.full(h_new.shape[0], -1, dtype=np.int64)
        for i in range(h_new.shape[0]):
            restr = h_new[i] & mask
            if not restr.any():
                continue
            hits = np.nonzero(((h_old & mask[None, :]) ==
                               restr[None, :]).all(axis=1))[0]
            if hits.size > 1:
                raise AssertionError(
                    f"ambiguous check continuity at phase {ph}")
            if hits.size == 1:
                partner[i] = hits[0]
        partners.append(partner)

    # detectors ----------------------------------------------------------------
    det_rows = []
    for t in range(phases[0].rounds):
        det_rows.append(o_ph[0][t] ^ (o_ph[0][t - 1] if t else 0))
    for ph in range(1, n_ph):
        partner = partners[ph]
        matched = np.nonzero(partner >= 0)[0]
        tr = o_ph[ph][0].copy()
        tr[matched] ^= o_ph[ph - 1][-1, partner[matched]]
        # scored readouts of this transition close the extended checks
        deact = [(qb, ridx) for (ph_r, qb), ridx in read_idx.items()
                 if ph_r == ph]
        if deact:
            h_old = phases[ph - 1].checks
            for i in matched:
                for qb, ridx in deact:
                    if h_old[partner[i], qb]:
                        tr[i] ^= sread[ridx]
        det_rows.append(tr[matched])
        for t in range(1, phases[ph].rounds):
            det_rows.append(o_ph[ph][t] ^ o_ph[ph][t - 1])
    h_last = phases[-1].checks
    final = (h_last.astype(np.int64) @ w_final.astype(np.int64)) & 1
    det_rows.append((final ^ o_ph[-1][-1]).astype(np.uint8))
    F = np.concatenate(det_rows, axis=0) & 1

    # observables ---------------------------------------------------------------
    obs_rows = []
    for terms in observables:
        row = np.zeros(nf, dtype=np.uint8)
        for term in terms:
            kind = term[0]
            if kind == "logical":
                sup = term[1]
                if (sup & (1 - active[-1])).any():
                    raise AssertionError(
                        "final logical touches a qubit inactive at the end")
                row ^= (sup.astype(np.int64) @ w_final.astype(np.int64)
                        ).astype(np.uint8) & 1
            elif kind == "joint":
                _, ph, target, mode = term
                if not (1 <= ph < n_ph):
                    raise ValueError("joint phase out of range")
                h_m, h_s = phases[ph].checks, phases[ph - 1].checks
                if mode == "masked":
                    mask = active[ph - 1].astype(np.uint8)
                    system = np.concatenate(
                        [h_m * mask[None, :], h_s], axis=0)
                    tgt = (target & mask).astype(np.uint8)
                else:
                    system = np.concatenate([h_m, h_s], axis=0)
                    tgt = target.astype(np.uint8)
                u = _solve_gf2(system, tgt)
                if u is None:
                    raise AssertionError(
                        "joint target is not measured by this merge "
                        f"(phase {ph}, mode {mode})")
                u_m, u_s = u[: h_m.shape[0]], u[h_m.shape[0]:]
                row ^= ((u_m.astype(np.int64)
                         @ o_ph[ph][0].astype(np.int64))
                        ^ (u_s.astype(np.int64)
                           @ o_ph[ph - 1][-1].astype(np.int64))
                        ).astype(np.uint8) & 1
            elif kind == "readout":
                _, ph, qb = term
                if (ph, qb) not in read_idx:
                    raise ValueError(f"no scored readout of {qb} at {ph}")
                row ^= sread[read_idx[(ph, qb)]]
            else:
                raise ValueError(f"unknown observable term {kind!r}")
        obs_rows.append(row)
    obs = (np.stack(obs_rows) & 1).astype(np.uint8) if obs_rows else \
        np.zeros((0, nf), dtype=np.uint8)

    graph = _graph_from_signatures(F, obs, n_data, p, q)
    probs_class = np.concatenate([
        np.zeros(n_data, dtype=np.uint8),
        np.ones(nf - n_data, dtype=np.uint8)])
    return ScheduleModel(n=n, n_phases=n_ph, fault_probs_class=probs_class,
                         F=F, obs=obs, graph=graph,
                         meta={"total_rounds": total,
                               "n_detectors": int(F.shape[0])})


def schedule_memory(model: ScheduleModel, p: float, q: float | None = None,
                    *, batch: int = 1 << 13, seed: int = 0,
                    use_native: bool | None = None) -> dict:
    """Monte-Carlo a built schedule: device-sample the fault model,
    union-find decode, score every declared observable. Returns per-
    observable failure rates plus `word_fail` (any observable wrong)."""
    q = p if q is None else q
    dec = UFDecoder(model.graph, use_native=use_native)
    dets, ob = jax.jit(_sample, static_argnames=("batch",))(
        jax.random.key(seed), jnp.float32(p), jnp.float32(q), batch,
        jnp.asarray(model.fault_probs_class),
        jnp.asarray(model.F.T.astype(np.int32)),
        jnp.asarray(model.obs.T.astype(np.int32)))
    dets, ob = np.asarray(dets), np.asarray(ob)
    _, corr = dec.decode_batch(dets, want_corrections=False)
    fails = [(ob[:, i] ^ ((corr >> i) & 1)) == 1
             for i in range(model.obs.shape[0])]
    word = np.zeros(batch, dtype=bool)
    out = {"p": float(p), "q": float(q), "samples": batch,
           "detectors": int(model.F.shape[0]),
           "edges": int(model.graph.num_edges)}
    for i, fl in enumerate(fails):
        out[f"obs{i}_fail"] = float(fl.mean())
        word |= fl
    out["word_fail"] = float(word.mean())
    return out


# -- composed demo: the logical-level parity-check chain ---------------------


def parity_chain_model(d: int, n_patches: int = 3,
                       rounds: int | None = None,
                       p: float | None = None,
                       q: float | None = None) -> ScheduleModel:
    """Sequential lattice-surgery Z̄ᵢZ̄ᵢ₊₁ measurements down a column of
    `n_patches` surface patches — the syndrome-extraction network of a
    repetition code OVER LOGICAL QUBITS, i.e. surgery as the logical-
    level EC layer. No bespoke builder exists for this; it is pure
    composition on `build_schedule`.

    Layout: patch i occupies rows i*(d+1)..i*(d+1)+d-1 of a
    ((n_patches)*(d+1)-1) x d strip; seam row i*(d+1)+d separates
    patches i and i+1. The schedule alternates separate rounds with one
    ZZ merge per adjacent pair, in order. Observables: m_i (each joint
    Z̄ᵢZ̄ᵢ₊₁, solved seam-even so any seam init works) followed by the
    final Z̄ᵢ readouts. Z-check sector (X-error faults).
    """
    if n_patches < 2:
        raise ValueError("need >= 2 patches")
    R = d if rounds is None else rounds
    if R < 3:
        raise ValueError("merged phases need >= 3 rounds "
                         "(see surgery.build_xx_merge_split)")
    rows, cols = n_patches * (d + 1) - 1, d
    n = rows * cols
    seams = [[(i * (d + 1) + d) * cols + c for c in range(cols)]
             for i in range(n_patches - 1)]
    patch_mask = np.zeros(n, dtype=np.uint8)
    for i in range(n_patches):
        for r in range(d):
            r0 = i * (d + 1) + r
            patch_mask[r0 * cols: r0 * cols + d] = 1

    def embed(small: np.ndarray, row_off: int) -> np.ndarray:
        big = np.zeros((small.shape[0], n), dtype=np.uint8)
        sm = small.reshape(-1, d, d)
        for r in range(d):
            big[:, (r + row_off) * cols: (r + row_off) * cols + d] = \
                sm[:, r, :]
        return big

    _, hz_p = families.surface_rect_checks(d, d)
    hz_patches = [embed(hz_p, i * (d + 1)) for i in range(n_patches)]
    hz_sep = np.concatenate(hz_patches, axis=0)
    _, hz_pair = families.surface_rect_checks(2 * d + 1, d)

    def merged_checks(i: int) -> np.ndarray:
        big = np.zeros((hz_pair.shape[0], n), dtype=np.uint8)
        sm = hz_pair.reshape(-1, 2 * d + 1, d)
        r0 = i * (d + 1)
        for r in range(2 * d + 1):
            big[:, (r + r0) * cols: (r + r0) * cols + d] = sm[:, r, :]
        others = [hz_patches[j] for j in range(n_patches)
                  if j not in (i, i + 1)]
        return np.concatenate([big] + others, axis=0)

    phases = [Phase(hz_sep, R)]
    act = [patch_mask.copy()]
    for i in range(n_patches - 1):
        m_act = patch_mask.copy()
        m_act[seams[i]] = 1
        phases.append(Phase(merged_checks(i), R))
        act.append(m_act)
        phases.append(Phase(hz_sep, R))
        act.append(patch_mask.copy())
    active = np.stack(act)

    def zbar(i: int) -> np.ndarray:
        v = np.zeros(n, dtype=np.uint8)
        r0 = i * (d + 1)
        v[r0 * cols: r0 * cols + d] = 1
        return v

    observables = [
        [joint(1 + 2 * i, (zbar(i) ^ zbar(i + 1)).astype(np.uint8),
               mode="even")]
        for i in range(n_patches - 1)
    ] + [[logical(zbar(i))] for i in range(n_patches)]
    return build_schedule(n, phases, active, observables, p=p, q=q)


def parity_chain_memory(d: int, p: float, q: float | None = None, *,
                        n_patches: int = 3, rounds: int | None = None,
                        batch: int = 1 << 13, seed: int = 0,
                        weighted: bool = False,
                        use_native: bool | None = None) -> dict:
    """Monte-Carlo the logical parity-check chain: failure rates of each
    joint measurement m_i = Z̄ᵢZ̄ᵢ₊₁ and each final Z̄ᵢ."""
    q = p if q is None else q
    kw = dict(p=p, q=q) if weighted else dict(p=None, q=None)
    model = parity_chain_model(d, n_patches, rounds, **kw)
    out = schedule_memory(model, p, q, batch=batch, seed=seed,
                          use_native=use_native)
    out.update({"d": d, "n_patches": n_patches,
                "rounds": d if rounds is None else rounds})
    for i in range(n_patches - 1):
        out[f"m{i}_fail"] = out.pop(f"obs{i}_fail")
    for i in range(n_patches):
        out[f"z{i}_fail"] = out.pop(f"obs{n_patches - 1 + i}_fail")
    return out
