"""Pallas (Mosaic TPU) fixpoint kernels for the stencil union-find.

The XLA stencil kernel in `device_uf.py` is HBM-bound: every propagation
iteration streams the full [B, V] state through HBM, and at surface
d=11 R=11 the batch-max fixpoint depth is ~220 propagation + ~170
activity iterations — measured 270 ms for B=4096 whichever way the
per-iteration arithmetic is expressed (gathers, shifts, batch tiles via
`lax.map`: XLA will not keep the multi-MB loop carry VMEM-resident).

This module moves ONLY the two per-growth-round fixpoints into Pallas
kernels whose state lives in VMEM for the whole loop: a [T, V] batch
tile of packed labels costs ~3 us per iteration on a v5e instead of the
~800 us HBM pass, and the grid's tiles converge at their OWN pace (the
tail shot gates a 256-shot tile, not the whole batch). The per-round
orchestration (delta-stepped growth, the cluster-parity scatter, activity
seeding) stays in XLA where scatters are legal; per round the state
crosses HBM once, which is the irreducible traffic.

Mosaic rules honored (learned in sim/pallas_measure.py, see CLAUDE.md):
no dynamic_slice — the hub column is updated via a broadcasted-iota
column mask; no gathers — neighbor access is static slice+concat shifts
(the StencilGraph contract); reductions avoid unsigned ints.
"""

from __future__ import annotations

from functools import reduce

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = np.int32(2**30)


def _vid_row(V):
    return jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)


def _roll(x, shift):
    """Lane-axis roll that Mosaic can lower (bools via int32 bitcast —
    rolls of sub-32-bit types hit unsupported relayouts)."""
    if x.dtype == jnp.bool_:
        return _roll(x.astype(jnp.int32), shift) != 0
    return pltpu.roll(x, shift, len(x.shape) - 1)


def _shift_dn(x, d, fill):
    """y[..., v] = x[..., v+d]. Mosaic cannot lower unaligned
    concat-shifts ("result/input offset mismatch on non-concat
    dimension"), so in-kernel shifts are pltpu.roll + an iota mask over
    the wrapped region. KERNEL-ONLY — XLA-level callers use
    `_shift_dn_x`."""
    V = x.shape[-1]
    keep = _vid_row(V) < (V - d)
    return jnp.where(keep, _roll(x, V - d), fill)


def _shift_up(x, d, fill):
    """y[..., v+d] = x[..., v]. KERNEL-ONLY (see `_shift_dn`)."""
    V = x.shape[-1]
    keep = _vid_row(V) >= d
    return jnp.where(keep, _roll(x, d), fill)


def _shift_dn_x(x, d, fill):
    """Concat-based shift for XLA-level (non-kernel) code."""
    pad = jnp.full(x.shape[:-1] + (d,), fill, x.dtype)
    return jnp.concatenate([x[..., d:], pad], axis=-1)


def make_prop_kernel(st, L, bn, V, T, interpret=False):
    """pallas propagate-to-fixpoint: (packed [B,V] i32, satm [B,O,V] bool,
    satb [B,KB,V] bool) -> packed' [B,V] i32. The static edge-label
    tables travel as (grid-invariant) kernel inputs — Mosaic rejects
    captured array constants."""
    deltas = st.deltas
    KB = st.bmask.shape[0]
    O = len(deltas)
    BIG = 2**30

    def kernel(packed_ref, satm_ref, satb_ref, eobs_ref, bobs_ref,
               out_ref):
        packed0 = packed_ref[:]
        satm = satm_ref[:]
        satb = satb_ref[:]
        eobs = eobs_ref[:]
        bobs = bobs_ref[:]
        hub_col = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1) == bn

        def body(state):
            packed, _ = state
            cands = []
            for o, d in enumerate(deltas):
                lab = eobs[o][None, :]
                offered = jnp.where(satm[:, o, :], packed ^ lab, BIG)
                cands.append(jnp.where(
                    satm[:, o, :], _shift_dn(packed, d, BIG) ^ lab, BIG))
                cands.append(_shift_up(offered, d, BIG))
            hub = jnp.where(hub_col, packed, 0)  # zero except hub column
            hub_val = jnp.sum(hub, axis=1, keepdims=True)  # [T, 1]
            for k in range(KB):
                labb = bobs[k][None, :]
                cands.append(jnp.where(satb[:, k, :], hub_val ^ labb, BIG))
            cand = reduce(jnp.minimum, cands)
            adopted = (cand >> L) < (packed >> L)
            new = jnp.where(adopted, cand, packed)
            hub_cand = reduce(jnp.minimum, [
                jnp.min(jnp.where(satb[:, k, :], packed ^ bobs[k][None, :],
                                  BIG), axis=1, keepdims=True)
                for k in range(KB)
            ])
            adopted_b = (hub_cand >> L) < (hub_val >> L)
            new = jnp.where(hub_col & adopted_b,
                            jnp.broadcast_to(hub_cand, new.shape), new)
            changed = jnp.any(adopted) | jnp.any(adopted_b)
            return new, changed

        packed, _ = jax.lax.while_loop(
            lambda s: s[1], body, (packed0, jnp.bool_(True)))
        out_ref[:] = packed

    eobs_in = jnp.asarray(np.asarray(st.eobs, np.int32))
    bobs_in = jnp.asarray(np.asarray(st.bobs, np.int32))

    def run(packed, satm, satb):
        B = packed.shape[0]
        grid = (B // T,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((T, V), lambda i: (i, 0)),
                pl.BlockSpec((T, O, V), lambda i: (i, 0, 0)),
                pl.BlockSpec((T, KB, V), lambda i: (i, 0, 0)),
                pl.BlockSpec((O, V), lambda i: (0, 0)),
                pl.BlockSpec((KB, V), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((T, V), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, V), jnp.int32),
            interpret=interpret,
        )(packed, satm, satb, eobs_in, bobs_in)

    return run


def make_act_kernel(st, V, T, interpret=False):
    """pallas activity OR-fixpoint: (act [B,V] i32 0/1, passes [B,O,V]
    i32 0/1) -> act' [B,V] i32. int32 throughout — Mosaic cannot
    truncate i8-stored bools to vector masks. `passes[o]` marks
    saturated same-cluster edges."""
    deltas = st.deltas

    def kernel(act_ref, pass_ref, out_ref):
        act0 = act_ref[:]
        passes = pass_ref[:]

        def body(state):
            act, _ = state
            terms = [act]
            for o, d in enumerate(deltas):
                terms.append(_shift_dn(act, d, 0) & passes[:, o, :])
                terms.append(_shift_up(act & passes[:, o, :], d, 0))
            new = reduce(jnp.bitwise_or, terms)
            return new, jnp.any(new != act)

        act, _ = jax.lax.while_loop(
            lambda s: s[1], body, (act0, jnp.bool_(True)))
        out_ref[:] = act

    O = len(deltas)

    def run(act, passes):
        B = act.shape[0]
        grid = (B // T,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((T, V), lambda i: (i, 0)),
                pl.BlockSpec((T, O, V), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((T, V), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, V), jnp.int32),
            interpret=interpret,
        )(act, passes)

    return run


def make_round_kernel(st, L, bn, V, T, interpret=False):
    """One fused Mosaic kernel per GROWTH ROUND: activity spread
    (fixpoint from the XLA-computed parity seeds), delta-stepped edge
    growth, and label propagation to fixpoint — the whole round's state
    stays VMEM-resident per batch tile. Only the cluster-parity scatter
    (illegal in Mosaic) remains outside. Everything is 2-D [T, V] refs,
    one per stencil offset / boundary slot — 3-D refs in Mosaic hit
    relayout walls and the per-offset python loop is static anyway.

    run(packed, seed, sups, supbs) ->
        (packed', sups', supbs', grew [B,V] i32 indicator)."""
    deltas = st.deltas
    KB = st.bmask.shape[0]
    O = len(deltas)
    BIG = 2**30

    # numpy-first, THEN index: jnp indexing on closed-over arrays inside
    # a surrounding jit trace would produce tracers np.asarray rejects
    emask_np = np.asarray(st.emask, np.int32)
    ewt_np = np.asarray(st.ewt, np.int32)
    eobs_np = np.asarray(st.eobs, np.int32)
    bmask_np = np.asarray(st.bmask, np.int32)
    bwt_np = np.asarray(st.bwt, np.int32)
    bobs_np = np.asarray(st.bobs, np.int32)
    emask = [emask_np[o] for o in range(O)]
    ewt = [ewt_np[o] for o in range(O)]
    eobs = [eobs_np[o] for o in range(O)]
    bmask = [bmask_np[k] for k in range(KB)]
    bwt = [bwt_np[k] for k in range(KB)]
    bobs = [bobs_np[k] for k in range(KB)]

    def kernel(*refs):
        (packed_ref, seed_ref), rest = refs[:2], refs[2:]
        sup_refs, rest = rest[:O], rest[O:]
        supb_refs, rest = rest[:KB], rest[KB:]
        table_refs, outs = rest[:3 * O + 3 * KB], rest[3 * O + 3 * KB:]
        emask_t = [table_refs[o][:] for o in range(O)]
        ewt_t = [table_refs[O + o][:] for o in range(O)]
        eobs_t = [table_refs[2 * O + o][:] for o in range(O)]
        bmask_t = [table_refs[3 * O + k][:] for k in range(KB)]
        bwt_t = [table_refs[3 * O + KB + k][:] for k in range(KB)]
        bobs_t = [table_refs[3 * O + 2 * KB + k][:] for k in range(KB)]
        out_packed, outs = outs[0], outs[1:]
        out_sup, outs = outs[:O], outs[O:]
        out_supb, out_grew = outs[:KB], outs[KB]

        packed = packed_ref[:]
        seed = seed_ref[:]
        sup = [sup_refs[o][:] for o in range(O)]
        supb = [supb_refs[k][:] for k in range(KB)]
        comp = packed >> L
        hub_col = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1) == bn

        # 1. activity spread from the parity seeds (internal edges only,
        #    matching _decode_stencil's activity rule)
        nbr_eq = [comp == _shift_dn(comp, d, -1)
                  for o, d in enumerate(deltas)]
        passes = [((sup[o] >= ewt_t[o]) & (emask_t[o] == 1)
                   & nbr_eq[o]).astype(jnp.int32)
                  for o in range(O)]

        def act_body(state):
            act, _ = state
            terms = [act]
            for o, d in enumerate(deltas):
                terms.append(_shift_dn(act, d, 0) & passes[o])
                terms.append(_shift_up(act & passes[o], d, 0))
            new = reduce(jnp.bitwise_or, terms)
            return new, jnp.any(new != act)

        act, _ = jax.lax.while_loop(
            lambda s: s[1], act_body, (seed, jnp.bool_(True)))

        # 2. delta-stepped growth
        hub_comp = jnp.sum(jnp.where(hub_col, comp, 0), axis=1,
                           keepdims=True)
        inc = []
        for o, d in enumerate(deltas):
            growable = ((emask_t[o] == 1) & (sup[o] < ewt_t[o])
                        & ~nbr_eq[o])
            inc.append(jnp.where(growable, act + _shift_dn(act, d, 0), 0))
        incb = [jnp.where((bmask_t[k] == 1) & (supb[k] < bwt_t[k])
                          & (comp != hub_comp), act, 0)
                for k in range(KB)]
        slack_v = reduce(jnp.minimum,
                         [jnp.where(inc[o] > 0,
                                    -(-(ewt_t[o] - sup[o])
                                      // jnp.maximum(inc[o], 1)), BIG)
                          for o in range(O)]
                         + [jnp.where(incb[k] > 0,
                                      -(-(bwt_t[k] - supb[k])
                                        // jnp.maximum(incb[k], 1)), BIG)
                            for k in range(KB)])
        slack = jnp.min(slack_v, axis=1, keepdims=True)
        delta_g = jnp.maximum(slack, 1)
        delta_g = jnp.where(delta_g >= BIG, 1, delta_g)
        sup = [sup[o] + inc[o] * delta_g for o in range(O)]
        supb = [supb[k] + incb[k] * delta_g for k in range(KB)]
        grew = reduce(jnp.bitwise_or,
                      [(x > 0).astype(jnp.int32) for x in inc + incb])

        # 3. propagate labels to fixpoint over the saturated edges
        satm = [(sup[o] >= ewt_t[o]) & (emask_t[o] == 1)
                for o in range(O)]
        satb = [(supb[k] >= bwt_t[k]) & (bmask_t[k] == 1)
                for k in range(KB)]

        def prop_body(state):
            packed, _ = state
            cands = []
            for o, d in enumerate(deltas):
                offered = jnp.where(satm[o], packed ^ eobs_t[o], BIG)
                cands.append(jnp.where(
                    satm[o], _shift_dn(packed, d, BIG) ^ eobs_t[o], BIG))
                cands.append(_shift_up(offered, d, BIG))
            hub_val = jnp.sum(jnp.where(hub_col, packed, 0), axis=1,
                              keepdims=True)
            for k in range(KB):
                cands.append(jnp.where(satb[k], hub_val ^ bobs_t[k], BIG))
            cand = reduce(jnp.minimum, cands)
            adopted = (cand >> L) < (packed >> L)
            new = jnp.where(adopted, cand, packed)
            hub_cand = reduce(jnp.minimum, [
                jnp.min(jnp.where(satb[k], packed ^ bobs_t[k], BIG),
                        axis=1, keepdims=True)
                for k in range(KB)
            ])
            adopted_b = (hub_cand >> L) < (hub_val >> L)
            new = jnp.where(hub_col & adopted_b,
                            jnp.broadcast_to(hub_cand, new.shape), new)
            return new, jnp.any(adopted) | jnp.any(adopted_b)

        packed, _ = jax.lax.while_loop(
            lambda s: s[1], prop_body, (packed, jnp.bool_(True)))

        out_packed[:] = packed
        for o in range(O):
            out_sup[o][:] = sup[o]
        for k in range(KB):
            out_supb[k][:] = supb[k]
        out_grew[:] = grew

    row = pl.BlockSpec((T, V), lambda i: (i, 0))
    table = pl.BlockSpec((1, V), lambda i: (0, 0))
    tables_in = ([jnp.asarray(x)[None, :] for x in emask]
                 + [jnp.asarray(x)[None, :] for x in ewt]
                 + [jnp.asarray(x)[None, :] for x in eobs]
                 + [jnp.asarray(x)[None, :] for x in bmask]
                 + [jnp.asarray(x)[None, :] for x in bwt]
                 + [jnp.asarray(x)[None, :] for x in bobs])

    def run(packed, seed, sups, supbs):
        B = packed.shape[0]
        grid = (B // T,)
        n_state = 2 + O + KB
        out_shape = ([jax.ShapeDtypeStruct((B, V), jnp.int32)]
                     * (1 + O + KB + 1))
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[row] * n_state + [table] * (3 * O + 3 * KB),
            out_specs=[row] * (1 + O + KB + 1),
            out_shape=out_shape,
            interpret=interpret,
        )(packed, seed, *sups, *supbs, *tables_in)
        packed = outs[0]
        sups = tuple(outs[1:1 + O])
        supbs = tuple(outs[1 + O:1 + O + KB])
        grew = outs[1 + O + KB]
        return packed, sups, supbs, grew

    return run


def make_full_kernel(st, L, bn, V, T, max_rounds, interpret=False):
    """The ENTIRE union-find decode in one Mosaic kernel — growth
    rounds, label propagation, cluster parity, activity — with zero
    HBM crossings between rounds and ZERO scatters. The per-round
    cluster-parity scatter (the [4096,721] `.at[].add` costs ~19 ms on
    a v5e — it was 90%+ of d=11 decode time) is replaced by a
    parent-forest XOR rake:

    * during propagation each adoption records WHICH candidate slot won
      (`from_`); adoption requires a strictly smaller component root, so
      the recorded slot graph is acyclic and reaches each cluster root —
      a spanning forest expressed as per-vertex stencil directions;
    * parity rakes leaf-to-root along that forest (a vertex sends its
      accumulated parity to its parent exactly once, when it has heard
      from all its children — all child bookkeeping is static shifts);
    * activity = cluster parity spreads root-to-leaf down the same
      forest (monotone 0->1, so Jacobi iteration to fixpoint is exact).

    Slot encoding in `from_`: o in [0,O) parent = v + delta_o;
    O+o parent = v - delta_o; 2O+k parent = the boundary hub; -1 root
    (the hub itself is pinned to -1 — its cluster is excluded from
    activity, exactly like the XLA kernels' `vids != broot` rule).

    Spilled label lanes (``st.chunks``, see `device_uf.ChunkLanes`) are
    resolved AFTER convergence: each chunk's per-edge bits XOR-spread
    root-to-leaf down the same forest, giving every vertex its
    forest-path chunk value — bit-identical to what a wider packed word
    would have carried, since packed lanes equal forest-path XORs. The
    hub's path value routes through its recorded boundary provider
    (tracked at adoption time, so it is the true acyclic parent).

    Each batch tile runs its own outer round loop and stops when ITS
    shots converge. run(defect) -> (packed [B,V], act [B,V] i32,
    chunk_vals tuple of [B,V] i32)."""
    deltas = st.deltas
    KB = st.bmask.shape[0]
    O = len(deltas)
    NC = len(st.chunks)
    BIG = 2**30

    emask_np = np.asarray(st.emask, np.int32)
    ewt_np = np.asarray(st.ewt, np.int32)
    eobs_np = np.asarray(st.eobs, np.int32)
    bmask_np = np.asarray(st.bmask, np.int32)
    bwt_np = np.asarray(st.bwt, np.int32)
    bobs_np = np.asarray(st.bobs, np.int32)
    cE_np = [np.asarray(c.eobs, np.int32) for c in st.chunks]
    cB_np = [np.asarray(c.bobs, np.int32) for c in st.chunks]

    def kernel(*refs):
        defect_ref = refs[0]
        n_tab = 3 * O + 3 * KB + NC * (O + KB)
        table_refs = refs[1:1 + n_tab]
        out_packed, out_act = refs[1 + n_tab:3 + n_tab]
        out_chunks = refs[3 + n_tab:]
        emask_t = [table_refs[o][:] == 1 for o in range(O)]
        ewt_t = [table_refs[O + o][:] for o in range(O)]
        eobs_t = [table_refs[2 * O + o][:] for o in range(O)]
        bmask_t = [table_refs[3 * O + k][:] == 1 for k in range(KB)]
        bwt_t = [table_refs[3 * O + KB + k][:] for k in range(KB)]
        bobs_t = [table_refs[3 * O + 2 * KB + k][:] for k in range(KB)]
        base = 3 * O + 3 * KB
        cE_t = [[table_refs[base + c * (O + KB) + o][:]
                 for o in range(O)] for c in range(NC)]
        cB_t = [[table_refs[base + c * (O + KB) + O + k][:]
                 for k in range(KB)] for c in range(NC)]

        defect = defect_ref[:]
        vids = jax.lax.broadcasted_iota(jnp.int32, (T, V), 1)
        hub_col = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1) == bn

        def hub_of(x):
            return jnp.sum(jnp.where(hub_col, x, 0), axis=1,
                           keepdims=True)

        def round_body(state):
            (packed, sups, supbs, act, from0, hubp0, _, i) = state
            comp = packed >> L

            # -- grow (delta-stepped), using last round's activity
            nbr_eq = [comp == _shift_dn(comp, d, -1)
                      for o, d in enumerate(deltas)]
            hub_comp = hub_of(comp)
            inc = []
            for o, d in enumerate(deltas):
                growable = (emask_t[o] & (sups[o] < ewt_t[o])
                            & ~nbr_eq[o])
                inc.append(jnp.where(growable,
                                     act + _shift_dn(act, d, 0), 0))
            incb = [jnp.where(bmask_t[k] & (supbs[k] < bwt_t[k])
                              & (comp != hub_comp), act, 0)
                    for k in range(KB)]
            slack_v = reduce(jnp.minimum,
                             [jnp.where(inc[o] > 0,
                                        -(-(ewt_t[o] - sups[o])
                                          // jnp.maximum(inc[o], 1)),
                                        BIG) for o in range(O)]
                             + [jnp.where(incb[k] > 0,
                                          -(-(bwt_t[k] - supbs[k])
                                            // jnp.maximum(incb[k], 1)),
                                          BIG) for k in range(KB)])
            slack = jnp.min(slack_v, axis=1, keepdims=True)
            delta_g = jnp.maximum(slack, 1)
            delta_g = jnp.where(delta_g >= BIG, 1, delta_g)
            sups = tuple(sups[o] + inc[o] * delta_g for o in range(O))
            supbs = tuple(supbs[k] + incb[k] * delta_g
                          for k in range(KB))
            grew = jnp.any(reduce(
                jnp.bitwise_or,
                [(x > 0).astype(jnp.int32) for x in inc + incb]) != 0)

            # -- propagate labels to fixpoint, recording adoption slots
            satm = [(sups[o] >= ewt_t[o]) & emask_t[o] for o in range(O)]
            satb = [(supbs[k] >= bwt_t[k]) & bmask_t[k]
                    for k in range(KB)]

            def prop_body(pstate):
                packed, from_, hubp, _ = pstate
                cands = []
                codes = []
                for o, d in enumerate(deltas):
                    offered = jnp.where(satm[o], packed ^ eobs_t[o], BIG)
                    cands.append(jnp.where(
                        satm[o],
                        _shift_dn(packed, d, BIG) ^ eobs_t[o], BIG))
                    codes.append(o)                 # parent = v + d
                    cands.append(_shift_up(offered, d, BIG))
                    codes.append(O + o)             # parent = v - d
                hub_val = hub_of(packed)
                for k in range(KB):
                    cands.append(jnp.where(satb[k], hub_val ^ bobs_t[k],
                                           BIG))
                    codes.append(2 * O + k)         # parent = hub
                cand = reduce(jnp.minimum, cands)
                adopted = (cand >> L) < (packed >> L)
                fc = jnp.full((T, V), -1, jnp.int32)
                for idx in range(len(cands) - 1, -1, -1):
                    fc = jnp.where(cands[idx] == cand,
                                   jnp.int32(codes[idx]), fc)
                new = jnp.where(adopted, cand, packed)
                from_ = jnp.where(adopted, fc, from_)
                hub_cand = reduce(jnp.minimum, [
                    jnp.min(jnp.where(satb[k], packed ^ bobs_t[k], BIG),
                            axis=1, keepdims=True) for k in range(KB)])
                adopted_b = (hub_cand >> L) < (hub_val >> L)
                new = jnp.where(hub_col & adopted_b,
                                jnp.broadcast_to(hub_cand, new.shape),
                                new)
                if NC:
                    # record the hub's true provider (k*, v*) — needed
                    # to route chunk path values through the hub
                    best_v = jnp.full((T, 1), BIG, jnp.int32)
                    best_k = jnp.zeros((T, 1), jnp.int32)
                    found = jnp.zeros((T, 1), bool)
                    for k in range(KB):
                        m = satb[k] & ((packed ^ bobs_t[k]) == hub_cand)
                        mv = jnp.min(jnp.where(m, vids, BIG), axis=1,
                                     keepdims=True)
                        hit = ~found & (mv < BIG)
                        best_v = jnp.where(hit, mv, best_v)
                        best_k = jnp.where(hit, k, best_k)
                        found = found | hit
                    hub_pv, hub_pk = hubp
                    hub_pv = jnp.where(adopted_b, best_v, hub_pv)
                    hub_pk = jnp.where(adopted_b, best_k, hub_pk)
                    hubp = (hub_pv, hub_pk)
                return (new, from_, hubp,
                        jnp.any(adopted) | jnp.any(adopted_b))

            # the adoption forest PERSISTS across rounds: a vertex that
            # adopted in an earlier round and kept its label this round
            # is still an interior tree node, not a root
            packed, from_, hubp, _ = jax.lax.while_loop(
                lambda s: s[3], prop_body,
                (packed, from0, hubp0, jnp.bool_(True)))
            # the hub never rakes or spreads — pin it to root status
            from_ = jnp.where(hub_col, -1, from_)
            comp = packed >> L

            # -- rake parities leaf-to-root along the adoption forest
            child_count = jnp.zeros((T, V), jnp.int32)
            for o, d in enumerate(deltas):
                child_count += _shift_up(
                    (from_ == o).astype(jnp.int32), d, 0)
                child_count += _shift_dn(
                    (from_ == O + o).astype(jnp.int32), d, 0)

            def rake_body(rstate):
                par, received, sent, _ = rstate
                ready = ((from_ >= 0) & (sent == 0)
                         & (received == child_count))
                rpar = jnp.where(ready, par, 0)
                for o, d in enumerate(deltas):
                    m_dn = ready & (from_ == o)        # parent = v + d
                    par = par ^ _shift_up(jnp.where(m_dn, rpar, 0), d, 0)
                    received = received + _shift_up(
                        m_dn.astype(jnp.int32), d, 0)
                    m_up = ready & (from_ == O + o)    # parent = v - d
                    par = par ^ _shift_dn(jnp.where(m_up, rpar, 0), d, 0)
                    received = received + _shift_dn(
                        m_up.astype(jnp.int32), d, 0)
                # boundary-slot senders deliver nothing (hub cluster is
                # excluded from activity) but must still mark sent
                sent = sent | ready.astype(jnp.int32)
                return par, received, sent, jnp.any(ready)

            par, _, _, _ = jax.lax.while_loop(
                lambda s: s[3], rake_body,
                (defect, jnp.zeros((T, V), jnp.int32),
                 jnp.zeros((T, V), jnp.int32), jnp.bool_(True)))

            # -- activity = cluster parity, spread root-to-leaf
            broot = hub_of(comp)
            root_val = jnp.where((comp == vids) & ((par & 1) == 1)
                                 & (vids != broot), 1, 0)

            def spread_body(sstate):
                act, _ = sstate
                hub_act = hub_of(act)
                pa = jnp.zeros((T, V), jnp.int32)
                for o, d in enumerate(deltas):
                    pa = jnp.where(from_ == o, _shift_dn(act, d, 0), pa)
                    pa = jnp.where(from_ == O + o,
                                   _shift_up(act, d, 0), pa)
                for k in range(KB):
                    pa = jnp.where(from_ == 2 * O + k,
                                   jnp.broadcast_to(hub_act, pa.shape),
                                   pa)
                new = jnp.where(from_ >= 0, pa, root_val)
                return new, jnp.any(new != act)

            act, _ = jax.lax.while_loop(
                lambda s: s[1], spread_body,
                (root_val, jnp.bool_(True)))

            cont = jnp.any(act != 0) & grew & (i + 1 < max_rounds)
            return (packed, sups, supbs, act, from_, hubp, cont, i + 1)

        packed0 = (jax.lax.broadcasted_iota(jnp.int32, (T, V), 1)
                   << L)
        sups0 = tuple(jnp.zeros((T, V), jnp.int32) for _ in range(O))
        supbs0 = tuple(jnp.zeros((T, V), jnp.int32) for _ in range(KB))
        hubp0 = (jnp.full((T, 1), -1, jnp.int32),
                 jnp.zeros((T, 1), jnp.int32))
        state = (packed0, sups0, supbs0, defect,
                 jnp.full((T, V), -1, jnp.int32), hubp0,
                 jnp.any(defect != 0), jnp.int32(0))
        packed, _, _, act, from_, hubp, _, _ = jax.lax.while_loop(
            lambda s: s[6], round_body, state)
        out_packed[:] = packed
        out_act[:] = act

        # -- resolve spilled lane chunks: XOR-spread each chunk's edge
        #    bits root-to-leaf down the final adoption forest
        if NC:
            hub_pv, hub_pk = hubp
            hub_sel = vids == hub_pv          # [T, V], exactly one col
            for c in range(NC):
                up_tabs = [_shift_up(cE_t[c][o], d, 0)
                           for o, d in enumerate(deltas)]
                cb_sel = jnp.zeros((T, V), jnp.int32)
                for k in range(KB):
                    cb_sel = jnp.where(hub_pk == k,
                                       jnp.broadcast_to(cB_t[c][k],
                                                        (T, V)),
                                       cb_sel)

                def chunk_body(cstate, c=c, up_tabs=up_tabs,
                               cb_sel=cb_sel):
                    val, _ = cstate
                    pv = jnp.zeros((T, V), jnp.int32)
                    for o, d in enumerate(deltas):
                        pv = jnp.where(from_ == o,
                                       _shift_dn(val, d, 0)
                                       ^ cE_t[c][o], pv)
                        pv = jnp.where(from_ == O + o,
                                       _shift_up(val, d, 0)
                                       ^ up_tabs[o], pv)
                    for k in range(KB):
                        pv = jnp.where(from_ == 2 * O + k,
                                       hub_of(val) ^ cB_t[c][k], pv)
                    new = jnp.where(from_ >= 0, pv, 0)
                    # the hub's own path value goes through its recorded
                    # boundary provider (k*, v*)
                    vhub = (jnp.sum(jnp.where(hub_sel, val ^ cb_sel, 0),
                                    axis=1, keepdims=True))
                    new = jnp.where(hub_col & (hub_pv >= 0),
                                    jnp.broadcast_to(vhub, new.shape),
                                    new)
                    return new, jnp.any(new != val)

                val, _ = jax.lax.while_loop(
                    lambda s: s[1], chunk_body,
                    (jnp.zeros((T, V), jnp.int32), jnp.bool_(True)))
                out_chunks[c][:] = val

    row = pl.BlockSpec((T, V), lambda i: (i, 0))
    table = pl.BlockSpec((1, V), lambda i: (0, 0))
    tables_in = ([jnp.asarray(emask_np[o][None, :]) for o in range(O)]
                 + [jnp.asarray(ewt_np[o][None, :]) for o in range(O)]
                 + [jnp.asarray(eobs_np[o][None, :]) for o in range(O)]
                 + [jnp.asarray(bmask_np[k][None, :]) for k in range(KB)]
                 + [jnp.asarray(bwt_np[k][None, :]) for k in range(KB)]
                 + [jnp.asarray(bobs_np[k][None, :]) for k in range(KB)])
    for c in range(NC):
        tables_in.extend(jnp.asarray(cE_np[c][o][None, :])
                         for o in range(O))
        tables_in.extend(jnp.asarray(cB_np[c][k][None, :])
                         for k in range(KB))

    def run(defect):
        B = defect.shape[0]
        grid = (B // T,)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[row] + [table] * len(tables_in),
            out_specs=[row] * (2 + NC),
            out_shape=[jax.ShapeDtypeStruct((B, V), jnp.int32)]
            * (2 + NC),
            interpret=interpret,
        )(defect, *tables_in)
        return outs[0], outs[1], tuple(outs[2:])

    return run


def pick_tile(V: int, O: int = 4, KB: int = 2, NC: int = 0,
              budget_bytes: int = 14 << 20) -> int:
    """Largest batch tile whose whole-decode VMEM footprint fits the
    Mosaic scoped-vmem budget. Peak live [T, V] i32 arrays fit
    8 + 8*O + 4*KB + 3*NC (state + per-offset temporaries + double
    buffering) — calibrated against the compiler's scoped-vmem numbers:
    (V=721, O=4, KB=2): 48 arrays, OOM at T=128, fits T=64;
    (V=481, O=7, KB=1, NC=2): 74 arrays = 18.41M at T=128;
    (V=193, O=4, KB=3, NC=1): 55 arrays, fits T=128.

    V must be counted PADDED to the 128-lane boundary: Mosaic tiles
    the minor dimension to multiples of 128, so V=401 costs 512 lanes
    per array — the d=9 circuit DEM (V=401, 68 arrays) measured 16.59M
    scoped at T=128 against a 13.3M unpadded estimate and OOM'd the
    16M budget at EVERY batch size until this accounting."""
    arrays = 8 + 8 * O + 4 * KB + 3 * NC
    v_pad = ((V + 127) // 128) * 128
    t = budget_bytes // (v_pad * 4 * arrays)
    for tile in (128, 96, 64, 48, 32, 16, 8):
        if t >= tile:
            return tile
    return 8


def decode_stencil_pallas_full(dg, detectors, tile: int = 64,
                               interpret: bool = False,
                               sort_shots: bool = True):
    """Whole-decode-in-one-kernel stencil union-find
    (`make_full_kernel`): detectors in, labels out, one pallas call.
    Same contract and bit-identical labels vs `_decode_stencil` /
    `decode_stencil_pallas_fused` — the parent-forest rake computes the
    same cluster parities the scatter did.

    ``sort_shots`` groups shots by defect count before tiling so that
    easy tiles exit their round loop early instead of every tile paying
    for its hardest shot; the unsort touches only per-shot scalars."""
    st = dg.stencil
    if st is None or dg.pack_shift is None:
        raise ValueError("pallas decode requires a stencil-eligible graph")
    dets = jnp.asarray(detectors)
    B0 = dets.shape[0]
    T = max(8, (min(tile, B0) // 8) * 8)
    order = None
    if sort_shots and B0 > T:
        order = jnp.argsort(jnp.sum(dets.astype(jnp.int32), axis=1))
        dets = jnp.take(dets, order, axis=0)
    if B0 % T:
        pad = T - B0 % T
        dets = jnp.concatenate(
            [dets, jnp.zeros((pad, dets.shape[1]), dets.dtype)], axis=0)
    B = dets.shape[0]
    V = dg.num_nodes + 1
    bn = dg.num_nodes
    L = dg.pack_shift
    step = make_full_kernel(st, L, bn, V, T, dg.max_rounds,
                            interpret=interpret)
    defect = jnp.concatenate(
        [dets.astype(jnp.int32) & 1, jnp.zeros((B, 1), jnp.int32)], axis=1)
    packed, act, chunk_vals = step(defect)

    bmask_lanes = jnp.int32((1 << L) - 1)
    broot = packed[:, bn] >> L
    in_bc = (packed >> L) == broot[:, None]
    bc_odd = jnp.sum(jnp.where(in_bc, defect, 0), axis=1) & 1
    masked = jnp.where(defect.astype(bool), packed & bmask_lanes, 0)
    tot = jax.lax.reduce(masked, jnp.int32(0), jax.lax.bitwise_xor, (1,))
    tot = tot ^ jnp.where(bc_odd == 1, packed[:, bn] & bmask_lanes, 0)
    packed_ids = dg.packed_lane_ids or tuple(range(len(dg.lane_offsets)))
    n_lanes = len(packed_ids) + sum(len(c.lane_ids) for c in st.chunks)
    by_id: list = [None] * n_lanes
    for lane_id, off, mask in zip(packed_ids, dg.lane_offsets,
                                  dg.lane_masks):
        by_id[lane_id] = (tot >> off) & mask
    for c, val in zip(st.chunks, chunk_vals):
        vmasked = jnp.where(defect.astype(bool), val, 0)
        ctot = jax.lax.reduce(vmasked, jnp.int32(0),
                              jax.lax.bitwise_xor, (1,))
        ctot = ctot ^ jnp.where(bc_odd == 1, val[:, bn], 0)
        for lane_id, off, mask in zip(c.lane_ids, c.offsets, c.masks):
            by_id[lane_id] = (ctot >> off) & mask
    labels = tuple(by_id)
    converged = ~jnp.any(act != 0, axis=1)
    labels = tuple(lab[:B0] for lab in labels)
    converged = converged[:B0]
    if order is not None:
        inv = jnp.zeros((B0,), jnp.int32).at[order].set(
            jnp.arange(B0, dtype=jnp.int32))
        labels = tuple(jnp.take(lab, inv, axis=0) for lab in labels)
        converged = jnp.take(converged, inv, axis=0)
    return labels, converged


def decode_stencil_pallas_fused(dg, detectors, tile: int = 128,
                                interpret: bool = False):
    """Stencil union-find decode, ONE Mosaic kernel per growth round
    (`make_round_kernel`) — same contract and same round/iteration
    semantics as `decode_stencil_pallas`, with only the parity scatter,
    activity seeding and loop control left in XLA. Per round, the state
    crosses HBM once instead of per-fixpoint-iteration."""
    st = dg.stencil
    if st is None or dg.pack_shift is None:
        raise ValueError("pallas decode requires a stencil-eligible graph")
    if st.chunks:
        raise ValueError("spilled lanes need decode_stencil_pallas_full")
    dets = jnp.asarray(detectors)
    B0 = dets.shape[0]
    T = max(8, (min(tile, B0) // 8) * 8)
    if B0 % T:
        pad = T - B0 % T
        dets = jnp.concatenate(
            [dets, jnp.zeros((pad, dets.shape[1]), dets.dtype)], axis=0)
    B = dets.shape[0]
    V = dg.num_nodes + 1
    bn = dg.num_nodes
    L = dg.pack_shift
    O = len(st.deltas)
    KB = st.bmask.shape[0]
    step = make_round_kernel(st, L, bn, V, T, interpret=interpret)
    defect = jnp.concatenate(
        [dets.astype(jnp.int32) & 1, jnp.zeros((B, 1), jnp.int32)], axis=1)
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    vids = jnp.arange(V, dtype=jnp.int32)[None, :]

    def seeds_of(packed):
        comp = packed >> L
        cnt = jnp.zeros((B, V), jnp.int32).at[bidx, comp].add(
            defect, mode="promise_in_bounds")
        broot = comp[:, bn]
        act_root = ((cnt & 1) == 1) & (vids != broot[:, None])
        return (act_root & (comp == vids)).astype(jnp.int32)

    def round_cond(state):
        _, _, _, _, any_active, i = state
        return any_active & (i < dg.max_rounds)

    def round_body(state):
        packed, sups, supbs, seed, _, i = state
        packed, sups, supbs, grew = step(packed, seed, sups, supbs)
        seed = seeds_of(packed)
        any_active = jnp.any(seed != 0) & jnp.any(grew != 0)
        return packed, sups, supbs, seed, any_active, i + 1

    packed0 = jnp.broadcast_to(
        (jnp.arange(V, dtype=jnp.int32) << L)[None, :], (B, V))
    sups0 = tuple(jnp.zeros((B, V), jnp.int32) for _ in range(O))
    supbs0 = tuple(jnp.zeros((B, V), jnp.int32) for _ in range(KB))
    seed0 = defect  # round 1: every defect is an odd singleton root
    state = (packed0, sups0, supbs0, seed0,
             jnp.any(seed0 != 0), jnp.int32(0))
    packed, _, _, seed, _, _ = jax.lax.while_loop(
        round_cond, round_body, state)

    bmask_lanes = jnp.int32((1 << L) - 1)
    broot = packed[:, bn] >> L
    in_bc = (packed >> L) == broot[:, None]
    bc_odd = jnp.sum(jnp.where(in_bc, defect, 0), axis=1) & 1
    masked = jnp.where(defect.astype(bool), packed & bmask_lanes, 0)
    tot = jax.lax.reduce(masked, jnp.int32(0), jax.lax.bitwise_xor, (1,))
    tot = tot ^ jnp.where(bc_odd == 1, packed[:, bn] & bmask_lanes, 0)
    labels = tuple((tot >> off) & mask
                   for off, mask in zip(dg.lane_offsets, dg.lane_masks))
    converged = ~jnp.any(seed != 0, axis=1)
    return tuple(lab[:B0] for lab in labels), converged[:B0]


def decode_stencil_pallas(dg, detectors, tile: int = 256,
                          interpret: bool = False):
    """Stencil union-find decode with pallas fixpoints; same contract as
    `device_uf.decode_labels` (uncapped: every shot converges, so
    converged is True except on the max_rounds edge). Batch is padded up
    to a tile multiple internally."""
    st = dg.stencil
    if st is None or dg.pack_shift is None:
        raise ValueError("pallas decode requires a stencil-eligible graph")
    if st.chunks:
        raise ValueError("spilled lanes need decode_stencil_pallas_full")
    dets = jnp.asarray(detectors)
    B0 = dets.shape[0]
    T = max(8, (min(tile, B0) // 8) * 8)
    if B0 % T:
        pad = T - B0 % T
        dets = jnp.concatenate(
            [dets, jnp.zeros((pad, dets.shape[1]), dets.dtype)], axis=0)
    B = dets.shape[0]
    V = dg.num_nodes + 1
    bn = dg.num_nodes
    L = dg.pack_shift
    O = len(st.deltas)
    KB = st.bmask.shape[0]
    prop = make_prop_kernel(st, L, bn, V, T, interpret=interpret)
    actk = make_act_kernel(st, V, T, interpret=interpret)
    defect = jnp.concatenate(
        [dets.astype(jnp.int32) & 1, jnp.zeros((B, 1), jnp.int32)], axis=1)
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    vids = jnp.arange(V, dtype=jnp.int32)[None, :]
    BIG = jnp.int32(_BIG)

    shift_dn = _shift_dn_x

    def round_cond(state):
        _, _, _, act, any_active, i = state
        return any_active & (i < dg.max_rounds)

    def round_body(state):
        packed, sup, supb, act, _, i = state
        comp = packed >> L
        incs = []
        for o, d in enumerate(st.deltas):
            growable = (st.emask[o][None, :] & (sup[:, o] < st.ewt[o])
                        & (comp != shift_dn(comp, d, -1)))
            incs.append(jnp.where(
                growable, act + shift_dn(act, d, 0), 0))
        inc = jnp.stack(incs, axis=1)  # [B, O, V]
        comp_bn = comp[:, bn][:, None]
        incb = jnp.stack([
            jnp.where(st.bmask[k][None, :] & (supb[:, k] < st.bwt[k])
                      & (comp != comp_bn), act, 0)
            for k in range(KB)
        ], axis=1)  # [B, KB, V]
        slack = jnp.minimum(
            jnp.min(jnp.where(
                inc > 0,
                -(-(st.ewt[None] - sup) // jnp.maximum(inc, 1)), BIG),
                axis=(1, 2)),
            jnp.min(jnp.where(
                incb > 0,
                -(-(st.bwt[None] - supb) // jnp.maximum(incb, 1)), BIG),
                axis=(1, 2)),
        )
        delta = jnp.maximum(slack, 1)
        delta = jnp.where(delta >= BIG, 1, delta)[:, None, None]
        sup = sup + inc * delta
        supb = supb + incb * delta
        grew = jnp.any(inc > 0) | jnp.any(incb > 0)
        satm = jnp.stack(
            [(sup[:, o] >= st.ewt[o]) & st.emask[o][None, :]
             for o in range(O)], axis=1)
        satb = jnp.stack(
            [(supb[:, k] >= st.bwt[k]) & st.bmask[k][None, :]
             for k in range(KB)], axis=1)
        packed = prop(packed, satm, satb)
        comp = packed >> L
        cnt = jnp.zeros((B, V), jnp.int32).at[bidx, comp].add(
            defect, mode="promise_in_bounds")
        broot = comp[:, bn]
        act_root = ((cnt & 1) == 1) & (vids != broot[:, None])
        act_seed = (act_root & (comp == vids)).astype(jnp.int32)
        passes = jnp.stack(
            [(satm[:, o] & (comp == shift_dn(comp, d, -1)))
             .astype(jnp.int32)
             for o, d in enumerate(st.deltas)], axis=1)
        act = actk(act_seed, passes)
        return packed, sup, supb, act, jnp.any(act != 0) & grew, i + 1

    packed0 = jnp.broadcast_to(
        (jnp.arange(V, dtype=jnp.int32) << L)[None, :], (B, V))
    sup0 = jnp.zeros((B, O, V), jnp.int32)
    supb0 = jnp.zeros((B, KB, V), jnp.int32)
    act0 = defect  # int32 0/1 throughout (act kernel contract)
    state = (packed0, sup0, supb0, act0, jnp.any(act0 != 0), jnp.int32(0))
    packed, sup, supb, act, _, _ = jax.lax.while_loop(
        round_cond, round_body, state)

    bmask_lanes = jnp.int32((1 << L) - 1)
    broot = packed[:, bn] >> L
    in_bc = (packed >> L) == broot[:, None]
    bc_odd = jnp.sum(jnp.where(in_bc, defect, 0), axis=1) & 1
    masked = jnp.where(defect.astype(bool), packed & bmask_lanes, 0)
    tot = jax.lax.reduce(masked, jnp.int32(0), jax.lax.bitwise_xor, (1,))
    tot = tot ^ jnp.where(bc_odd == 1, packed[:, bn] & bmask_lanes, 0)
    labels = tuple((tot >> off) & mask
                   for off, mask in zip(dg.lane_offsets, dg.lane_masks))
    converged = ~jnp.any(act != 0, axis=1)
    return tuple(lab[:B0] for lab in labels), converged[:B0]
