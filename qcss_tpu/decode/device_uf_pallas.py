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


def decode_stencil_pallas(dg, detectors, tile: int = 256,
                          interpret: bool = False):
    """Stencil union-find decode with pallas fixpoints; same contract as
    `device_uf.decode_labels` (uncapped: every shot converges, so
    converged is True except on the max_rounds edge). Batch is padded up
    to a tile multiple internally."""
    st = dg.stencil
    if st is None or dg.pack_shift is None:
        raise ValueError("pallas decode requires a stencil-eligible graph")
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
