"""Batched union-find decoding ON DEVICE — closing the sample/decode gap.

Round 2 left the framework decode-bound: the frame sampler produces 379k
shots/s at surface d=11 R=11 while the host C++ union-find decodes 20.6k/s
on the bench host's single core (BASELINE.md) — an 18x mismatch that idles
the TPU. The reference faced the same architectural question and answered
it by compiling its decoder INTO the executed program (reference:
css_code.py:649-685, Quil classical instructions run inside the QVM); this
module finishes the same inversion for matching decoders: union-find as a
pure-JAX batched array program, so sampling AND decoding run in one
compiled device pipeline with only failure counts crossing the host
boundary.

Algorithm (Delfosse-Nickerson growth, arXiv:1709.06218, re-shaped for the
TPU's memory system — four designs were measured on a v5e to get here:

1. pointer-jumping DSU: per-shot dynamic gathers (``take_along_axis``)
   cost ~31.6 ms each on [4096, 721] — 20x any other primitive — DOA;
2. min-label propagation with scatter-min hooks: static-index scatters
   serialize per column on TPU and scale superlinearly in batch;
3. min-label propagation over padded [V, D] incidence tables reshaped to
   [B, V, D] (static gathers + dense argmin/one-hot only) — correct and
   shipped mid-round-3, but two structural costs remained: every parity
   lane rode its own [B, V, D] gather + one-hot select, and the global
   fixpoint ran until the WORST shot in the batch converged (measured at
   d=11 R=11 p=0.008: 10 growth rounds but 219 propagation + 169
   activity iterations — tail shots with long label chains gated all
   4096 lanes);
4. THIS version, attacking both: (a) when the label lanes fit, comp and
   every parity lane PACK into one int32 (comp in the high bits), so an
   adoption is a single XOR+min — no argmin, no one-hot, no per-lane
   gathers — and the per-slot formulation (D separate [B, V] gathers
   tree-reduced with ``jnp.minimum``) lets XLA fuse without ever
   materializing [B, V, D] (measured 1.9x over the reshape form; whole
   kernel 530 -> 272 ms at d=11 R=11 B=4096 p=0.008); and (b) optional
   per-round iteration CAPS with per-shot suspect tracking: shots whose
   propagation was truncated are flagged, frozen, and re-decoded by the
   host kernel (`DeviceUFDecoder(host_fallback=True)`), which preserves
   exactness because the fallback IS the reference kernel. The caps are
   OFF by default — the depth distribution is heavy-tailed (19% of
   d=11 shots still changing at iteration 16), so host fallback volume
   grows faster than device time shrinks; they remain available for
   callers with a cheap fallback channel.)

Per shot the state is

* ``packed [B, V]`` — cluster label over detectors + one virtual boundary
  node (index V-1): ``comp << L | lanes``, where comp is the min vertex
  id in the cluster after propagation and the low L bits carry the XOR
  of edge labels along a graph path from the node to its cluster
  representative (lane 0 = the logical observable; extra lanes e.g. the
  streaming decoder's commit metadata). Minimising the packed value
  minimises comp (high bits) and ties break toward one deterministic
  path, so ALL lanes travel one consistent path by construction. Wide
  lanes that do not fit (log2(V) + Σ lane bits > 30, e.g. the streaming
  decoder's multi-lane carry) fall back to the unpacked kernel where
  each adoption selects its delivering edge by argmin + one-hot;
* ``support [B, E]`` — per-edge growth, saturating at `edge_weight`,
  advanced by the per-shot MINIMUM slack (delta-stepped growth: identical
  trajectory to unit steps — no merge can occur strictly between
  saturations — but weighted DEM graphs converge in O(#merges) rounds
  instead of O(weight x distance)).

Growth mirrors the host kernel (`native/uf_decoder.cc`): clusters with
odd defect parity not containing the boundary are active; every
unsaturated edge gains support per active endpoint cluster against
start-of-round state; saturated edges union their endpoint clusters.

The correction itself is never materialized: pairing every defect to its
cluster representative along label-propagation paths is a valid matching
correction (genuine graph paths; duplicated segments cancel mod 2), so a
cluster's label flip is the XOR of the packed lanes over its defects —
plus one defect-to-boundary path when its defect count is odd (only
boundary clusters end odd). On any error of weight <= t this coincides
exactly with the host peeler's answer (tested exhaustively); on heavier
errors the two differ only by in-cluster cycles.
"""

from __future__ import annotations

from functools import partial, reduce
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from qcss_tpu.decode.uf import MatchingGraph


class DeviceGraph(NamedTuple):
    """Static decoding-graph arrays staged for the device kernel.
    ``eu``/``ev`` [E] endpoint indices with the boundary mapped to the
    virtual node V-1; ``wt`` [E] growth saturation; ``obs`` a tuple of
    [E] int32 label lanes; ``inc_e`` [V, D] incident-edge table (E = the
    zero-weight sentinel slot), ``other_v`` [V, D] the incident edge's
    far endpoint (self on sentinel slots); ``lane_inc`` per lane the
    [V, D] edge-label table of ``inc_e``. When the lanes fit beside comp
    in an int32 (``pack_shift`` is not None), ``packed_inc`` [V, D] /
    ``packed_b`` [Eb] hold all lanes pre-packed into their bit fields
    and the fast packed kernel is used; ``lane_offsets``/``lane_masks``
    recover individual lanes. ``prop_cap``/``act_cap`` bound the
    per-growth-round fixpoint iterations (None = run to convergence);
    truncated shots are reported unconverged (see module docstring)."""

    eu: jax.Array
    ev: jax.Array
    wt: jax.Array
    obs: tuple
    inc_e: jax.Array
    other_v: jax.Array
    lane_inc: tuple
    b_edges: jax.Array   # [Eb] edges incident to the boundary hub
    b_other: jax.Array   # [Eb] their far endpoints
    b_mask: jax.Array    # [Eb] False on the shape-stability sentinel slot
    lane_b: tuple        # per lane, the [Eb] labels of b_edges
    num_nodes: int  # detectors (boundary node NOT included)
    max_rounds: int
    pack_shift: int | None   # comp << pack_shift | lanes; None = unpacked
    lane_offsets: tuple      # per lane, bit offset inside the packed field
    lane_masks: tuple        # per lane, (1 << bits) - 1
    packed_inc: jax.Array | None  # [V, D] all lanes packed (0 outside)
    packed_b: jax.Array | None    # [Eb] all lanes packed
    prop_cap: int | None
    act_cap: int | None
    stencil: "StencilGraph | None" = None
    #: original lane indices carried in the packed word (all lanes
    #: unless spill_lanes moved some into stencil.chunks)
    packed_lane_ids: tuple = ()


class StencilGraph(NamedTuple):
    """Shift-stencil representation for LATTICE decoding graphs — no
    gathers at all. Eligible when every internal edge connects v to
    v + delta for a SMALL set of distinct deltas (surface spacetime
    graphs have 4: three spatial and one temporal; circuit-level DEM
    graphs add diagonals for 7), no two internal edges share an
    endpoint pair, and boundary edges number <= ``KB`` per node. Edge
    (o, v) is the internal edge v -- v+deltas[o] where ``emask[o, v]``;
    boundary slot (k, v) is the k-th boundary edge at v where
    ``bmask[k, v]``. A propagation step is then 2 static shifts per
    offset plus elementwise min — VMEM/stencil-friendly and the basis
    for the fused Pallas kernel."""

    deltas: tuple               # distinct positive offsets, python ints
    emask: jax.Array            # [O, V] bool
    ewt: jax.Array              # [O, V] int32
    eobs: jax.Array             # [O, V] int32, packed lanes
    bmask: jax.Array            # [KB, V] bool
    bwt: jax.Array              # [KB, V] int32
    bobs: jax.Array             # [KB, V] int32, packed lanes
    chunks: tuple = ()          # ChunkLanes for spilled label lanes


class ChunkLanes(NamedTuple):
    """Label lanes that did not fit in the packed word (lane spilling,
    `build_device_graph(spill_lanes=True)`). The full-decode Mosaic
    kernel resolves them AFTER convergence by XOR-spreading each chunk
    down the adoption forest — the packed lanes equal forest-path XORs,
    so chunk labels are bit-identical to a hypothetical wider packed
    word. Up to 30 bits of spilled lanes per chunk."""

    eobs: jax.Array             # [O, V] int32, this chunk's edge bits
    bobs: jax.Array             # [KB, V] int32
    lane_ids: tuple             # original lane indices in this chunk
    offsets: tuple              # bit offset per lane within the chunk
    masks: tuple


_STENCIL_MAX_OFFSETS = 10
_STENCIL_MAX_B = 4


def _build_stencil(eu, ev, wt, bn, V, packed_full, chunk_descs=()):
    """StencilGraph from the edge list, or None when the graph is not
    lattice-shaped (see StencilGraph). ``packed_full`` [E+1] carries the
    packed lanes per edge; ``chunk_descs`` is a sequence of
    (chunk_full [E], lane_ids, offsets, masks) for spilled lanes."""
    E = eu.shape[0]
    internal = [e for e in range(E) if eu[e] != bn and ev[e] != bn]
    boundary = [e for e in range(E) if eu[e] == bn or ev[e] == bn]
    lo = np.minimum(eu, ev)
    hi = np.maximum(eu, ev)
    deltas = sorted({int(hi[e] - lo[e]) for e in internal})
    if (len(deltas) > _STENCIL_MAX_OFFSETS or 0 in deltas
            or len({(int(lo[e]), int(hi[e])) for e in internal})
            != len(internal)):
        return None
    O = max(len(deltas), 1)
    emask = np.zeros((O, V), bool)
    ewt = np.zeros((O, V), np.int32)
    eobs = np.zeros((O, V), np.int32)
    dindex = {d: o for o, d in enumerate(deltas)}
    for e in internal:
        o = dindex[int(hi[e] - lo[e])]
        v = int(lo[e])
        emask[o, v] = True
        ewt[o, v] = wt[e]
        eobs[o, v] = packed_full[e]
    per_node = np.zeros(V, np.int64)
    for e in boundary:
        v = int(lo[e]) if hi[e] == bn else int(hi[e])
        per_node[v] += 1
    KB = int(per_node.max(initial=1))
    if KB > _STENCIL_MAX_B:
        return None
    bmask = np.zeros((KB, V), bool)
    bwt = np.zeros((KB, V), np.int32)
    bobs = np.zeros((KB, V), np.int32)
    fill = np.zeros(V, np.int64)
    for e in boundary:
        v = int(lo[e]) if hi[e] == bn else int(hi[e])
        k = fill[v]
        fill[v] += 1
        bmask[k, v] = True
        bwt[k, v] = wt[e]
        bobs[k, v] = packed_full[e]
    if not deltas:
        deltas = [1]  # shape stability; emask is all-False
    chunks = []
    for chunk_full, lane_ids, offsets, masks in chunk_descs:
        ceobs = np.zeros((O, V), np.int64)
        cbobs = np.zeros((KB, V), np.int64)
        for e in internal:
            ceobs[dindex[int(hi[e] - lo[e])], int(lo[e])] = chunk_full[e]
        fill2 = np.zeros(V, np.int64)
        for e in boundary:
            v = int(lo[e]) if hi[e] == bn else int(hi[e])
            cbobs[fill2[v], v] = chunk_full[e]
            fill2[v] += 1
        chunks.append(ChunkLanes(
            eobs=jnp.asarray(ceobs.astype(np.int32)),
            bobs=jnp.asarray(cbobs.astype(np.int32)),
            lane_ids=tuple(lane_ids),
            offsets=tuple(offsets),
            masks=tuple(masks),
        ))
    return StencilGraph(
        deltas=tuple(int(d) for d in deltas),
        emask=jnp.asarray(emask),
        ewt=jnp.asarray(ewt),
        eobs=jnp.asarray(eobs),
        bmask=jnp.asarray(bmask),
        bwt=jnp.asarray(bwt),
        bobs=jnp.asarray(bobs),
        chunks=tuple(chunks),
    )


def build_device_graph(graph: MatchingGraph,
                       max_growth_rounds: int | None = None,
                       extra_lanes: tuple = (),
                       prop_cap: int | None = None,
                       act_cap: int | None = None,
                       stencil: bool | None = None,
                       spill_lanes: bool = False) -> DeviceGraph:
    edges = np.asarray(graph.edges, np.int32)
    bn = graph.num_nodes  # virtual boundary node index
    V = bn + 1
    eu = np.where(edges[:, 0] < 0, bn, edges[:, 0]).astype(np.int32)
    ev = np.where(edges[:, 1] < 0, bn, edges[:, 1]).astype(np.int32)
    wt = np.asarray(graph.edge_weight, np.int32)
    E = edges.shape[0]
    lanes = [np.asarray(graph.edge_obs, np.int64)]
    lanes.extend(np.asarray(x, np.int64) for x in extra_lanes)
    for lane in lanes:
        if lane.shape != (E,):
            raise ValueError("each obs lane must be [num_edges]")
        if int(lane.max(initial=0)) > 2**30:
            raise ValueError("edge labels must fit in 31 signed bits")
    # Padded incidence tables over the REAL detectors; slot edge E is the
    # inert sentinel. The virtual boundary node is excluded — it is a hub
    # touching every boundary edge (degree 264 at surface d=11 R=11,
    # which would balloon the [B, V, D] working set 25x) and gets its own
    # explicit edge-list reduction in the kernel instead.
    deg = np.zeros(V, np.int64)
    for e in range(E):
        if eu[e] != bn:
            deg[eu[e]] += 1
        if ev[e] != bn:
            deg[ev[e]] += 1
    D = int(deg[:bn].max(initial=1))
    inc_e = np.full((V, D), E, np.int32)
    other_v = np.tile(np.arange(V, dtype=np.int32)[:, None], (1, D))
    fill = np.zeros(V, np.int64)
    for e in range(E):
        for a, b in ((eu[e], ev[e]), (ev[e], eu[e])):
            if a == bn:
                continue
            inc_e[a, fill[a]] = e
            other_v[a, fill[a]] = b
            fill[a] += 1
    b_edges = np.nonzero((eu == bn) | (ev == bn))[0].astype(np.int32)
    b_other = np.where(eu[b_edges] == bn, ev[b_edges],
                       eu[b_edges]).astype(np.int32)
    lane_inc = tuple(
        jnp.asarray(np.concatenate([lane, [0]])[inc_e].astype(np.int32))
        for lane in lanes
    )
    if max_growth_rounds is None:
        # Growth is delta-stepped: each continuing round either saturates
        # at least one edge or merges clusters, so rounds are bounded by
        # E (far above any real trajectory; the loop exits as soon as no
        # cluster is active).
        max_growth_rounds = E + 1
    b_mask = np.ones(b_edges.shape[0], bool)
    if b_edges.size == 0:
        # keep the kernel shape-stable: one inert sentinel boundary slot
        b_edges = np.asarray([0], np.int32)
        b_other = np.asarray([bn], np.int32)
        b_mask = np.zeros(1, bool)

    # -- label packing: comp << L | lanes, when everything fits in 31 bits
    vbits = max(int(V - 1).bit_length(), 1)
    bits = [max(int(np.bitwise_or.reduce(lane, initial=0)).bit_length(), 1)
            for lane in lanes]
    pack_shift = None
    lane_offsets = []
    lane_masks = []
    packed_inc = packed_b = None
    stencil_graph = None
    packed_ids = list(range(len(lanes)))
    chunk_descs = []
    if spill_lanes and vbits + sum(bits) > 30:
        # keep a prefix of lanes in the packed word (lane 0 — the
        # primary observable — first), spill the rest into <=30-bit
        # chunks the full-decode kernel resolves post-convergence
        packed_ids = []
        budget = 30 - vbits
        for i, b_ in enumerate(bits):
            if b_ <= budget:
                packed_ids.append(i)
                budget -= b_
        spilled = [i for i in range(len(lanes)) if i not in packed_ids]
        cur_ids, cur_off, off = [], [], 0
        for i in spilled:
            if off + bits[i] > 30:
                chunk_descs.append((cur_ids, cur_off, off))
                cur_ids, cur_off, off = [], [], 0
            cur_ids.append(i)
            cur_off.append(off)
            off += bits[i]
        if cur_ids:
            chunk_descs.append((cur_ids, cur_off, off))
        chunk_descs = [
            (np.bitwise_or.reduce(
                np.stack([lanes[i] << o for i, o in zip(ids, offs)]),
                axis=0),
             tuple(ids), tuple(offs),
             tuple((1 << bits[i]) - 1 for i in ids))
            for ids, offs, _ in chunk_descs
        ]
    if vbits + sum(bits[i] for i in packed_ids) <= 30:
        pbits = [bits[i] for i in packed_ids]
        off = 0
        for b_ in reversed(pbits):  # lane 0 ends in the highest lane bits
            lane_offsets.append(off)
            lane_masks.append((1 << b_) - 1)
            off += b_
        lane_offsets.reverse()
        lane_masks.reverse()
        pack_shift = off
        packed_full = np.zeros(E + 1, np.int64)
        for i, o in zip(packed_ids, lane_offsets):
            packed_full[:E] |= lanes[i] << o
        packed_inc = jnp.asarray(packed_full[inc_e].astype(np.int32))
        packed_b = jnp.asarray(packed_full[b_edges].astype(np.int32))
        if stencil is None or stencil:
            stencil_graph = _build_stencil(
                eu, ev, wt, bn, V, packed_full[:E].astype(np.int32),
                chunk_descs)
            if stencil and stencil_graph is None:
                raise ValueError("graph is not stencil-eligible")
        if chunk_descs and stencil_graph is None:
            # spilled lanes are only decodable through the stencil full
            # kernel; a partial packed word would silently drop lanes in
            # the packed kernel — fall back to the unpacked layout
            pack_shift = None
            lane_offsets, lane_masks = [], []
            packed_inc = packed_b = None
            packed_ids = list(range(len(lanes)))
    elif stencil:
        raise ValueError(
            "stencil kernel requires packable label lanes "
            f"(log2(V)={vbits} + lane bits {sum(bits)} > 30)")
    return DeviceGraph(
        eu=jnp.asarray(eu),
        ev=jnp.asarray(ev),
        wt=jnp.asarray(wt),
        obs=tuple(jnp.asarray(lane.astype(np.int32)) for lane in lanes),
        inc_e=jnp.asarray(inc_e),
        other_v=jnp.asarray(other_v),
        lane_inc=lane_inc,
        b_edges=jnp.asarray(b_edges),
        b_other=jnp.asarray(b_other),
        b_mask=jnp.asarray(b_mask),
        lane_b=tuple(
            jnp.asarray(lane[b_edges].astype(np.int32)) for lane in lanes),
        num_nodes=bn,
        max_rounds=max_growth_rounds,
        pack_shift=pack_shift,
        lane_offsets=tuple(lane_offsets),
        lane_masks=tuple(lane_masks),
        packed_inc=packed_inc,
        packed_b=packed_b,
        prop_cap=prop_cap,
        act_cap=act_cap,
        stencil=stencil_graph,
        packed_lane_ids=tuple(packed_ids),
    )


def decode_labels(dg: DeviceGraph, detectors, shot_weights=None):
    """Decode a batch of detection-event vectors entirely on device.

    detectors: [B, num_nodes] 0/1 (any integer dtype). Returns
    (labels — a tuple of [B] int32 arrays, one per label lane — and
    converged [B] bool). converged is False for a shot only if the
    growth-round cap was hit or a per-round iteration cap (`prop_cap` /
    `act_cap` in `build_device_graph`) truncated its fixpoint — such
    shots must be re-decoded elsewhere (see `DeviceUFDecoder`'s host
    fallback); with default (None) caps every shot converges. Pure and
    jit-composable: embed it after a sampler so the whole pipeline
    compiles into one device program.

    ``shot_weights`` ([B, E] int32, values in [1, 2^20]) overrides the
    static growth saturations PER SHOT — device-side heralded erasure
    and analog-readout (soft) decoding. Routed to the packed/unpacked
    XLA kernels: the Mosaic stencil kernels bake weights into their
    per-offset species tables, so per-shot weights do not apply there.
    """
    if shot_weights is not None:
        if dg.pack_shift is not None and not (
                dg.stencil is not None and dg.stencil.chunks):
            return _decode_packed(dg, detectors, shot_weights)
        return _decode_unpacked(dg, detectors, shot_weights)
    if dg.stencil is not None:
        if (dg.prop_cap is None and dg.act_cap is None
                and _pallas_available()):
            from qcss_tpu.decode.device_uf_pallas import (
                decode_stencil_pallas_full, pick_tile,
            )

            st = dg.stencil
            tile = pick_tile(dg.num_nodes + 1, O=len(st.deltas),
                             KB=int(st.bmask.shape[0]),
                             NC=len(st.chunks))
            return decode_stencil_pallas_full(dg, detectors, tile=tile)
        if dg.stencil.chunks:
            # spilled lanes are resolved only by the Mosaic full kernel;
            # off-TPU, the unpacked kernel decodes every lane directly
            return _decode_unpacked(dg, detectors)
        return _decode_stencil(dg, detectors)
    if dg.pack_shift is not None:
        return _decode_packed(dg, detectors)
    return _decode_unpacked(dg, detectors)


#: set False to force the XLA stencil kernel on TPU (debug/measurement)
USE_PALLAS = True


def _pallas_available() -> bool:
    """Mosaic kernels require a real TPU backend (the CPU tests exercise
    the pallas path separately through interpret mode)."""
    if not USE_PALLAS:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover - no backend at all
        return False


def _decode_stencil(dg: DeviceGraph, detectors):
    """Shift-stencil kernel for lattice graphs (see StencilGraph): the
    per-slot static gathers of `_decode_packed` become static SHIFTS
    along the flattened detector axis — two per offset — so every step
    is contiguous-slice + elementwise, with packed labels throughout.
    The virtual boundary hub lives at column bn like the incidence
    kernel; its per-node boundary edges are dense [KB, V] slots."""
    st = dg.stencil
    dets = jnp.asarray(detectors)
    B = dets.shape[0]
    V = dg.num_nodes + 1
    bn = dg.num_nodes
    L = dg.pack_shift
    O = len(st.deltas)
    KB = st.bmask.shape[0]
    defect = jnp.concatenate(
        [dets.astype(jnp.int32) & 1, jnp.zeros((B, 1), jnp.int32)], axis=1
    )  # [B, V]
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    vids = jnp.arange(V, dtype=jnp.int32)[None, :]
    BIG = jnp.int32(2**30)

    def shift_dn(x, d, fill):
        """y[v] = x[v+d] (value of the HIGH endpoint at the low slot)."""
        pad = jnp.full((B, d), fill, x.dtype)
        return jnp.concatenate([x[:, d:], pad], axis=1)

    def shift_up(x, d, fill):
        """y[v+d] = x[v] (value of the LOW endpoint at the high slot)."""
        pad = jnp.full((B, d), fill, x.dtype)
        return jnp.concatenate([pad, x[:, :-d]], axis=1)

    def propagate(packed, satm, satb):
        def body(state):
            (packed,) = state
            cands = []
            for o, d in enumerate(st.deltas):
                offered = jnp.where(satm[o], packed ^ st.eobs[o][None, :],
                                    BIG)
                cands.append(jnp.where(
                    satm[o], shift_dn(packed, d, BIG) ^ st.eobs[o][None, :],
                    BIG))
                cands.append(shift_up(offered, d, BIG))
            hub = packed[:, bn][:, None]
            for k in range(KB):
                cands.append(jnp.where(
                    satb[k], hub ^ st.bobs[k][None, :], BIG))
            cand = reduce(jnp.minimum, cands)
            adopted = (cand >> L) < (packed >> L)
            new = jnp.where(adopted, cand, packed)
            # hub adoption: min over every saturated boundary slot
            hub_cand = reduce(jnp.minimum, [
                jnp.min(jnp.where(satb[k], packed ^ st.bobs[k][None, :],
                                  BIG), axis=1)
                for k in range(KB)
            ])
            adopted_b = (hub_cand >> L) < (new[:, bn] >> L)
            new = new.at[:, bn].set(
                jnp.where(adopted_b, hub_cand, new[:, bn]))
            return (new,), jnp.any(adopted, axis=1) | adopted_b

        (packed,), still = _capped_while(body, (packed,), dg.prop_cap)
        return packed, still

    def activity(packed, satm):
        comp = packed >> L
        cnt = jnp.zeros((B, V), jnp.int32).at[bidx, comp].add(
            defect, mode="promise_in_bounds")
        broot = comp[:, bn]
        act_root = ((cnt & 1) == 1) & (vids != broot[:, None])
        act = act_root & (comp == vids)  # defined at representatives
        passes = [satm[o] & (comp == shift_dn(comp, d, -1))
                  for o, d in enumerate(st.deltas)]

        def body(state):
            (act,) = state
            terms = [act]
            for o, d in enumerate(st.deltas):
                terms.append(shift_dn(act, d, False) & passes[o])
                terms.append(shift_up(act & passes[o], d, False))
            new = reduce(jnp.logical_or, terms)
            return (new,), jnp.any(new & ~act, axis=1)

        (act,), still = _capped_while(body, (act,), dg.act_cap)
        return act, still

    def round_cond(state):
        _, _, _, act, suspect, any_active, i = state
        return any_active & (i < dg.max_rounds)

    def round_body(state):
        packed, sup, supb, act, suspect, _, i = state
        comp = packed >> L
        incs = []
        for o, d in enumerate(st.deltas):
            growable = (st.emask[o][None, :] & (sup[:, o] < st.ewt[o])
                        & (comp != shift_dn(comp, d, -1)))
            incs.append(jnp.where(
                growable,
                act.astype(jnp.int32)
                + shift_dn(act, d, False).astype(jnp.int32), 0))
        inc = jnp.stack(incs, axis=1)  # [B, O, V]
        comp_bn = comp[:, bn][:, None]
        incb = jnp.stack([
            jnp.where(st.bmask[k][None, :] & (supb[:, k] < st.bwt[k])
                      & (comp != comp_bn), act.astype(jnp.int32), 0)
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
        satm = [(sup[:, o] >= st.ewt[o]) & st.emask[o][None, :]
                for o in range(O)]
        satb = [(supb[:, k] >= st.bwt[k]) & st.bmask[k][None, :]
                for k in range(KB)]
        packed, still_p = propagate(packed, satm, satb)
        act, still_a = activity(packed, satm)
        suspect = suspect | still_p | still_a
        act = act & ~suspect[:, None]
        return packed, sup, supb, act, suspect, jnp.any(act) & grew, i + 1

    packed0 = jnp.broadcast_to(
        (jnp.arange(V, dtype=jnp.int32) << L)[None, :], (B, V))
    sup0 = jnp.zeros((B, O, V), jnp.int32)
    supb0 = jnp.zeros((B, KB, V), jnp.int32)
    act0 = defect.astype(bool)
    suspect0 = jnp.zeros(B, bool)
    state = (packed0, sup0, supb0, act0, suspect0,
             jnp.any(act0), jnp.int32(0))
    packed, sup, supb, act, suspect, _, _ = jax.lax.while_loop(
        round_cond, round_body, state)

    bmask = jnp.int32((1 << L) - 1)
    broot = packed[:, bn] >> L
    in_bc = (packed >> L) == broot[:, None]
    bc_odd = jnp.sum(jnp.where(in_bc, defect, 0), axis=1) & 1
    masked = jnp.where(defect.astype(bool), packed & bmask, 0)
    tot = jax.lax.reduce(masked, jnp.int32(0), jax.lax.bitwise_xor, (1,))
    tot = tot ^ jnp.where(bc_odd == 1, packed[:, bn] & bmask, 0)
    labels = tuple((tot >> off) & mask
                   for off, mask in zip(dg.lane_offsets, dg.lane_masks))
    converged = ~jnp.any(act, axis=1) & ~suspect
    return labels, converged


def _capped_while(body, init, cap):
    """`lax.while_loop` whose carry is (state..., changed_shot [B],
    any_changed, k); runs `body` until nothing changed or `cap`
    iterations. Returns (state..., suspect [B]) where suspect marks
    shots still changing when the cap cut the loop (all-False when
    cap=None — the uncapped loop skips the per-shot reduction
    entirely, it costs ~8% at small graphs). `body` maps
    state -> (state, changed_shot [B])."""
    B = init[0].shape[0]

    if cap is None:
        def cond(carry):
            return carry[-1]

        def wrapped(carry):
            *state, _ = carry
            new_state, changed_shot = body(tuple(state))
            return (*new_state, jnp.any(changed_shot))

        out = jax.lax.while_loop(
            cond, wrapped, (*init, jnp.bool_(True)))
        return tuple(out[:-1]), jnp.zeros(B, bool)

    def cond(carry):
        *_, any_changed, k = carry
        return any_changed & (k < cap)

    def wrapped(carry):
        *state, _, _, k = carry
        new_state, changed_shot = body(tuple(state))
        return (*new_state, changed_shot, jnp.any(changed_shot), k + 1)

    carry = (*init, jnp.ones(B, bool), jnp.bool_(True), jnp.int32(0))
    out = jax.lax.while_loop(cond, wrapped, carry)
    *state, changed_shot, _, _ = out
    return tuple(state), changed_shot


def _decode_packed(dg: DeviceGraph, detectors, shot_weights=None):
    """Packed-label kernel: comp<<L | lanes in one int32, per-slot
    gathers tree-reduced with `jnp.minimum` (no [B, V, D]
    materialization, no argmin/one-hot — an adoption is XOR + min).
    ``shot_weights`` ([B, E] int, values >= 1) overrides the static
    growth saturations PER SHOT (heralded erasure, analog readout)."""
    dets = jnp.asarray(detectors)
    B = dets.shape[0]
    V = dg.num_nodes + 1
    E = dg.eu.shape[0]
    D = dg.inc_e.shape[1]
    bn = dg.num_nodes
    L = dg.pack_shift
    eu, ev, wt = dg.eu, dg.ev, dg.wt
    wtB = (wt[None, :] if shot_weights is None
           else jnp.asarray(shot_weights, jnp.int32))
    inc_cols = [dg.inc_e[:, j] for j in range(D)]
    other_cols = [dg.other_v[:, j] for j in range(D)]
    plab_cols = [dg.packed_inc[:, j] for j in range(D)]
    defect = jnp.concatenate(
        [dets.astype(jnp.int32) & 1, jnp.zeros((B, 1), jnp.int32)], axis=1
    )  # [B, V]
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    vids = jnp.arange(V, dtype=jnp.int32)[None, :]
    BIG = jnp.int32(2**30)
    false_col = jnp.zeros((B, 1), bool)

    def propagate(packed, satE, satB):
        def body(state):
            (packed,) = state
            cand = reduce(jnp.minimum, [
                jnp.where(satE[:, inc_cols[j]],
                          packed[:, other_cols[j]] ^ plab_cols[j][None, :],
                          BIG)
                for j in range(D)
            ])
            # Adopt only on STRICT comp improvement: an equal-comp
            # candidate with smaller parity bits must not win, or paths
            # keep churning toward the min-parity path and propagation
            # depth balloons (measured: 21% of shots still changing at
            # iteration 16 with plain packed min, <1% with this rule).
            adopted = (cand >> L) < (packed >> L)
            new = jnp.where(adopted, cand, packed)
            cand_b = jnp.min(
                jnp.where(satB, packed[:, dg.b_other] ^ dg.packed_b, BIG),
                axis=1)
            adopted_b = (cand_b >> L) < (new[:, bn] >> L)
            new = new.at[:, bn].set(
                jnp.where(adopted_b, cand_b, new[:, bn]))
            return (new,), jnp.any(adopted, axis=1) | adopted_b

        (packed,), still = _capped_while(body, (packed,), dg.prop_cap)
        return packed, still

    def activity(packed, satE, sat):
        comp = packed >> L
        cnt = jnp.zeros((B, V), jnp.int32).at[bidx, comp].add(
            defect, mode="promise_in_bounds")
        broot = comp[:, bn]
        act_root = ((cnt & 1) == 1) & (vids != broot[:, None])
        act = act_root & (comp == vids)  # defined at representatives
        same_e = comp[:, eu] == comp[:, ev]
        passE = jnp.concatenate([sat & same_e, false_col], axis=1)
        pass_cols = [passE[:, dg.inc_e[:, j]] for j in range(D)]

        def body(state):
            (act,) = state
            new = reduce(jnp.logical_or, [
                act[:, other_cols[j]] & pass_cols[j] for j in range(D)
            ], act)
            return (new,), jnp.any(new & ~act, axis=1)

        (act,), still = _capped_while(body, (act,), dg.act_cap)
        return act, still

    def round_cond(state):
        _, _, act, suspect, any_active, i = state
        return any_active & (i < dg.max_rounds)

    def round_body(state):
        packed, support, act, suspect, _, i = state
        comp_eu = packed[:, eu] >> L
        comp_ev = packed[:, ev] >> L
        au = act[:, eu].astype(jnp.int32)
        av = act[:, ev].astype(jnp.int32)
        grow = (support < wtB) & (comp_eu != comp_ev)
        inc = jnp.where(grow, au + av, 0)
        # delta-stepped growth: advance every growing edge by the
        # per-shot minimum number of unit rounds until SOME edge
        # saturates (identical trajectory — no merge can occur strictly
        # between saturations — in O(#merges) rounds)
        slack = jnp.where(
            inc > 0,
            -(-(wtB - support) // jnp.maximum(inc, 1)), BIG)
        delta = jnp.maximum(jnp.min(slack, axis=1, keepdims=True), 1)
        delta = jnp.where(delta >= BIG, 1, delta)
        support = support + inc * delta
        grew = jnp.any(inc > 0)
        sat = support >= wtB
        satE = jnp.concatenate([sat, false_col], axis=1)
        satB = sat[:, dg.b_edges] & dg.b_mask[None, :]
        packed, still_p = propagate(packed, satE, satB)
        act, still_a = activity(packed, satE, sat)
        suspect = suspect | still_p | still_a
        # Freeze truncated shots: their labels are garbage anyway (the
        # host fallback re-decodes them) and letting them keep growing
        # would gate the batch on garbage trajectories.
        act = act & ~suspect[:, None]
        return packed, support, act, suspect, jnp.any(act) & grew, i + 1

    packed0 = jnp.broadcast_to(
        (jnp.arange(V, dtype=jnp.int32) << L)[None, :], (B, V))
    support0 = jnp.zeros((B, E), jnp.int32)
    act0 = defect.astype(bool)  # initial clusters are singletons
    suspect0 = jnp.zeros(B, bool)
    state = (packed0, support0, act0, suspect0, jnp.any(act0), jnp.int32(0))
    packed, support, act, suspect, _, _ = jax.lax.while_loop(
        round_cond, round_body, state)

    # label flip per lane: XOR of the packed lane bits over defects (bit
    # fields are disjoint, so one packed XOR-reduce covers every lane),
    # plus one defect-to-boundary path per odd (necessarily
    # boundary-containing) cluster — all elementwise, no gathers.
    bmask = jnp.int32((1 << L) - 1)
    broot = packed[:, bn] >> L
    in_bc = (packed >> L) == broot[:, None]
    bc_odd = jnp.sum(jnp.where(in_bc, defect, 0), axis=1) & 1
    masked = jnp.where(defect.astype(bool), packed & bmask, 0)
    tot = jax.lax.reduce(masked, jnp.int32(0), jax.lax.bitwise_xor, (1,))
    tot = tot ^ jnp.where(bc_odd == 1, packed[:, bn] & bmask, 0)
    labels = tuple((tot >> off) & mask
                   for off, mask in zip(dg.lane_offsets, dg.lane_masks))
    converged = ~jnp.any(act, axis=1) & ~suspect
    return labels, converged


def _decode_unpacked(dg: DeviceGraph, detectors, shot_weights=None):
    """Generic kernel for wide label lanes (e.g. the streaming decoder's
    multi-lane carry): separate [B, V] parity array per lane, adoptions
    select their delivering edge by argmin + one-hot so all lanes travel
    one consistent path. ``shot_weights`` ([B, E] int, values >= 1)
    overrides the static growth saturations per shot."""
    dets = jnp.asarray(detectors)
    B = dets.shape[0]
    V = dg.num_nodes + 1
    E = dg.eu.shape[0]
    D = dg.inc_e.shape[1]
    bn = dg.num_nodes
    eu, ev, wt = dg.eu, dg.ev, dg.wt
    wtB = (wt[None, :] if shot_weights is None
           else jnp.asarray(shot_weights, jnp.int32))
    n_lanes = len(dg.obs)
    inc_flat = dg.inc_e.reshape(-1)      # [V*D] static
    other_flat = dg.other_v.reshape(-1)  # [V*D] static
    defect = jnp.concatenate(
        [dets.astype(jnp.int32) & 1, jnp.zeros((B, 1), jnp.int32)], axis=1
    )  # [B, V]
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    vids = jnp.arange(V, dtype=jnp.int32)[None, :]
    BIG = jnp.int32(2**30)
    iota_d = jnp.arange(D, dtype=jnp.int32)[None, None, :]

    def gatherD(x):
        """[B, V] -> [B, V, D] via the static incidence table."""
        return x[:, other_flat].reshape(B, V, D)

    def propagate(comp, cpar, sat, satD):
        satB = sat[:, dg.b_edges] & dg.b_mask[None, :]  # [B, Eb]
        iota_b = jnp.arange(dg.b_edges.shape[0], dtype=jnp.int32)[None, :]

        def body(state):
            comp, cpar = state
            other = gatherD(comp)
            cand = jnp.where(satD, other, BIG)
            best = jnp.min(cand, axis=2)
            new = jnp.minimum(comp, best)
            adopted = new < comp
            oh = (jnp.argmin(cand, axis=2).astype(jnp.int32)[:, :, None]
                  == iota_d)
            new_par = []
            for qlane, lab in zip(cpar, dg.lane_inc):
                val = jnp.sum(
                    jnp.where(oh, gatherD(qlane) ^ lab[None, :, :], 0),
                    axis=2)
                new_par.append(jnp.where(adopted, val, qlane))
            # boundary hub: same adoption over its explicit edge list
            cand_b = jnp.where(satB, comp[:, dg.b_other], BIG)  # [B, Eb]
            best_b = jnp.min(cand_b, axis=1)
            cur_b = new[:, bn]
            adopted_b = best_b < cur_b
            oh_b = (jnp.argmin(cand_b, axis=1).astype(jnp.int32)[:, None]
                    == iota_b)
            new = new.at[:, bn].set(jnp.minimum(cur_b, best_b))
            out_par = []
            for qlane, lab_b in zip(new_par, dg.lane_b):
                val_b = jnp.sum(
                    jnp.where(oh_b, qlane[:, dg.b_other] ^ lab_b[None, :], 0),
                    axis=1)
                out_par.append(qlane.at[:, bn].set(
                    jnp.where(adopted_b, val_b, qlane[:, bn])))
            return ((new, tuple(out_par)),
                    jnp.any(adopted, axis=1) | adopted_b)

        (comp, cpar), still = _capped_while(
            body, (comp, cpar), dg.prop_cap)
        return comp, cpar, still

    def activity(comp, satD):
        """Per-node activity: member of a cluster with odd defect parity
        not containing the boundary. One dynamic scatter-add (counts at
        representative positions) + static propagation back down."""
        cnt = jnp.zeros((B, V), jnp.int32).at[bidx, comp].add(
            defect, mode="promise_in_bounds")
        broot = comp[:, bn]
        act_root = ((cnt & 1) == 1) & (vids != broot[:, None])
        act = act_root & (comp == vids)  # defined at representatives
        sameD = gatherD(comp) == comp[:, :, None]
        passD = satD & sameD

        def body(state):
            (act,) = state
            new = act | jnp.any(gatherD(act) & passD, axis=2)
            return (act | new,), jnp.any(new & ~act, axis=1)

        (act,), still = _capped_while(body, (act,), dg.act_cap)
        return act, still

    def round_cond(state):
        _, _, _, _, suspect, any_active, i = state
        return any_active & (i < dg.max_rounds)

    def round_body(state):
        comp, cpar, support, act, suspect, _, i = state
        au = act[:, eu].astype(jnp.int32)
        av = act[:, ev].astype(jnp.int32)
        grow = (support < wtB) & (comp[:, eu] != comp[:, ev])
        inc = jnp.where(grow, au + av, 0)
        slack = jnp.where(
            inc > 0,
            -(-(wtB - support) // jnp.maximum(inc, 1)), BIG)
        delta = jnp.maximum(jnp.min(slack, axis=1, keepdims=True), 1)
        delta = jnp.where(delta >= BIG, 1, delta)
        support = support + inc * delta
        grew = jnp.any(inc > 0)
        sat = (support >= wtB)
        satD = jnp.concatenate(
            [sat, jnp.zeros((B, 1), bool)], axis=1
        )[:, inc_flat].reshape(B, V, D)
        comp, cpar, still_p = propagate(comp, cpar, sat, satD)
        act, still_a = activity(comp, satD)
        suspect = suspect | still_p | still_a
        act = act & ~suspect[:, None]
        return (comp, cpar, support, act, suspect,
                jnp.any(act) & grew, i + 1)

    comp0 = jnp.broadcast_to(
        jnp.arange(V, dtype=jnp.int32)[None, :], (B, V))
    cpar0 = tuple(jnp.zeros((B, V), jnp.int32) for _ in range(n_lanes))
    support0 = jnp.zeros((B, E), jnp.int32)
    act0 = defect.astype(bool)  # initial clusters are singletons
    suspect0 = jnp.zeros(B, bool)
    state = (comp0, cpar0, support0, act0, suspect0,
             jnp.any(act0), jnp.int32(0))
    comp, cpar, support, act, suspect, _, _ = jax.lax.while_loop(
        round_cond, round_body, state)

    # label flip per lane: XOR of cpar over defects, plus one
    # defect-to-boundary path per odd (necessarily boundary-containing)
    # cluster — all elementwise reductions, no gathers.
    broot = comp[:, bn]
    in_bc = comp == broot[:, None]
    bc_odd = jnp.sum(jnp.where(in_bc, defect, 0), axis=1) & 1
    labels = []
    for qlane in cpar:
        masked = jnp.where(defect.astype(bool), qlane, 0)
        tot = jax.lax.reduce(masked, jnp.int32(0), jax.lax.bitwise_xor, (1,))
        labels.append(tot ^ jnp.where(bc_odd == 1, qlane[:, bn], 0))
    converged = ~jnp.any(act, axis=1) & ~suspect
    return tuple(labels), converged


def decode_obs(dg: DeviceGraph, detectors,
               shot_weights=None) -> tuple[jax.Array, jax.Array]:
    """Single-lane convenience wrapper over `decode_labels`: returns
    (obs [B] int32 observable-flip bitmasks, converged [B] bool)."""
    labels, converged = decode_labels(dg, detectors, shot_weights)
    return labels[0], converged


def make_obs_decoder(graph: MatchingGraph,
                     max_growth_rounds: int | None = None,
                     prop_cap: int | None = None,
                     act_cap: int | None = None):
    """A pure, jit-composable ``decode(detectors) -> (obs, converged)``
    closure over the given graph (arrays become compile-time constants).
    With the default caps every shot converges; capped decoders report
    truncated shots via converged=False (re-decode those on the host)."""
    dg = build_device_graph(graph, max_growth_rounds,
                            prop_cap=prop_cap, act_cap=act_cap)
    return partial(decode_obs, dg)


class DeviceUFDecoder:
    """Drop-in observable-only counterpart of `uf.UFDecoder` running on
    the accelerator. `decode_batch` keeps the (corrections, obs) return
    contract with corrections=None — the device kernel computes logical
    flips without materializing corrections (see module docstring); use
    the host decoder when per-qubit corrections are required.

    Optional per-round fixpoint caps (`prop_cap`/`act_cap`) bound the
    batch to typical-case propagation depth; truncated shots are
    re-decoded by the host union-find (`host_fallback=True`) —
    bit-compatible because the host kernel is the reference the device
    kernel is tested against. The caps default OFF: measured at surface
    d=11 R=11 p=0.008, per-shot label-chain depth has a heavy tail
    (19% of shots still changing at iteration 16), so capping trades
    little device time for a lot of host work there; the fallback still
    protects the `max_growth_rounds` edge even uncapped."""

    def __init__(self, graph: MatchingGraph,
                 max_growth_rounds: int | None = None,
                 prop_cap: int | None = None,
                 act_cap: int | None = None,
                 host_fallback: bool = True):
        self.graph = graph
        self.host_fallback = host_fallback
        self._host = None
        self._decode = jax.jit(make_obs_decoder(
            graph, max_growth_rounds, prop_cap=prop_cap, act_cap=act_cap))

    def decode_batch(self, syndromes, want_corrections: bool = False,
                     shot_weights=None):
        """``shot_weights`` ([B, E] int, values in [1, 250]) overrides
        the static growth saturations per shot (heralded erasure / soft
        readout) — same contract as `uf.UFDecoder.decode_batch`; the
        host fallback re-decodes truncated shots with the same
        weights."""
        if want_corrections:
            raise ValueError(
                "DeviceUFDecoder computes observable flips only; use the "
                "host UFDecoder for per-qubit corrections")
        syndromes = np.asarray(syndromes)
        if syndromes.ndim != 2 or syndromes.shape[1] != self.graph.num_nodes:
            raise ValueError(
                f"syndromes must be [B, {self.graph.num_nodes}], "
                f"got {syndromes.shape}")
        if shot_weights is None:
            obs, converged = self._decode(jnp.asarray(syndromes))
        else:
            shot_weights = np.asarray(shot_weights)
            if shot_weights.shape != (syndromes.shape[0],
                                      self.graph.num_edges):
                raise ValueError("shot_weights must be [B, num_edges]")
            obs, converged = self._decode(
                jnp.asarray(syndromes),
                jnp.asarray(shot_weights, jnp.int32))
        obs = np.asarray(obs).astype(np.uint32)
        conv = np.asarray(converged)
        if not conv.all():
            if not self.host_fallback:
                raise RuntimeError(
                    "iteration cap hit before convergence "
                    "(host_fallback disabled)")
            from qcss_tpu.decode.uf import UFDecoder

            if self._host is None:
                self._host = UFDecoder(self.graph)
            bad = np.nonzero(~conv)[0]
            _, obs_h = self._host.decode_batch(
                syndromes[bad], want_corrections=False,
                shot_weights=None if shot_weights is None else
                np.clip(shot_weights[bad], 1, 250).astype(np.uint8))
            obs[bad] = obs_h
        return None, obs
