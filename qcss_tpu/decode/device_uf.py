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
TPU's memory system — three designs were measured on a v5e to get here:

1. pointer-jumping DSU: per-shot dynamic gathers (``take_along_axis``)
   cost ~31.6 ms each on [4096, 721] — 20x any other primitive — DOA;
2. min-label propagation with scatter-min hooks: static-index scatters
   serialize per column on TPU and scale superlinearly in batch;
3. THIS version: min-label propagation over PADDED INCIDENCE ARRAYS —
   each node's <= D incident edges are static [V, D] tables, so one
   propagation step is a static gather to [B, V, D] plus dense
   min/argmin/one-hot reductions. No scatters except one per growth
   round (the cluster-parity scatter-add, measured cheap), no dynamic
   gathers at all.)

Per shot the state is

* ``comp [B, V]``  — cluster labels over detectors + one virtual boundary
  node (index V-1): min vertex id in the cluster after propagation;
* ``cpar`` — a tuple of [B, V] int32 parity-label lanes: the XOR of edge
  labels along a graph path from the node to its cluster representative
  (lane 0 = the logical observable; extra lanes carry auxiliary labels,
  e.g. the streaming decoder's commit metadata). Label adoptions select
  ONE delivering edge by argmin + one-hot, so all lanes travel one
  consistent path and lane widths are unconstrained;
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
cluster's label flip is the XOR of ``cpar`` over its defects — plus one
defect-to-boundary path when its defect count is odd (only boundary
clusters end odd). On any error of weight <= t this coincides exactly
with the host peeler's answer (tested exhaustively); on heavier errors
the two differ only by in-cluster cycles.
"""

from __future__ import annotations

from functools import partial
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
    [V, D] edge-label table of ``inc_e``."""

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


def build_device_graph(graph: MatchingGraph,
                       max_growth_rounds: int | None = None,
                       extra_lanes: tuple = ()) -> DeviceGraph:
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
    )


def decode_labels(dg: DeviceGraph, detectors):
    """Decode a batch of detection-event vectors entirely on device.

    detectors: [B, num_nodes] 0/1 (any integer dtype). Returns
    (labels — a tuple of [B] int32 arrays, one per label lane — and
    converged [B] bool, False only if the growth cap was hit, which
    cannot happen below the default cap). Pure and jit-composable: embed
    it after a sampler so the whole pipeline compiles into one device
    program.
    """
    dets = jnp.asarray(detectors)
    B = dets.shape[0]
    V = dg.num_nodes + 1
    E = dg.eu.shape[0]
    D = dg.inc_e.shape[1]
    bn = dg.num_nodes
    eu, ev, wt = dg.eu, dg.ev, dg.wt
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
        """Min-label propagation to fixpoint over saturated edges,
        carrying every parity lane along the argmin edge (one consistent
        path per adoption). The boundary hub adopts through its own
        static edge list (excluded from the padded tables — see
        `build_device_graph`). satD: [B, V, D] saturated-incident mask."""
        satB = sat[:, dg.b_edges] & dg.b_mask[None, :]  # [B, Eb]
        iota_b = jnp.arange(dg.b_edges.shape[0], dtype=jnp.int32)[None, :]

        def cond(s):
            return s[2]

        def body(s):
            comp, cpar, _ = s
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
            return new, tuple(out_par), jnp.any(adopted) | jnp.any(adopted_b)

        comp, cpar, _ = jax.lax.while_loop(
            cond, body, (comp, cpar, jnp.bool_(True)))
        return comp, cpar

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

        def cond(s):
            return s[1]

        def body(s):
            act, _ = s
            new = act | jnp.any(gatherD(act) & passD, axis=2)
            return new, jnp.any(new & ~act)

        act, _ = jax.lax.while_loop(cond, body, (act, jnp.bool_(True)))
        return act

    def round_cond(state):
        _, _, _, _, any_active, i = state
        return any_active & (i < dg.max_rounds)

    def round_body(state):
        comp, cpar, support, act, _, i = state
        au = act[:, eu].astype(jnp.int32)
        av = act[:, ev].astype(jnp.int32)
        grow = (support < wt[None, :]) & (comp[:, eu] != comp[:, ev])
        inc = jnp.where(grow, au + av, 0)
        # delta-stepped growth: advance every growing edge by the
        # per-shot minimum number of unit rounds until SOME edge
        # saturates (identical trajectory — no merge can occur strictly
        # between saturations — in O(#merges) rounds)
        slack = jnp.where(
            inc > 0,
            -(-(wt[None, :] - support) // jnp.maximum(inc, 1)), BIG)
        delta = jnp.maximum(jnp.min(slack, axis=1, keepdims=True), 1)
        delta = jnp.where(delta >= BIG, 1, delta)
        support = support + inc * delta
        grew = jnp.any(inc > 0)
        sat = (support >= wt[None, :])
        satD = jnp.concatenate(
            [sat, jnp.zeros((B, 1), bool)], axis=1
        )[:, inc_flat].reshape(B, V, D)
        comp, cpar = propagate(comp, cpar, sat, satD)
        act = activity(comp, satD)
        return comp, cpar, support, act, jnp.any(act) & grew, i + 1

    comp0 = jnp.broadcast_to(
        jnp.arange(V, dtype=jnp.int32)[None, :], (B, V))
    cpar0 = tuple(jnp.zeros((B, V), jnp.int32) for _ in range(n_lanes))
    support0 = jnp.zeros((B, E), jnp.int32)
    act0 = defect.astype(bool)  # initial clusters are singletons
    state = (comp0, cpar0, support0, act0, jnp.any(act0), jnp.int32(0))
    comp, cpar, support, act, _, _ = jax.lax.while_loop(
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
    converged = ~jnp.any(act, axis=1)
    return tuple(labels), converged


def decode_obs(dg: DeviceGraph, detectors) -> tuple[jax.Array, jax.Array]:
    """Single-lane convenience wrapper over `decode_labels`: returns
    (obs [B] int32 observable-flip bitmasks, converged [B] bool)."""
    labels, converged = decode_labels(dg, detectors)
    return labels[0], converged


def make_obs_decoder(graph: MatchingGraph,
                     max_growth_rounds: int | None = None):
    """A pure, jit-composable ``decode(detectors) -> (obs, converged)``
    closure over the given graph (arrays become compile-time constants)."""
    dg = build_device_graph(graph, max_growth_rounds)
    return partial(decode_obs, dg)


class DeviceUFDecoder:
    """Drop-in observable-only counterpart of `uf.UFDecoder` running on
    the accelerator. `decode_batch` keeps the (corrections, obs) return
    contract with corrections=None — the device kernel computes logical
    flips without materializing corrections (see module docstring); use
    the host decoder when per-qubit corrections are required."""

    def __init__(self, graph: MatchingGraph,
                 max_growth_rounds: int | None = None):
        self.graph = graph
        self._decode = jax.jit(make_obs_decoder(graph, max_growth_rounds))

    def decode_batch(self, syndromes, want_corrections: bool = False):
        if want_corrections:
            raise ValueError(
                "DeviceUFDecoder computes observable flips only; use the "
                "host UFDecoder for per-qubit corrections")
        syndromes = jnp.asarray(syndromes)
        if syndromes.ndim != 2 or syndromes.shape[1] != self.graph.num_nodes:
            raise ValueError(
                f"syndromes must be [B, {self.graph.num_nodes}], "
                f"got {syndromes.shape}")
        obs, converged = self._decode(syndromes)
        obs = np.asarray(obs).astype(np.uint32)
        if not bool(np.asarray(jnp.all(converged))):
            raise RuntimeError("growth-round cap hit before convergence")
        return None, obs
