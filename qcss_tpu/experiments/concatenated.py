"""Two-level concatenated memory: lattice surgery as the LOGICAL-level
error-correction layer.

Level 1 is the surface-code patch (distance d, decoded per shot by the
schedule pipeline). Level 2 treats the k data patches as the qubits of
a length-k repetition code and the compiler's non-destructive
`mzz(i, i+1)` joints as its syndrome extraction: `rounds_l` sweeps of
adjacent-pair measurements, then the final transversal readouts.

The level-2 decoding problem is EXACTLY the phenomenological
repetition-code spacetime matching this framework already solves at
level 1:

  * a level-1 logical X̄ failure on patch j that happens between sweep
    r-1 and sweep r flips every later Z̄_j readout — a SPACE edge in
    detector layer r linking checks (j-1, j) (boundary at the chain
    ends), carrying observable bit j;
  * a failed mzz joint (the ancilla's own patch-level failure) flips
    that single syndrome bit — a TIME edge between layers r and r+1;
  * a level-1 failure localized in the final readout phase flips z_j
    against the last sweep — a space edge in the closure layer.

Detectors are consecutive-sweep syndrome differences plus a closure
layer comparing the last sweep against the final readouts' pair
parities — all computed from `schedule_decoded_obs`' DEVIATION record
(fault-linear observables, so the expected syndrome is identically 0
and `x` frame ops need no special-casing). The level-2 graph is a
`MatchingGraph` decoded by the same union-find kernel as level 1.

This composition is the scalability story of surgery-based
architectures (distance in TIME at the logical level), and nothing in
the reference's one-code-block world can express it (reference:
ftqc.py:42-120 — one logical qubit, no joint measurements).
"""

from __future__ import annotations

import numpy as np

from qcss_tpu.decode.uf import MatchingGraph, UFDecoder
from qcss_tpu.experiments.logical import LogicalProgram
from qcss_tpu.experiments.patches import schedule_decoded_obs


def repetition_spacetime_graph(k: int, layers: int) -> MatchingGraph:
    """Level-2 spacetime matching graph over `k` chain patches and
    `layers` detector layers of k-1 checks each (layer L-1 is the
    closure layer). Four mechanism families, all ≤ 2 detectors:

      * space edges (layer r, patch j), obs bit j — a patch flip
        between sweeps;
      * time edges (r, i)-(r+1, i) — a failed mzz joint;
      * PAIR edges (r, i-1)-(r, i+1), obs bits {i, i+1} — a residual
        level-1 logical during the mzz(i, i+1) merge window rides the
        ancilla worldline onto BOTH endpoints (check i cancels); with
        single-detector boundary signatures at the chain ends;
      * DIAGONAL edges (r, j)-(r+1, j-1), obs bit j — a patch-j flip
        WITHIN sweep r, between its two joints (joint (j-1,j) already
        measured, joint (j,j+1) not yet).

    The families were identified empirically from the failure record
    (misdecoded shots all carried pair/diagonal signatures); they are
    the dominant correlated mechanisms the mzz schedule creates beyond
    i.i.d. patch flips. Pair/diagonal edges get weight 3 vs the
    single-mechanism 2: at the chain ends a pair flip and an end-patch
    flip share ONE detector (an irreducible k=3 degeneracy), and the
    measured frequencies favor the single mechanism ~5:1 — the weights
    encode that prior, exactly like level-1 likelihood weighting."""
    if k < 2 or layers < 1:
        raise ValueError("need k >= 2 chain qubits and >= 1 layer")
    n_checks = k - 1
    node = lambda r, i: r * n_checks + i
    edges, qub, obs, wt = [], [], [], []

    def add(a, b, mask, w):
        edges.append((a, b))
        qub.append(len(qub))
        obs.append(np.uint32(mask))
        wt.append(w)

    for r in range(layers):
        for j in range(k):
            a = node(r, j - 1) if j > 0 else -1
            b = node(r, j) if j < k - 1 else -1
            add(a, b, 1 << j, 2)
        for i in range(n_checks):          # pair flip via mzz(i, i+1)
            a = node(r, i - 1) if i > 0 else -1
            b = node(r, i + 1) if i + 1 < n_checks else -1
            add(a, b, (1 << i) | (1 << (i + 1)), 3)
    for r in range(layers - 1):
        for i in range(n_checks):
            add(node(r, i), node(r + 1, i), 0, 2)
        for j in range(1, n_checks):       # within-sweep diagonal
            add(node(r, j), node(r + 1, j - 1), 1 << j, 3)
    return MatchingGraph(
        num_nodes=layers * n_checks,
        edges=np.asarray(edges, np.int32),
        edge_qubit=np.asarray(qub, np.int32),
        edge_obs=np.asarray(obs, np.uint32),
        n_qubits=len(qub),
        edge_weight=np.asarray(wt, np.uint8))


def logical_repetition_memory(d: int, k: int, rounds_l: int, p: float,
                              q: float | None = None, *,
                              batch: int = 1 << 12, seed: int = 0,
                              use_native: bool | None = None) -> dict:
    """Run the two-level memory and decode BOTH levels.

    Returns word failure over the k data readouts with level-2
    correction applied (`word_fail_l2`) and without (`word_fail_l1` —
    the same shots, same schedule, mzz record ignored), plus the raw
    level-1 channel rates. Level 2 pays off when patch failures are
    likely over the program duration but the level-2 spacetime decode
    localizes them (d small / p high / rounds_l ample).
    """
    if k < 2 or rounds_l < 1:
        raise ValueError("need k >= 2 patches and rounds_l >= 1")
    prog = LogicalProgram(d, k)
    for _ in range(rounds_l):
        for i in range(k - 1):
            prog.mzz(i, i + 1)
    prog.measure()
    model = prog.build()
    names = model.meta["obs_names"]
    # emission order: rounds_l * (k-1) mzz rows, then z0..z{k-1}
    n_checks = k - 1
    assert names[-k:] == [f"z{i}" for i in range(k)]
    vals = schedule_decoded_obs(model, p, q, batch=batch, seed=seed,
                                use_native=use_native)
    mzz = vals[:, : rounds_l * n_checks].reshape(-1, rounds_l, n_checks)
    z = vals[:, rounds_l * n_checks:]

    # detector layers: first-sweep raw, consecutive diffs, closure vs
    # the final readouts' adjacent-pair parities
    closure = z[:, :-1] ^ z[:, 1:]
    layers = np.concatenate(
        [mzz[:, :1], mzz[:, 1:] ^ mzz[:, :-1],
         (mzz[:, -1] ^ closure)[:, None]], axis=1)
    dets = layers.reshape(len(vals), -1)

    graph = repetition_spacetime_graph(k, rounds_l + 1)
    dec = UFDecoder(graph, use_native=use_native)
    _, corr = dec.decode_batch(dets, want_corrections=False)
    corr_bits = (corr[:, None] >> np.arange(k)[None, :]) & 1
    z_corrected = z ^ corr_bits.astype(np.uint8)

    return {
        "d": d, "k": k, "rounds_l": rounds_l,
        "p": float(p), "q": float(p if q is None else q),
        "samples": len(vals),
        "grid_qubits": prog.n,
        "word_fail_l1": float(z.any(axis=1).mean()),
        "word_fail_l2": float(z_corrected.any(axis=1).mean()),
        "mean_z_fail_l1": float(z.mean()),
        "mean_z_fail_l2": float(z_corrected.mean()),
        "mzz_flip_rate": float(mzz.mean()),
    }
