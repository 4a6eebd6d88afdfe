"""Exact minimum-weight perfect matching — the accuracy oracle.

Union-find trades a few percent of accuracy for near-linear time. To
QUANTIFY that trade, this module decodes by exact MWPM on small defect
sets: all-pairs shortest paths over the weighted matching graph (Dijkstra)
plus an exact minimum-weight matching with a boundary option via bitmask
dynamic programming — O(2^k · k) for k defects, practical for k ≲ 18,
which covers essentially every shot at the low error rates where decoder
accuracy matters.

This is an evaluation tool, not a production decoder: shots whose defect
count exceeds the limit are skipped (reported separately). Production
decoding is `decode.uf`; benchmark comparisons live in
tests/test_mwpm.py and benchmarks/uf_bench.py.

(No reference counterpart of any kind — the reference's decoding is a
dense LUT, css_code.py:649-735.)
"""

from __future__ import annotations

import heapq

import numpy as np

from qcss_tpu.decode.uf import MatchingGraph


class MWPMOracle:
    """Exact matching decoder over a `MatchingGraph` (same graph objects
    as `UFDecoder`, weights included)."""

    def __init__(self, graph: MatchingGraph, max_defects: int = 16):
        self.graph = graph
        self.max_defects = max_defects
        self._adj = self._build_adjacency()
        # lazily cached single-source results: node -> (dist[], par[])
        self._sssp_cache: dict[int, tuple[np.ndarray, np.ndarray, float, int]] = {}

    def _build_adjacency(self):
        g = self.graph
        adj: list[list[tuple[int, int, int, int]]] = [
            [] for _ in range(g.num_nodes + 1)
        ]
        B = g.num_nodes
        for e in range(g.num_edges):
            u = int(g.edges[e, 0])
            v = int(g.edges[e, 1])
            a = B if u < 0 else u
            b = B if v < 0 else v
            w = int(g.edge_weight[e])
            obs = int(g.edge_obs[e])
            adj[a].append((b, w, obs, e))
            adj[b].append((a, w, obs, e))
        return adj

    def _sssp(self, src: int):
        """Dijkstra from src: (dist, obs-parity-of-shortest-path) arrays
        over all vertices incl. the boundary (index num_nodes)."""
        cached = self._sssp_cache.get(src)
        if cached is not None:
            return cached
        nv = self.graph.num_nodes + 1
        dist = np.full(nv, np.inf)
        par = np.zeros(nv, dtype=np.uint32)
        dist[src] = 0.0
        pq = [(0.0, src)]
        while pq:
            d, v = heapq.heappop(pq)
            if d > dist[v]:
                continue
            for w_vert, w_cost, obs, _ in self._adj[v]:
                nd = d + w_cost
                if nd < dist[w_vert]:
                    dist[w_vert] = nd
                    par[w_vert] = par[v] ^ obs
                    heapq.heappush(pq, (nd, w_vert))
        out = (dist, par)
        self._sssp_cache[src] = out
        return out

    def decode_one(self, syn: np.ndarray):
        """Returns (obs_flips, ok). ok=False if the defect count exceeds
        max_defects (shot skipped)."""
        defects = np.nonzero(np.asarray(syn) & 1)[0]
        k = len(defects)
        if k == 0:
            return 0, True
        if k > self.max_defects:
            return 0, False
        B = self.graph.num_nodes
        dists = np.empty((k, k))
        pars = np.zeros((k, k), dtype=np.uint32)
        bdist = np.empty(k)
        bpar = np.zeros(k, dtype=np.uint32)
        for i, d_i in enumerate(defects):
            dist, par = self._sssp(int(d_i))
            for j, d_j in enumerate(defects):
                dists[i, j] = dist[d_j]
                pars[i, j] = par[d_j]
            bdist[i] = dist[B]
            bpar[i] = par[B]

        # bitmask DP over defects: pair the lowest set bit with the
        # boundary or with another defect
        memo_cost: dict[int, float] = {0: 0.0}
        memo_par: dict[int, int] = {0: 0}

        def solve(mask: int):
            if mask in memo_cost:
                return memo_cost[mask], memo_par[mask]
            i = (mask & -mask).bit_length() - 1
            rest = mask & ~(1 << i)
            # boundary option
            c, p = solve(rest)
            best = bdist[i] + c
            best_par = int(bpar[i]) ^ p
            # pair with another defect
            m = rest
            while m:
                j = (m & -m).bit_length() - 1
                m &= m - 1
                c, p = solve(rest & ~(1 << j))
                cand = dists[i, j] + c
                if cand < best:
                    best = cand
                    best_par = int(pars[i, j]) ^ p
            memo_cost[mask] = best
            memo_par[mask] = best_par
            return best, best_par

        _, par = solve((1 << k) - 1)
        return par, True

    def decode_batch(self, syndromes: np.ndarray):
        """Returns (obs [B] uint32, ok [B] bool)."""
        syndromes = np.asarray(syndromes)
        obs = np.zeros(syndromes.shape[0], dtype=np.uint32)
        ok = np.ones(syndromes.shape[0], dtype=bool)
        for b in range(syndromes.shape[0]):
            obs[b], ok[b] = self.decode_one(syndromes[b])
        return obs, ok
