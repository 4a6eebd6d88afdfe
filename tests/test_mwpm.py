"""Exact-MWPM decoding tests: the blossom matcher against brute force,
the production decoder (DP + blossom) against each other and against
exhaustive weight <= t errors, and MWPM's role as union-find's accuracy
yardstick."""

import random
from itertools import combinations

import numpy as np

from qcss_tpu.codes import families
from qcss_tpu.decode.blossom import (
    max_weight_matching,
    min_weight_perfect_matching,
)
from qcss_tpu.decode.mwpm import MWPMDecoder, MWPMOracle
from qcss_tpu.decode.uf import UFDecoder, graph_from_checks, spacetime_graph


def _surface_graph(d):
    code = families.rotated_surface(d)
    h = code.raw_parity_check_c2
    lz = code.z_operator_matrix()
    return code, h, lz, graph_from_checks(h, lz)


class TestExactness:
    def test_corrects_all_weight_t_errors_d5(self):
        code, h, lz, g = _surface_graph(5)
        oracle = MWPMOracle(g)
        errs = []
        for w in (1, 2):
            for sup in combinations(range(code.n), w):
                e = np.zeros(code.n, np.uint8)
                e[list(sup)] = 1
                errs.append(e)
        errs = np.asarray(errs)
        syn = (errs @ h.T) & 1
        obs, ok = oracle.decode_batch(syn)
        assert ok.all()
        assert ((obs & 1) == (errs @ lz[0]) % 2).all()

    def test_empty_syndrome(self):
        _, _, _, g = _surface_graph(3)
        obs, ok = MWPMOracle(g).decode_batch(np.zeros((4, g.num_nodes), np.uint8))
        assert ok.all() and (obs == 0).all()

    def test_defect_limit_skips(self):
        _, _, _, g = _surface_graph(3)
        oracle = MWPMOracle(g, max_defects=1)
        syn = np.zeros((1, g.num_nodes), np.uint8)
        syn[0, :2] = 1
        _, ok = oracle.decode_batch(syn)
        assert not ok[0]


def _brute_max_matching(n, edges, maxcard):
    """All-subsets reference: (cardinality, weight) of the best matching."""
    best_card, best_w = 0, 0
    m = len(edges)
    for mask in range(1 << m):
        used, w, card, ok = set(), 0, 0, True
        for k in range(m):
            if mask >> k & 1:
                i, j, wt = edges[k]
                if i in used or j in used:
                    ok = False
                    break
                used.add(i)
                used.add(j)
                w += wt
                card += 1
        if not ok:
            continue
        if maxcard:
            best_card, best_w = max((best_card, best_w), (card, w))
        else:
            best_w = max(best_w, w)
    return best_card, best_w


class TestBlossom:
    def test_fuzz_vs_brute_force(self):
        """Random sparse graphs with negative weights, both modes."""
        rng = random.Random(7)
        for _ in range(150):
            n = rng.randint(2, 8)
            all_pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
            pairs = rng.sample(all_pairs, rng.randint(1, min(9, len(all_pairs))))
            edges = [(i, j, rng.randint(-15, 25)) for (i, j) in pairs]
            for maxcard in (False, True):
                mate = max_weight_matching(n, edges, maxcardinality=maxcard)
                for v in range(n):
                    if mate[v] >= 0:
                        assert mate[mate[v]] == v
                w = sum(wt for (i, j, wt) in edges if mate[i] == j)
                card = sum(1 for v in range(n) if mate[v] >= 0) // 2
                bcard, bw = _brute_max_matching(n, edges, maxcard)
                if maxcard:
                    assert (card, w) == (bcard, bw)
                else:
                    assert w == bw

    def test_min_weight_perfect_on_complete_graphs(self):
        rng = random.Random(3)
        for _ in range(40):
            n = rng.choice([4, 6, 8])
            wmat = {}
            edges = []
            for i in range(n):
                for j in range(i + 1, n):
                    w = rng.randint(0, 30)
                    wmat[i, j] = w
                    edges.append((i, j, w))
            mate = min_weight_perfect_matching(n, edges)
            assert all(m >= 0 for m in mate)
            cost = sum(wmat[min(v, mate[v]), max(v, mate[v])] for v in range(n)) // 2
            # exhaustive check via the DP in MWPMDecoder-style recursion
            import itertools

            def brute(vs):
                if not vs:
                    return 0
                a = vs[0]
                return min(
                    wmat[min(a, b), max(a, b)] + brute([x for x in vs[1:] if x != b])
                    for b in vs[1:]
                )

            assert cost == brute(list(range(n)))

    def test_no_perfect_matching_raises(self):
        import pytest

        with pytest.raises(ValueError):
            # path of 4 vertices missing the middle edge cover: star K1,3
            min_weight_perfect_matching(4, [(0, 1, 1), (0, 2, 1), (0, 3, 1)])


class TestMWPMDecoder:
    def test_dp_and_blossom_agree(self):
        """Same optimal cost on both solvers for random syndromes on a
        weighted spacetime graph (the production graph shape)."""
        code = families.rotated_surface(5)
        g = spacetime_graph(
            code.raw_parity_check_c2, code.z_operator_matrix(), 5,
            p_space=2e-3, p_time=1e-2,
        )
        dec = MWPMDecoder(g)
        rng = np.random.default_rng(0)
        for _ in range(40):
            syn = np.zeros(g.num_nodes, np.uint8)
            k = int(rng.integers(1, 12))
            syn[rng.choice(g.num_nodes, size=k, replace=False)] = 1
            dg = dec._defect_graph(np.nonzero(syn)[0])
            c_dp, _, _ = dec._solve_dp(*dg)
            c_bl, _, _ = dec._solve_blossom(*dg)
            assert c_dp == c_bl

    def test_corrects_all_weight_t_errors_d7(self):
        """Exhaustive weight <= 3 on d=7 (19,649 errors) via blossom —
        beyond the LUT wall AND beyond union-find's accuracy."""
        code = families.rotated_surface(7)
        h = code.raw_parity_check_c2
        lz = code.z_operator_matrix()
        dec = MWPMDecoder(graph_from_checks(h, lz), method="blossom")
        errs = []
        for w in (1, 2, 3):
            for sup in combinations(range(code.n), w):
                e = np.zeros(code.n, np.uint8)
                e[list(sup)] = 1
                errs.append(e)
        errs = np.asarray(errs)
        syn = ((errs @ h.T) & 1).astype(np.uint8)
        _, obs = dec.decode_batch(syn, want_corrections=False)
        assert ((obs & 1) == (errs @ lz[0]) % 2).all()

    def test_corrections_close_the_syndrome(self):
        code = families.rotated_surface(5)
        h = code.raw_parity_check_c2
        lz = code.z_operator_matrix()
        g = graph_from_checks(h, lz)
        rng = np.random.default_rng(2)
        errs = (rng.random((200, code.n)) < 0.08).astype(np.uint8)
        syn = ((errs @ h.T) & 1).astype(np.uint8)
        for method in ("dp", "blossom"):
            corr, obs = MWPMDecoder(g, method=method).decode_batch(syn)
            assert not (((errs ^ corr) @ h.T) & 1).any()
            assert ((corr @ lz[0]) % 2 == (obs & 1)).all()

    def test_native_matches_python(self):
        """The C++ kernel (mwpm_decoder.cc) is a translation of the Python
        solvers; on tie-free graphs obs AND corrections must be identical
        across both DP and blossom defect-count regimes."""
        import pytest

        from qcss_tpu import native

        if not native.available():
            pytest.skip("native library unavailable")
        code = families.rotated_surface(5)
        g = spacetime_graph(
            code.raw_parity_check_c2, code.z_operator_matrix(), 5,
            p_space=2e-3, p_time=1e-2,
        )
        dnat = MWPMDecoder(g)
        dpy = MWPMDecoder(g, use_native=False)
        assert dnat._native is not None and dpy._native is None
        rng = np.random.default_rng(0)
        B = 120
        syn = np.zeros((B, g.num_nodes), np.uint8)
        for b in range(B):
            k = int(rng.integers(0, 24))  # spans DP and blossom regimes
            syn[b, rng.choice(g.num_nodes, size=k, replace=False)] = 1
        c1, o1 = dnat.decode_batch(syn)
        c2, o2 = dpy.decode_batch(syn)
        assert (o1 == o2).all()
        assert (c1 == c2).all()

    def test_native_rejects_forced_solver(self):
        import pytest

        _, _, _, g = _surface_graph(3)
        with pytest.raises(ValueError, match="auto"):
            MWPMDecoder(g, method="dp", use_native=True)

    def test_memory_experiment_integration(self):
        """decoder='mwpm' / 'dem-mwpm' run end-to-end and do not lose to
        union-find on the same shots."""
        import jax

        from qcss_tpu.experiments.memory import z_memory_experiment
        from qcss_tpu.sim.noise import NoiseModel

        code = families.rotated_surface(3)
        noise = NoiseModel(p_gate2=3e-3, p_meas=1e-2)
        out_uf = z_memory_experiment(
            code, rounds=3, noise=noise, batch=1 << 9, seed=5, decoder="uf")
        out_mw = z_memory_experiment(
            code, rounds=3, noise=noise, batch=1 << 9, seed=5, decoder="mwpm")
        out_dm = z_memory_experiment(
            code, rounds=3, noise=noise, batch=1 << 9, seed=5,
            decoder="dem-mwpm")
        assert out_mw["logical_fail"] <= out_uf["logical_fail"] + 2 / 512
        assert out_dm["logical_fail"] <= out_mw["logical_fail"] + 2 / 512


class TestAsYardstick:
    def test_mwpm_at_least_as_accurate_as_uf(self):
        """The oracle's whole purpose: exact matching lower-bounds the
        union-find failure rate (measured 2.9% vs 4.1% at d=7, p=0.06)."""
        code, h, lz, g = _surface_graph(5)
        uf = UFDecoder(g)
        oracle = MWPMOracle(g)
        rng = np.random.default_rng(1)
        B = 4000
        errs = (rng.random((B, code.n)) < 0.08).astype(np.uint8)
        syn = ((errs @ h.T) & 1).astype(np.uint8)
        par = (errs @ lz[0]) % 2
        _, uo = uf.decode_batch(syn, want_corrections=False)
        mo, ok = oracle.decode_batch(syn)
        uf_fail = np.mean((uo & 1) != par)
        mw_fail = np.mean(((mo & 1) != par)[ok])
        assert mw_fail <= uf_fail * 1.05  # exact matching can't be worse


class TestRound3Scaling:
    """Round-3 additions: defect-graph decomposition + lazy (APSP-free)
    mode for graphs past the O(V^2) memory wall."""

    def test_decomposition_preserves_exactness(self):
        """Decomposed auto solve == undecomposed DP on random shots."""
        import os
        code = families.rotated_surface(5)
        h = code.raw_parity_check_c2
        g = graph_from_checks(h, code.z_operator_matrix())
        rng = np.random.default_rng(0)
        errs = (rng.random((256, h.shape[1])) < 0.08).astype(np.uint8)
        syn = (errs @ h.T) & 1
        d_auto = MWPMDecoder(g, use_native=False)
        d_dp = MWPMDecoder(g, method="dp")
        for b in range(syn.shape[0]):
            defects = np.nonzero(syn[b] & 1)[0]
            if len(defects) == 0:
                continue
            dg = d_dp._defect_graph(defects)
            cost_dp, _, _ = d_dp._solve_dp(*dg)
            # decomposed cost must match the exact undecomposed optimum
            cost_dec = 0
            for comp in d_auto._decompose(dg[0], dg[2]):
                idx = np.asarray(comp)
                sub = (dg[0][np.ix_(idx, idx)], dg[1][np.ix_(idx, idx)],
                       dg[2][idx], dg[3][idx])
                c, _, _ = d_dp._solve_dp(*sub)
                cost_dec += c
            assert cost_dec == cost_dp, b

    def test_lazy_mode_bit_identical(self):
        """QCSS_MWPM_FORCE_LAZY handles must reproduce the APSP mode
        exactly (obs and corrections)."""
        import os
        code = families.rotated_surface(5)
        h = code.raw_parity_check_c2
        lz = code.z_operator_matrix()
        g = spacetime_graph(h, lz, 5)
        rng = np.random.default_rng(3)
        dets = (rng.random((128, g.num_nodes)) < 0.03).astype(np.uint8)
        c1, o1 = MWPMDecoder(g).decode_batch(dets)
        os.environ["QCSS_MWPM_FORCE_LAZY"] = "1"
        try:
            dec = MWPMDecoder(g)
            c2, o2 = dec.decode_batch(dets)
        finally:
            del os.environ["QCSS_MWPM_FORCE_LAZY"]
        assert np.array_equal(o1, o2)
        assert np.array_equal(c1, c2)

    def test_large_distance_within_memory(self):
        """d=23 R=23 (V=6336 > the APSP threshold) auto-selects lazy mode
        and decodes — past the round-2 memory wall."""
        code = families.rotated_surface(23)
        h = code.raw_parity_check_c2
        lz = code.z_operator_matrix()
        g = spacetime_graph(h, lz, 23)
        assert g.num_nodes > 4096
        rng = np.random.default_rng(5)
        dets = np.zeros((8, g.num_nodes), np.uint8)
        # sparse, valid detector pairs from single space faults
        for b in range(8):
            cols = rng.integers(0, g.num_edges, 4)
            for e in cols:
                for v in g.edges[e]:
                    if v >= 0:
                        dets[b, v] ^= 1
        _, obs = MWPMDecoder(g).decode_batch(dets, want_corrections=False)
        assert obs.shape == (8,)
