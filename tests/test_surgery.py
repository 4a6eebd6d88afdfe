"""Lattice surgery (XX merge): model exactness, fault coverage, physics.

The strongest oracle here is the statevector gold test: the merge's
m-combination (derived by GF(2) solving, `surgery.build_xx_merge`) is
checked against a 2^21-amplitude simulation of the actual projective
stabilizer measurements — m must equal the X̄_A X̄_B eigenvalue on every
random measurement branch. No reference analogue exists (the reference
has no multi-patch machinery at all)."""

import numpy as np
import pytest

from qcss_tpu.codes import families
from qcss_tpu.experiments import surgery


class TestModel:
    def test_build_d3(self):
        model = surgery.build_xx_merge(3, 3, 3)
        # every fault detectable or observable-trivial, weight <= 2
        wts = model.F.sum(axis=0)
        assert wts.max() <= 2
        assert not np.any((wts == 0) & model.obs.any(axis=0))
        # both observables are hit by some fault
        assert model.obs[0].any() and model.obs[1].any()

    def test_quiet_run_is_exact(self):
        out = surgery.xx_merge_memory(3, 0.0, 0.0, batch=128, seed=0)
        assert out["m_fail"] == 0.0 and out["logical_fail"] == 0.0

    def test_every_single_fault_decodes_exactly(self):
        # inject each fault alone: its detector signature must decode to
        # its own observable effect (single faults are weight-1 chains —
        # any failure means graph/observable bookkeeping is broken)
        from qcss_tpu.decode.uf import UFDecoder

        model = surgery.build_xx_merge(3, 2, 2)
        dec = UFDecoder(model.graph)
        dets = model.F.T.astype(np.uint8)           # [n_faults, D]
        _, corr = dec.decode_batch(dets, want_corrections=False)
        m_fail = (model.obs[0] ^ (corr & 1)) == 1
        l_fail = (model.obs[1] ^ ((corr >> 1) & 1)) == 1
        assert not m_fail.any(), np.nonzero(m_fail)[0][:10]
        assert not l_fail.any(), np.nonzero(l_fail)[0][:10]

    def test_weighted_graph_runs(self):
        out = surgery.xx_merge_memory(3, 5e-3, 2e-2, batch=2048, seed=3,
                                      weighted=True)
        assert 0.0 <= out["word_fail"] < 0.2


class TestStatevectorGold:
    def _plus_bar(self, hx, xbar, n):
        """|+̄⟩ = uniform superposition over rowspace(hx ∪ xbar)."""
        rows = np.vstack([hx, xbar])
        span = np.zeros((1, n), np.uint8)
        for row in rows:
            new = span ^ row
            both = np.vstack([span, new])
            span = np.unique(both, axis=0)
        pow2 = (1 << np.arange(n)).astype(np.int64)
        psi = np.zeros(1 << n, np.complex128)
        psi[span.astype(np.int64) @ pow2] = 1.0
        return psi / np.linalg.norm(psi)

    def _measure_x_op(self, psi, support, n, rng):
        """Projectively measure the X-type operator on `support`;
        returns (outcome bit, collapsed state)."""
        pow2 = (1 << np.arange(n)).astype(np.int64)
        mask = int(np.asarray(support, np.int64) @ pow2)
        idx = np.arange(psi.size, dtype=np.int64)
        s_psi = psi[idx ^ mask]
        plus = (psi + s_psi) / 2.0
        p_plus = float(np.vdot(plus, plus).real)
        if rng.random() < p_plus:
            out, branch, norm = 0, plus, np.sqrt(p_plus)
        else:
            out, branch, norm = 1, (psi - s_psi) / 2.0, np.sqrt(1 - p_plus)
        return out, branch / norm

    @pytest.mark.parametrize("flip_a", [0, 1])
    def test_m_combination_measures_xx(self, flip_a):
        d = 3
        rows, cols = d, 2 * d + 1
        n = rows * cols
        hx_p, _ = families.surface_rect_checks(d, d)

        def embed(small, off):
            big = np.zeros((small.shape[0], n), np.uint8)
            sm = small.reshape(-1, d, d)
            for r in range(d):
                big[:, r * cols + off: r * cols + off + d] = sm[:, r, :]
            return big

        hx_A, hx_B = embed(hx_p, 0), embed(hx_p, d + 1)

        def col_op(c):
            v = np.zeros(n, np.uint8)
            v[[r * cols + c for r in range(rows)]] = 1
            return v

        def row_op(r, c0, c1):
            v = np.zeros(n, np.uint8)
            v[[r * cols + c for c in range(c0, c1)]] = 1
            return v

        # |+̄⟩_A |+⟩_seam |+̄⟩_B as one big superposition: rowspace of
        # (A's X group, B's X group, seam single-qubit X's)
        seam_x = np.zeros((rows, n), np.uint8)
        for i, r in enumerate(range(rows)):
            seam_x[i, r * cols + d] = 1
        gens = np.vstack([hx_A, col_op(d - 1)[None, :],
                          hx_B, col_op(d + 1)[None, :], seam_x])
        psi = self._plus_bar(gens[:-1], gens[-1], n)
        if flip_a:
            # apply Z̄_A: flips X̄_A's eigenvalue, so m must read 1
            zbar_a = row_op(0, 0, d)
            pow2 = (1 << np.arange(n)).astype(np.int64)
            idx = np.arange(psi.size, dtype=np.int64)
            signs = np.ones(psi.size)
            for q in np.nonzero(zbar_a)[0]:
                signs *= 1 - 2.0 * ((idx >> int(q)) & 1)
            psi = psi * signs

        model = surgery.build_xx_merge(d, 2, 2)
        hx_M, _ = families.surface_rect_checks(rows, cols)
        # recompute the m combination exactly as the builder does
        ab_mask = np.ones(n, np.uint8)
        ab_mask[[r * cols + d for r in range(rows)]] = 0
        hx_split = np.vstack([hx_A, hx_B])
        system = np.vstack([hx_M * ab_mask[None, :], hx_split])
        target = ((col_op(d - 1) ^ col_op(d + 1)) & ab_mask)
        u = surgery._solve_gf2(system, target)
        u_merged, u_split = u[: hx_M.shape[0]], u[hx_M.shape[0]:]
        # noiseless split outcomes are all +1, so u_split contributes 0
        for seed in range(3):
            rng = np.random.default_rng(seed)
            state = psi.copy()
            outs = np.zeros(hx_M.shape[0], np.uint8)
            for c in range(hx_M.shape[0]):
                outs[c], state = self._measure_x_op(state, hx_M[c], n, rng)
            m = int(u_merged.astype(np.int64) @ outs.astype(np.int64)) & 1
            assert m == flip_a, (seed, outs)


class TestMergeSplitCycle:
    def test_quiet_and_single_faults(self):
        from qcss_tpu.decode.uf import UFDecoder

        model = surgery.build_xx_merge_split(3, 2, 3, 2)
        out = surgery.xx_merge_split_memory(3, 0.0, 0.0, batch=64)
        assert out["word_fail"] == 0.0
        dec = UFDecoder(model.graph)
        _, corr = dec.decode_batch(model.F.T.astype(np.uint8),
                                   want_corrections=False)
        for i in range(3):
            assert not ((model.obs[i] ^ ((corr >> i) & 1)) == 1).any()

    def test_two_merged_rounds_refused(self):
        with pytest.raises(ValueError):
            surgery.build_xx_merge_split(3, 2, 2, 2)

    @pytest.mark.parametrize("flip_a", [0, 1])
    def test_statevector_gold_full_cycle(self, flip_a):
        """Simulate the ENTIRE cycle projectively (2^21 amplitudes,
        random measurement branches): every detector the builder defines
        must be 0 noiselessly, m must equal the prepared X̄_A eigenvalue
        flip, and the final per-patch logicals must read back exactly."""
        d = 3
        rows, cols = d, 2 * d + 1
        n = rows * cols
        R1, R2, R3 = 2, 3, 2
        hx_p, _ = families.surface_rect_checks(d, d)

        def embed(small, off):
            big = np.zeros((small.shape[0], n), np.uint8)
            sm = small.reshape(-1, d, d)
            for r in range(d):
                big[:, r * cols + off: r * cols + off + d] = sm[:, r, :]
            return big

        hx_A, hx_B = embed(hx_p, 0), embed(hx_p, d + 1)
        hx_split = np.vstack([hx_A, hx_B])
        hx_M, _ = families.surface_rect_checks(rows, cols)

        def col_op(c):
            v = np.zeros(n, np.uint8)
            v[[r * cols + c for r in range(rows)]] = 1
            return v

        seam = [r * cols + d for r in range(rows)]
        seam_x = np.zeros((rows, n), np.uint8)
        for i, qb in enumerate(seam):
            seam_x[i, qb] = 1
        gens = np.vstack([hx_A, col_op(d - 1)[None, :],
                          hx_B, col_op(d + 1)[None, :], seam_x])
        gold = TestStatevectorGold()
        psi0 = gold._plus_bar(gens[:-1], gens[-1], n)
        if flip_a:
            zbar_a = np.zeros(n, np.uint8)
            zbar_a[[0 * cols + c for c in range(d)]] = 1
            idx = np.arange(psi0.size, dtype=np.int64)
            signs = np.ones(psi0.size)
            for qb in np.nonzero(zbar_a)[0]:
                signs *= 1 - 2.0 * ((idx >> int(qb)) & 1)
            psi0 = psi0 * signs

        ab_mask = np.ones(n, np.uint8)
        ab_mask[seam] = 0
        partner = np.full(hx_M.shape[0], -1, np.int64)
        for i in range(hx_M.shape[0]):
            restr = hx_M[i] & ab_mask
            hits = np.nonzero((hx_split == restr[None, :]).all(axis=1))[0]
            if hits.size == 1 and restr.any():
                partner[i] = hits[0]
        keep = partner >= 0
        system = np.vstack([hx_M * ab_mask[None, :], hx_split])
        target = ((col_op(d - 1) ^ col_op(d + 1)) & ab_mask)
        u = surgery._solve_gf2(system, target)
        u_m, u_s = u[: hx_M.shape[0]], u[hx_M.shape[0]:]

        def measure_z(psi, qb, rng):
            mask = ((np.arange(psi.size, dtype=np.int64) >> int(qb)) & 1)
            p1 = float(np.sum(np.abs(psi[mask == 1]) ** 2))
            out = int(rng.random() < p1)
            branch = np.where(mask == out, psi, 0)
            return out, branch / np.linalg.norm(branch)

        for seed in range(2):
            rng = np.random.default_rng(seed)
            psi = psi0.copy()
            o_s1 = np.zeros((R1, hx_split.shape[0]), np.uint8)
            for t in range(R1):
                for c in range(hx_split.shape[0]):
                    o_s1[t, c], psi = gold._measure_x_op(
                        psi, hx_split[c], n, rng)
            o_m = np.zeros((R2, hx_M.shape[0]), np.uint8)
            for t in range(R2):
                for c in range(hx_M.shape[0]):
                    o_m[t, c], psi = gold._measure_x_op(psi, hx_M[c], n, rng)
            for qb in seam:                      # split: seam out in Z
                _, psi = measure_z(psi, qb, rng)
            o_s2 = np.zeros((R3, hx_split.shape[0]), np.uint8)
            for t in range(R3):
                for c in range(hx_split.shape[0]):
                    o_s2[t, c], psi = gold._measure_x_op(
                        psi, hx_split[c], n, rng)
            # final: every check again (perfect readout slice) + logicals
            fin = np.zeros(hx_split.shape[0], np.uint8)
            for c in range(hx_split.shape[0]):
                fin[c], psi = gold._measure_x_op(psi, hx_split[c], n, rng)
            xa, psi = gold._measure_x_op(psi, col_op(0), n, rng)
            xb, psi = gold._measure_x_op(psi, col_op(d + 1), n, rng)

            # detectors exactly as the builder defines them
            assert not o_s1[0].any()             # deterministic |+̄⟩ prep
            assert not (o_s1[1:] ^ o_s1[:-1]).any()
            assert not (o_m[0, keep] ^ o_s1[-1, partner[keep]]).any()
            assert not (o_m[1:] ^ o_m[:-1]).any()
            back = np.full(hx_split.shape[0], -1, np.int64)
            back[partner[keep]] = np.nonzero(keep)[0]
            assert not (o_s2[0] ^ o_m[-1, back]).any()
            assert not (o_s2[1:] ^ o_s2[:-1]).any()
            assert not (fin ^ o_s2[-1]).any()
            m = (int(u_m.astype(np.int64) @ o_m[0])
                 ^ int(u_s.astype(np.int64) @ o_s1[-1])) & 1
            assert m == flip_a
            assert xa == flip_a and xb == 0


class TestSuppression:
    def test_d5_beats_d3(self):
        p = 4e-3
        o3 = surgery.xx_merge_memory(3, p, batch=1 << 13, seed=5)
        o5 = surgery.xx_merge_memory(5, p, batch=1 << 13, seed=6)
        assert o5["word_fail"] < o3["word_fail"]
        # crude CI sanity: d=3 must actually fail sometimes at this p
        assert o3["word_fail"] > 0
