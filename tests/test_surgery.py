"""Lattice surgery (XX merge): model exactness, fault coverage, physics.

The strongest oracle here is the statevector gold test: the merge's
m-combination (derived by GF(2) solving, `surgery.build_xx_merge`) is
checked against a 2^21-amplitude simulation of the actual projective
stabilizer measurements — m must equal the X̄_A X̄_B eigenvalue on every
random measurement branch. No reference analogue exists (the reference
has no multi-patch machinery at all)."""

import os

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


class TestSurgeryCnot:
    def test_quiet_and_single_faults(self):
        from qcss_tpu.decode.uf import UFDecoder

        model = surgery.build_surgery_cnot(3, 3)
        dec = UFDecoder(model.graph)
        _, corr = dec.decode_batch(model.F.T.astype(np.uint8),
                                   want_corrections=False)
        for i in range(2):
            assert not ((model.obs[i] ^ ((corr >> i) & 1)) == 1).any()
        out = surgery.surgery_cnot_memory(3, 0.0, batch=64)
        assert out["word_fail"] == 0.0

    @pytest.mark.parametrize("zc_in,zt_in", [
        (1, 0),                                   # control propagation —
        # the interesting row; the other three (~3 min each of tableau
        # round-trips) run with QCSS_SLOW_TESTS=1
        pytest.param(0, 0, marks=pytest.mark.skipif(
            not os.environ.get("QCSS_SLOW_TESTS"),
            reason="slow tableau gold; set QCSS_SLOW_TESTS=1")),
        pytest.param(0, 1, marks=pytest.mark.skipif(
            not os.environ.get("QCSS_SLOW_TESTS"),
            reason="slow tableau gold; set QCSS_SLOW_TESTS=1")),
        pytest.param(1, 1, marks=pytest.mark.skipif(
            not os.environ.get("QCSS_SLOW_TESTS"),
            reason="slow tableau gold; set QCSS_SLOW_TESTS=1")),
    ])
    def test_tableau_gold_truth_table(self, zc_in, zt_in):
        """Run the ENTIRE surgery CNOT on the tableau engine (49 qubits +
        ancilla, real projective stabilizer measurements with random
        branches): every detector the builder defines must be 0
        noiselessly, Z̄_C must pass through, and Z̄_T ⊕ m1 ⊕ M_A ⊕ z_seam
        must equal Z̄_T^in ⊕ Z̄_C^in — the CNOT truth table, all four
        inputs."""
        import jax

        from qcss_tpu.ops import gf2
        from qcss_tpu.sim import tableau as tb

        d, R = 3, 3
        G = 2 * d + 1
        n = G * G
        anc = n
        hx_p, hz_p = families.surface_rect_checks(d, d)

        def embed(small, r0, c0, sr, sc):
            big = np.zeros((small.shape[0], n), np.uint8)
            sm = small.reshape(-1, sr, sc)
            for r in range(sr):
                big[:, (r + r0) * G + c0: (r + r0) * G + c0 + sc] = sm[:, r, :]
            return big

        hz_C = embed(hz_p, 0, 0, d, d)
        hz_A = embed(hz_p, d + 1, 0, d, d)
        hz_T = embed(hz_p, d + 1, d + 1, d, d)
        hx_C = embed(hx_p, 0, 0, d, d)
        hx_A = embed(hx_p, d + 1, 0, d, d)
        hx_T = embed(hx_p, d + 1, d + 1, d, d)
        hz_sep = np.vstack([hz_C, hz_A, hz_T])
        _, hz_ca_small = families.surface_rect_checks(2 * d + 1, d)
        hz_CA = np.vstack([embed(hz_ca_small, 0, 0, 2 * d + 1, d), hz_T])
        _, hz_at_small = families.surface_rect_checks(d, 2 * d + 1)
        hz_AT = np.vstack([hz_C, embed(hz_at_small, d + 1, 0, d, 2 * d + 1)])
        seam_col = [(r + d + 1) * G + d for r in range(d)]

        def row_op(r, c0, c1):
            v = np.zeros(n, np.uint8)
            v[[r * G + c for c in range(c0, c1)]] = 1
            return v

        def col_in_patch(r0, c):
            v = np.zeros(n, np.uint8)
            v[[(r + r0) * G + c for r in range(d)]] = 1
            return v

        mask_no_srow = np.ones(n, np.uint8)
        mask_no_srow[[d * G + c for c in range(d)]] = 0
        system = np.vstack([hz_CA * mask_no_srow[None, :], hz_sep])
        target = ((row_op(d - 1, 0, d) ^ row_op(d + 1, 0, d)) & mask_no_srow)
        u = surgery._solve_gf2(system, target)
        u_m, u_s = u[: hz_CA.shape[0]], u[hz_CA.shape[0]:]

        key_box = [jax.random.key(97 + zc_in * 2 + zt_in)]

        def nk():
            key_box[0], k = jax.random.split(key_box[0])
            return k

        t = tb.zero_state(1, n + 1)

        def meas_qubits(t, qubits):
            t, outs = tb.measure_many(t, np.asarray(qubits, np.int32), nk())
            return t, np.asarray(outs)[0]

        def meas_z_op(t, support):
            sup = np.nonzero(support)[0]
            for qb in sup:
                t = tb.apply_cnot(t, int(qb), anc)
            t, out = meas_qubits(t, [anc])
            if out[0]:
                t = tb.apply_x(t, anc)     # reset the ancilla
            return t, int(out[0])

        def solve_cols(a, b):
            """x with a @ x = b over GF(2)."""
            x = surgery._solve_gf2(a.T, b)
            assert x is not None
            return x

        # prep: project C and T into their codespaces, fix X-check signs
        # with Z-type fixups (harmless to Z̄); A -> |+̄⟩ via H + Z-check
        # projection with X-type fixups (harmless to X̄)
        for qb in [(r + d + 1) * G + c for r in range(d) for c in range(d)]:
            t = tb.apply_h(t, qb)
        for hx_patch in (hx_C, hx_T):
            outs = []
            for c in range(hx_patch.shape[0]):
                # X-check measured by H-conjugated ancilla circuit
                t = tb.apply_h(t, anc)
                for qb in np.nonzero(hx_patch[c])[0]:
                    t = tb.apply_cnot(t, anc, int(qb))
                t = tb.apply_h(t, anc)
                t, out = meas_qubits(t, [anc])
                if out[0]:
                    t = tb.apply_x(t, anc)
                outs.append(int(out[0]))
            fix = solve_cols(hx_patch, np.asarray(outs, np.uint8))
            for qb in np.nonzero(fix)[0]:
                t = tb.apply_z(t, int(qb))
        outs = []
        for c in range(hz_A.shape[0]):
            t, o = meas_z_op(t, hz_A[c])
            outs.append(o)
        fix = solve_cols(hz_A, np.asarray(outs, np.uint8))
        for qb in np.nonzero(fix)[0]:
            t = tb.apply_x(t, int(qb))
        if zc_in:
            for qb in np.nonzero(col_in_patch(0, 0))[0]:
                t = tb.apply_x(t, int(qb))
        if zt_in:
            for qb in np.nonzero(col_in_patch(d + 1, d + 1))[0]:
                t = tb.apply_x(t, int(qb))

        phases = [hz_sep, hz_CA, hz_sep, hz_AT, hz_sep]
        o_ph = []
        for ph in range(5):
            o = np.zeros((R, phases[ph].shape[0]), np.uint8)
            for tt in range(R):
                for c in range(phases[ph].shape[0]):
                    t, o[tt, c] = meas_z_op(t, phases[ph][c])
            o_ph.append(o)
            if ph == 3:
                t, sread = meas_qubits(t, seam_col)
        patch_qubits = [qb for qb in range(n)
                        if (hz_sep[:, qb].any() or hx_C[:, qb].any()
                            or hx_A[:, qb].any() or hx_T[:, qb].any())]
        t, word = meas_qubits(t, patch_qubits)
        w = np.zeros(n, np.uint8)
        w[patch_qubits] = word

        # detectors, exactly as the builder defines them
        def match(h_new, h_old, mask):
            out = np.full(h_new.shape[0], -1, np.int64)
            for i in range(h_new.shape[0]):
                restr = h_new[i] & mask
                hits = np.nonzero((h_old == restr[None, :]).all(axis=1))[0]
                if hits.size == 1 and restr.any():
                    out[i] = hits[0]
            return out

        mask_no_scol = np.ones(n, np.uint8)
        mask_no_scol[seam_col] = 0
        ca_partner = match(hz_CA, hz_sep, mask_no_srow)
        at_partner = match(hz_AT, hz_sep, mask_no_scol)
        keep1 = ca_partner >= 0
        assert not o_ph[0][0].any()
        assert not (o_ph[0][1:] ^ o_ph[0][:-1]).any()
        assert not (o_ph[1][0, keep1] ^ o_ph[0][-1, ca_partner[keep1]]).any()
        assert not (o_ph[1][1:] ^ o_ph[1][:-1]).any()
        back1 = np.full(hz_sep.shape[0], -1, np.int64)
        back1[ca_partner[keep1]] = np.nonzero(keep1)[0]
        assert not (o_ph[2][0] ^ o_ph[1][-1, back1]).any()
        assert not (o_ph[2][1:] ^ o_ph[2][:-1]).any()
        assert not (o_ph[3][0] ^ o_ph[2][-1, at_partner]).any()
        assert not (o_ph[3][1:] ^ o_ph[3][:-1]).any()
        back3 = np.full(hz_sep.shape[0], -1, np.int64)
        back3[at_partner] = np.arange(hz_AT.shape[0])
        tr = o_ph[4][0] ^ o_ph[3][-1, back3]
        for i in range(hz_AT.shape[0]):
            pair = np.nonzero(hz_AT[i][seam_col])[0]
            if pair.size:
                j = at_partner[i]
                for s in pair:
                    tr[j] ^= sread[s]
        assert not tr.any()
        assert not (o_ph[4][1:] ^ o_ph[4][:-1]).any()
        fin = (hz_sep.astype(np.int64) @ w.astype(np.int64)) & 1
        assert not (fin ^ o_ph[4][-1]).any()

        # the truth table
        m1 = (int(u_m.astype(np.int64) @ o_ph[1][0])
              ^ int(u_s.astype(np.int64) @ o_ph[0][-1])) & 1
        zc = int(row_op(0, 0, d) @ w.astype(np.int64)) & 1
        ma = int(row_op(d + 1, 0, d) @ w.astype(np.int64)) & 1
        zt = int(row_op(d + 1, d + 1, 2 * d + 1) @ w.astype(np.int64)) & 1
        assert zc == zc_in
        assert (zt ^ m1 ^ ma ^ int(sread[0])) == (zt_in ^ zc_in)


class TestSuppression:
    def test_d5_beats_d3(self):
        p = 4e-3
        o3 = surgery.xx_merge_memory(3, p, batch=1 << 13, seed=5)
        o5 = surgery.xx_merge_memory(5, p, batch=1 << 13, seed=6)
        assert o5["word_fail"] < o3["word_fail"]
        # crude CI sanity: d=3 must actually fail sometimes at this p
        assert o3["word_fail"] > 0
