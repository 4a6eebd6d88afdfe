"""T gadget via lattice surgery (experiments/surgery_t.py).

The statevector golds are the physics arbiter: the gadget's merge-split
cycle is simulated projectively (2^21 amplitudes, random measurement
branches, BOTH stabilizer sectors measured every round, seam measured
out in X at the split) and every detector each sector model defines must
be zero noiselessly, m1 must equal Z̄_D Z̄_M of the prepared inputs, and
OUT must equal X̄_D X̄_M — for every input combination and branch."""

import numpy as np
import pytest

from qcss_tpu.codes import families
from qcss_tpu.experiments import surgery
from qcss_tpu.experiments import surgery_t as st


class TestModels:
    def test_quiet_and_single_faults(self):
        from qcss_tpu.decode.uf import UFDecoder

        out = st.t_gadget_memory(3, 0.0, 0.0, batch=64)
        assert out["gadget_fail"] == 0.0
        for build in (st.build_zz_merge_split,
                      st.build_merge_readout_sector):
            model = build(3, 2, 3, 2)
            dec = UFDecoder(model.graph)
            _, corr = dec.decode_batch(model.F.T.astype(np.uint8),
                                       want_corrections=False)
            for i in range(model.obs.shape[0]):
                assert not ((model.obs[i] ^ ((corr >> i) & 1)) == 1).any()

    def test_suppression_with_distance(self):
        lo = st.t_gadget_memory(3, 3e-3, batch=1 << 13, seed=2)
        hi = st.t_gadget_memory(5, 3e-3, batch=1 << 13, seed=2)
        assert hi["gadget_fail"] < lo["gadget_fail"]


def _measure_diag_op(psi, support, n, rng):
    """Measure a Z-type (diagonal) operator given by its qubit support."""
    idx = np.arange(psi.size, dtype=np.int64)
    par = np.zeros(psi.size, dtype=np.int64)
    for qb in np.nonzero(support)[0]:
        par ^= (idx >> int(qb)) & 1
    p1 = float(np.sum(np.abs(psi[par == 1]) ** 2))
    out = int(rng.random() < p1)
    branch = np.where(par == out, psi, 0)
    return out, branch / np.linalg.norm(branch)


def _run_protocol(d, R1, R2, R3, meas_x_op, rng, psi,
                  hx_split, hz_split, hx_M, hz_M, seam, n):
    """One noiseless branch of the full merge-split cycle, measuring BOTH
    stabilizer sectors every round; returns each sector's outcome
    history, the split-time seam X readout, and the final state."""
    o = {"hx_s1": [], "hz_s1": [], "hx_m": [], "hz_m": [],
         "hx_s2": [], "hz_s2": []}
    for _ in range(R1):
        oz = np.zeros(hz_split.shape[0], np.uint8)
        for c in range(hz_split.shape[0]):
            oz[c], psi = _measure_diag_op(psi, hz_split[c], n, rng)
        ox = np.zeros(hx_split.shape[0], np.uint8)
        for c in range(hx_split.shape[0]):
            ox[c], psi = meas_x_op(psi, hx_split[c], n, rng)
        o["hz_s1"].append(oz)
        o["hx_s1"].append(ox)
    for _ in range(R2):
        oz = np.zeros(hz_M.shape[0], np.uint8)
        for c in range(hz_M.shape[0]):
            oz[c], psi = _measure_diag_op(psi, hz_M[c], n, rng)
        ox = np.zeros(hx_M.shape[0], np.uint8)
        for c in range(hx_M.shape[0]):
            ox[c], psi = meas_x_op(psi, hx_M[c], n, rng)
        o["hz_m"].append(oz)
        o["hx_m"].append(ox)
    sread = np.zeros(len(seam), np.uint8)
    for i, qb in enumerate(seam):             # split: seam out in X
        sup = np.zeros(n, np.uint8)
        sup[qb] = 1
        sread[i], psi = meas_x_op(psi, sup, n, rng)
    for _ in range(R3):
        oz = np.zeros(hz_split.shape[0], np.uint8)
        for c in range(hz_split.shape[0]):
            oz[c], psi = _measure_diag_op(psi, hz_split[c], n, rng)
        ox = np.zeros(hx_split.shape[0], np.uint8)
        for c in range(hx_split.shape[0]):
            ox[c], psi = meas_x_op(psi, hx_split[c], n, rng)
        o["hz_s2"].append(oz)
        o["hx_s2"].append(ox)
    return o, sread, psi


def _geometry(d):
    rows, cols = 2 * d + 1, d
    n = rows * cols
    seam = [d * cols + c for c in range(cols)]
    hx_p, hz_p = families.surface_rect_checks(d, d)

    def embed(small, row_off):
        big = np.zeros((small.shape[0], n), np.uint8)
        sm = small.reshape(-1, d, d)
        for r in range(d):
            big[:, (r + row_off) * cols: (r + row_off) * cols + d] = sm[:, r, :]
        return big

    hx_split = np.vstack([embed(hx_p, 0), embed(hx_p, d + 1)])
    hz_split = np.vstack([embed(hz_p, 0), embed(hz_p, d + 1)])
    hx_M, hz_M = families.surface_rect_checks(rows, cols)
    patch_qubits = [q for q in range(n) if q not in seam]
    return rows, cols, n, seam, hx_split, hz_split, hx_M, hz_M, patch_qubits


class TestStatevectorGoldZSector:
    """Z-basis inputs: every Z-check detector of `build_zz_merge_split`
    zero, m1 == Z̄_D ⊕ Z̄_M of the inputs, finals read back."""

    @pytest.mark.parametrize("zd_in,zm_in", [(0, 0), (1, 0), (0, 1), (1, 1)])
    def test_gold(self, zd_in, zm_in):
        d = 3
        R1, R2, R3 = 2, 3, 2
        (rows, cols, n, seam, hx_split, hz_split, hx_M, hz_M,
         patch_qubits) = _geometry(d)
        from tests.test_surgery import TestStatevectorGold
        meas_x = TestStatevectorGold()._measure_x_op

        # |0/1 bar> patches via Z-basis product states (the first split
        # round's X checks project into the code space), seam in |+⟩:
        # patch qubits pinned (|0⟩ then X̄ flips), seam uniform
        idx = np.arange(1 << n, dtype=np.int64)
        mask_patch = 0
        for qb in patch_qubits:
            mask_patch |= 1 << int(qb)
        want = 0
        if zd_in:   # |1̄⟩_D = X̄_D |0̄⟩_D: flip the X̄_D column support
            for r in range(d):
                want ^= 1 << (r * cols + 0)
        if zm_in:
            for r in range(d):
                want ^= 1 << ((r + d + 1) * cols + 0)
        sel = (idx & mask_patch) == want
        psi = np.where(sel, 1.0 + 0j, 0.0)
        psi /= np.linalg.norm(psi)

        # m1 combination exactly as the builder solves it
        model = st.build_zz_merge_split(d, R1, R2, R3)
        ab_mask = np.ones(n, np.uint8)
        ab_mask[seam] = 0
        system = np.vstack([hz_M, hz_split])
        zbar_D = np.zeros(n, np.uint8)
        zbar_M = np.zeros(n, np.uint8)
        zbar_D[[0 * cols + c for c in range(cols)]] = 1
        zbar_M[[(d + 1) * cols + c for c in range(cols)]] = 1
        u = surgery._solve_gf2(system, (zbar_D ^ zbar_M).astype(np.uint8))
        u_m, u_s = u[: hz_M.shape[0]], u[hz_M.shape[0]:]

        for seed in range(2):
            rng = np.random.default_rng(seed)
            o, sread, psi_f = _run_protocol(
                d, R1, R2, R3, meas_x, rng, psi.copy(),
                hx_split, hz_split, hx_M, hz_M, seam, n)
            hz_s1 = np.array(o["hz_s1"])
            hz_m = np.array(o["hz_m"])
            hz_s2 = np.array(o["hz_s2"])
            # detector relations of the merge-sector model
            assert not hz_s1[0].any()
            assert not (hz_s1[1:] ^ hz_s1[:-1]).any()
            partner = st._match_partners(hz_M, hz_split, ab_mask)
            keep = partner >= 0
            assert not (hz_m[0, keep] ^ hz_s1[-1, partner[keep]]).any()
            assert not (hz_m[1:] ^ hz_m[:-1]).any()
            back = np.full(hz_split.shape[0], -1, np.int64)
            back[partner[keep]] = np.nonzero(keep)[0]
            assert not (hz_s2[0] ^ hz_m[-1, back]).any()
            assert not (hz_s2[1:] ^ hz_s2[:-1]).any()
            m1 = (int(u_m.astype(np.int64) @ hz_m[0])
                  ^ int(u_s.astype(np.int64) @ hz_s1[-1])) & 1
            assert m1 == (zd_in ^ zm_in)
            # final transversal Z readout
            fin = np.zeros(hz_split.shape[0], np.uint8)
            psi2 = psi_f
            for c in range(hz_split.shape[0]):
                fin[c], psi2 = _measure_diag_op(psi2, hz_split[c], n, rng)
            assert not (fin ^ hz_s2[-1]).any()
            zd, psi2 = _measure_diag_op(psi2, zbar_D, n, rng)
            zm, psi2 = _measure_diag_op(psi2, zbar_M, n, rng)
            assert zd == zd_in and zm == zm_in
        assert model.F.shape[0] > 0  # model built consistently


class TestStatevectorGoldXSector:
    """X-basis inputs: every X-check detector of
    `build_merge_readout_sector` zero — including the extended checks'
    merge transition and their seam-readout-closed split transition —
    and OUT == X̄_D ⊕ X̄_M of the inputs."""

    @pytest.mark.parametrize("xd_in,xm_in", [(0, 0), (1, 0), (0, 1), (1, 1)])
    def test_gold(self, xd_in, xm_in):
        d = 3
        R1, R2, R3 = 2, 3, 2
        (rows, cols, n, seam, hx_split, hz_split, hx_M, hz_M,
         patch_qubits) = _geometry(d)
        from tests.test_surgery import TestStatevectorGold
        meas_x = TestStatevectorGold()._measure_x_op

        # |+/-bar> patches as X-basis product states (the first split
        # round's Z checks project into the code space), seam in |+⟩:
        # the all-|+⟩ product state, with Z̄-type sign flips for |-̄⟩
        idx = np.arange(1 << n, dtype=np.int64)
        psi = np.ones(1 << n, dtype=complex)
        zflip = np.zeros(n, np.uint8)
        if xd_in:   # |-̄⟩_D = Z̄_D |+̄⟩_D
            zflip[[0 * cols + c for c in range(cols)]] ^= 1
        if xm_in:
            zflip[[(d + 1) * cols + c for c in range(cols)]] ^= 1
        par = np.zeros(1 << n, dtype=np.int64)
        for qb in np.nonzero(zflip)[0]:
            par ^= (idx >> int(qb)) & 1
        psi *= 1 - 2.0 * par
        psi /= np.linalg.norm(psi)

        ab_mask = np.ones(n, np.uint8)
        ab_mask[seam] = 0
        partner = st._match_partners(hx_M, hx_split, ab_mask)
        assert (partner >= 0).all()
        extended = [i for i in range(hx_M.shape[0]) if hx_M[i][seam].any()]
        xbar_D = np.zeros(n, np.uint8)
        xbar_M = np.zeros(n, np.uint8)
        xbar_D[[r * cols + 0 for r in range(d)]] = 1
        xbar_M[[(r + d + 1) * cols + 0 for r in range(d)]] = 1

        for seed in range(2):
            rng = np.random.default_rng(seed)
            o, sread, psi_f = _run_protocol(
                d, R1, R2, R3, meas_x, rng, psi.copy(),
                hx_split, hz_split, hx_M, hz_M, seam, n)
            hx_s1 = np.array(o["hx_s1"])
            hx_m = np.array(o["hx_m"])
            hx_s2 = np.array(o["hx_s2"])
            assert not hx_s1[0].any()
            assert not (hx_s1[1:] ^ hx_s1[:-1]).any()
            # merge transition: ALL checks (extended included) continue
            assert not (hx_m[0] ^ hx_s1[-1, partner]).any()
            assert not (hx_m[1:] ^ hx_m[:-1]).any()
            back = np.full(hx_split.shape[0], -1, np.int64)
            back[partner] = np.arange(hx_M.shape[0])
            tr = hx_s2[0] ^ hx_m[-1, back]
            for i in extended:
                for s in np.nonzero(hx_M[i][seam])[0]:
                    tr[partner[i]] ^= sread[s]
            assert not tr.any()
            assert not (hx_s2[1:] ^ hx_s2[:-1]).any()
            # final transversal X readout
            fin = np.zeros(hx_split.shape[0], np.uint8)
            psi2 = psi_f
            for c in range(hx_split.shape[0]):
                fin[c], psi2 = meas_x(psi2, hx_split[c], n, rng)
            assert not (fin ^ hx_s2[-1]).any()
            xd, psi2 = meas_x(psi2, xbar_D, n, rng)
            xm, psi2 = meas_x(psi2, xbar_M, n, rng)
            out = (xd ^ xm ^ int(sread[0])) & 1
            assert out == (xd_in ^ xm_in)
