"""Exact-MWPM oracle tests: correctness (weight <= t exact, boundary
pairing) and its role as union-find's accuracy yardstick."""

from itertools import combinations

import numpy as np

from qcss_tpu.codes import families
from qcss_tpu.decode.mwpm import MWPMOracle
from qcss_tpu.decode.uf import UFDecoder, graph_from_checks


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
