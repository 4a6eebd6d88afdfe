"""Native (C++) kernel tests: exact equivalence against the pure-Python
GF(2) paths, plus fallback behavior."""

import numpy as np
import pytest

from qcss_tpu import native
from qcss_tpu.ops import gf2


requires_native = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def _python_syndrome_table(mat, max_weight=None):
    orig = gf2._native_table
    gf2._native_table = lambda *a, **k: None
    try:
        return gf2.syndrome_table(mat, max_weight)
    finally:
        gf2._native_table = orig


def _python_min_weight_table(mat, max_weight):
    orig = gf2._native_table
    gf2._native_table = lambda *a, **k: None
    try:
        return gf2.min_weight_table(mat, max_weight)
    finally:
        gf2._native_table = orig


@requires_native
class TestEquivalence:
    def test_syndrome_table_fuzz(self):
        rng = np.random.default_rng(7)
        for _ in range(30):
            r, n = rng.integers(1, 5), rng.integers(4, 11)
            mat = rng.integers(0, 2, size=(r, n), dtype=np.uint8)
            t_py, tab_py = _python_syndrome_table(mat)
            t_nat, tab_nat = gf2.syndrome_table(mat)
            assert t_py == t_nat
            assert set(tab_py) == set(tab_nat)
            for k in tab_py:
                assert np.array_equal(tab_py[k], tab_nat[k])

    def test_min_weight_table_fuzz(self):
        rng = np.random.default_rng(8)
        for _ in range(20):
            r, n = rng.integers(2, 6), rng.integers(5, 12)
            mat = rng.integers(0, 2, size=(r, n), dtype=np.uint8)
            py = _python_min_weight_table(mat, 3)
            nat = gf2.min_weight_table(mat, 3)
            assert set(py) == set(nat)
            for k in py:
                assert np.array_equal(py[k], nat[k])

    def test_max_weight_cap(self):
        h = np.eye(4, dtype=np.uint8)
        t, table = gf2.syndrome_table(h, max_weight=1)
        assert t == 1 and len(table) == 5

    def test_rref_native_matches(self):
        rng = np.random.default_rng(9)
        for _ in range(30):
            mat = rng.integers(0, 2, size=(rng.integers(1, 8), rng.integers(1, 70)),
                               dtype=np.uint8)
            out = native.rref_native(mat)
            assert out is not None
            got, rank = out
            assert np.array_equal(got, gf2.rref(mat))
            assert rank == gf2.rank(mat)


@requires_native
class TestScaling:
    def test_surface_d5_table(self):
        from qcss_tpu.codes.families import rotated_surface

        code = rotated_surface(5)
        table = gf2.min_weight_table(code.parity_check_c2, 3)
        # Every syndrome of weight <= 2 errors must be present and decode to
        # an equal-or-lower-weight error.
        h = code.parity_check_c2.astype(int)
        for e in gf2.weight_w_vectors(code.n, 2):
            key = gf2.vec_to_int((h @ e) & 1)
            assert key in table
            assert table[key].sum() <= 2


class TestFallback:
    def test_python_path_still_works(self):
        # Force-fallback must give identical results (native may be absent
        # in deployment environments without a toolchain).
        h = np.array([[1, 0, 1, 1], [0, 1, 1, 0]], dtype=np.uint8)
        t1, tab1 = _python_syndrome_table(h)
        t2, tab2 = gf2.syndrome_table(h)
        assert t1 == t2
        assert set(tab1) == set(tab2)


@requires_native
class TestNativeOsd:
    def test_bit_identical_to_python_osd0(self):
        """The C++ OSD-0 kernel must reproduce BPDecoder._osd0's Python
        loop bit-for-bit (same stable column ordering, same pivot set) on
        a regime with a real unconverged tail."""
        import jax
        import jax.numpy as jnp

        from qcss_tpu import native
        from qcss_tpu.codes import families
        from qcss_tpu.decode.bp import BPDecoder, spacetime_tanner

        code = families.bb72()
        h2 = code.redundant_parity_check_c2
        tan, priors, _, _ = spacetime_tanner(h2, 4, 0.02, 0.02)
        dec = BPDecoder(tan, priors, iters=4, osd=False)
        rng = np.random.default_rng(0)
        ev = (rng.random((128, tan.shape[1])) < priors[None, :]).astype(
            np.uint8)
        syn = ((ev @ tan.T) & 1).astype(np.uint8)
        _, conv, soft = dec._run(jnp.asarray(syn))
        idx = np.nonzero(~np.asarray(conv))[0][:24]
        assert idx.size >= 8, "regime too easy for an OSD test"
        s_sub = syn[idx]
        soft_sub = np.asarray(soft)[idx]
        nat = native.osd0_batch_native(dec.h, s_sub, soft_sub)
        assert nat is not None
        import qcss_tpu.native as N

        orig = N.osd0_batch_native
        N.osd0_batch_native = lambda *a, **k: None
        try:
            py = dec._osd0(s_sub, soft_sub)
        finally:
            N.osd0_batch_native = orig
        assert (nat == py).all()
        assert (((nat.astype(np.int64) @ dec.h.T) & 1) == s_sub).all()
