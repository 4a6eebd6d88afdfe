"""Batched classical primitive tests — semantics of the reference's
quil_classical module, checked against numpy (the reference checks its
emitted instruction streams against numpy on the QVM —
reference: test/test_quil_classical.py:15-113)."""

import jax.numpy as jnp
import numpy as np
import pytest

from qcss_tpu.decode import classical


class TestMatmulBits:
    def test_random_vs_numpy(self):
        # reference: test/test_quil_classical.py:15-40 (random 20x10 matmul)
        rng = np.random.default_rng(0)
        mat = rng.integers(0, 2, size=(20, 10), dtype=np.uint8)
        vecs = rng.integers(0, 2, size=(64, 10), dtype=np.uint8)
        got = np.asarray(classical.matmul_bits(mat, jnp.asarray(vecs)))
        want = (vecs.astype(int) @ mat.T.astype(int)) & 1
        assert np.array_equal(got, want)


class TestStringMatch:
    def test_truth_table(self):
        # reference: test/test_quil_classical.py:42-71
        pattern = np.array([1, 0, 1], np.uint8)
        vecs = np.array(
            [[1, 0, 1], [0, 0, 1], [1, 0, 0], [1, 1, 1], [0, 0, 0]], np.uint8
        )
        got = np.asarray(classical.string_match(jnp.asarray(vecs), pattern))
        assert np.array_equal(got, [1, 0, 0, 0, 0])


class TestConditionalXor:
    def test_flag_set_and_unset(self):
        # reference: test/test_quil_classical.py (conditional_xor semantics)
        vecs = np.array([[1, 1, 0], [1, 1, 0]], np.uint8)
        pattern = np.array([0, 1, 1], np.uint8)
        flags = np.array([1, 0], np.uint8)
        got = np.asarray(
            classical.conditional_xor(jnp.asarray(vecs), pattern, jnp.asarray(flags))
        )
        assert np.array_equal(got, [[1, 0, 1], [1, 1, 0]])


class TestMajorityVote:
    def test_truth_table(self):
        # reference: test/test_quil_classical.py:73-106
        bits = np.array(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [1, 1, 1], [0, 1, 0]], np.uint8
        )
        got = np.asarray(classical.majority_vote(jnp.asarray(bits)))
        assert np.array_equal(got, [0, 0, 1, 1, 0])

    def test_even_length_rejected(self):
        with pytest.raises(ValueError):
            classical.majority_vote(jnp.zeros((3, 4), jnp.uint8))

    def test_five_way(self):
        bits = np.array([[1, 1, 1, 0, 0], [1, 0, 1, 0, 0]], np.uint8)
        got = np.asarray(classical.majority_vote(jnp.asarray(bits)))
        assert np.array_equal(got, [1, 0])


class TestQECCInterface:
    def test_csscode_implements_qecc(self):
        from qcss_tpu.codes import QECC, families

        code = families.steane()
        assert isinstance(code, QECC)
        assert (code.n, code.k, code.t) == (7, 1, 1)
