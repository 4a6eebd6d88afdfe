"""CSSCode construction tests against the reference's exact results
(reference: test/test_css_code.py; golden vectors in SURVEY.md §8)."""

import numpy as np
import pytest

from qcss_tpu import CSSCode, InvalidCodeError
from qcss_tpu.codes.families import hamming_parity_check
from qcss_tpu.codes.pauli import PauliOperator


@pytest.fixture(scope="module")
def steane():
    h = hamming_parity_check(3)
    return CSSCode(h, h)


def P(n, **letters):
    """Shorthand: P(7, X=[0,3], Z=[2]) -> X0*X3*Z2 with coefficient 1."""
    mapping = {}
    for letter, sites in letters.items():
        for q in sites:
            mapping[q] = letter
    return PauliOperator.from_letters(n, mapping)


class TestConstruction:
    def test_hamming_matrix(self):
        h = hamming_parity_check(3)
        expected = np.array(
            [
                [0, 0, 0, 1, 1, 1, 1],
                [0, 1, 1, 0, 0, 1, 1],
                [1, 0, 1, 0, 1, 0, 1],
            ]
        )
        assert np.array_equal(h, expected)

    def test_parameters(self, steane):
        assert steane.n == 7
        assert steane.k == 1
        assert steane.t == 1
        assert steane.r_1 == 3 and steane.r_2 == 3

    def test_standard_forms_golden(self, steane):
        # SURVEY.md §8 golden standard forms after swaps (2,3) then (5,6).
        expected_c1 = np.array(
            [
                [1, 0, 0, 1, 1, 1, 0],
                [0, 1, 0, 1, 0, 1, 1],
                [0, 0, 1, 0, 1, 1, 1],
            ]
        )
        expected_c2 = np.array(
            [
                [1, 0, 1, 1, 0, 0, 1],
                [1, 1, 0, 0, 1, 0, 1],
                [1, 1, 1, 0, 0, 1, 0],
            ]
        )
        assert np.array_equal(steane.parity_check_c1, expected_c1)
        assert np.array_equal(steane.parity_check_c2, expected_c2)

    def test_identity_blocks(self, steane):
        # reference: test/test_css_code.py:28-30
        assert np.array_equal(steane.parity_check_c1[:, 0:3], np.eye(3))
        assert np.array_equal(steane.parity_check_c2[:, 3:6], np.eye(3))

    def test_syndrome_tables(self, steane):
        # reference: test/test_css_code.py:108-118
        assert len(steane.c1_syndromes) == 8
        assert len(steane.c2_syndromes) == 8

    def test_non_binary_rejected(self):
        h = hamming_parity_check(3).astype(int)
        bad = h.copy()
        bad[0, 0] = 2
        with pytest.raises(ValueError):
            CSSCode(bad, h)

    def test_width_mismatch_rejected(self):
        with pytest.raises(ValueError):
            CSSCode(hamming_parity_check(3), hamming_parity_check(4))

    def test_non_dual_rejected(self):
        h1 = np.array([[1, 1, 0, 0]], dtype=np.uint8)
        h2 = np.array([[1, 0, 1, 0]], dtype=np.uint8)
        with pytest.raises(ValueError):
            CSSCode(h1, h2)

    def test_k_not_one_rejected(self):
        # [4,2] code pair would give k=0
        h1 = np.array([[1, 1, 1, 1]], dtype=np.uint8)
        h2 = np.array([[1, 1, 0, 0], [0, 0, 1, 1], [1, 0, 1, 0]], dtype=np.uint8)
        with pytest.raises(InvalidCodeError):
            CSSCode(h1, h2)


class TestOperators:
    def test_stabilisers(self, steane):
        # reference: test/test_css_code.py:32-41
        expected = [
            P(7, X=[0, 3, 4, 5]),
            P(7, X=[1, 3, 5, 6]),
            P(7, X=[2, 4, 5, 6]),
            P(7, Z=[0, 2, 3, 6]),
            P(7, Z=[0, 1, 4, 6]),
            P(7, Z=[0, 1, 2, 5]),
        ]
        assert steane.stabilisers() == expected

    def test_z_operators(self, steane):
        # reference: test/test_css_code.py:43-47
        assert steane.z_operators() == [P(7, Z=[1, 2, 6])]

    def test_x_operators(self, steane):
        # reference: test/test_css_code.py:49-53
        assert steane.x_operators() == [P(7, X=[3, 4, 6])]

    def test_y_operators(self, steane):
        # reference: test/test_css_code.py:55-59
        expected = P(7, Z=[1, 2], X=[3, 4], Y=[6])
        assert steane.y_operators() == [expected]
        assert steane.y_operators()[0].coefficient == 1

    def test_operators_commute_with_stabilisers(self, steane):
        h1 = steane.parity_check_c1.astype(int)
        h2 = steane.parity_check_c2.astype(int)
        zbar = steane.z_operator_matrix().astype(int)
        xbar = steane.x_operator_matrix().astype(int)
        # Z̄ commutes with X checks; X̄ commutes with Z checks.
        assert not np.any((h1 @ zbar.T) & 1)
        assert not np.any((h2 @ xbar.T) & 1)
        # X̄ and Z̄ anticommute.
        assert np.all((xbar @ zbar.T) & 1)


class TestTransversal:
    def test_steane_gates(self, steane):
        # reference: test/test_css_code.py:23-26 — including the PHASE/S
        # alias the reference's own test stumbles over.
        for gate in ("I", "CNOT", "H", "CZ", "S", "PHASE"):
            assert steane.is_transversal(gate)
        assert not steane.is_transversal("T")

    def test_non_self_dual_code(self):
        from qcss_tpu.codes.families import shor

        code = shor()
        assert code.is_transversal("CNOT")
        assert not code.is_transversal("H")
        assert not code.is_transversal("S")


class TestPauliOperator:
    def test_multiplication_phases(self):
        x = P(1, X=[0])
        z = P(1, Z=[0])
        y = P(1, Y=[0])
        assert 1j * (x * z) == y
        assert (x * z).coefficient == -1j  # XZ = -iY

    def test_repr(self):
        assert repr(P(3, X=[0], Z=[2])) == "X0*Z2"
        assert repr(P(2, Y=[1])) == "Y1"
        assert repr(PauliOperator.identity(3)) == "I"
