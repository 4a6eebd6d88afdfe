"""Simulator-free verification of encoding networks by symplectic
conjugation (reference: test/test_css_code.py:61-106, css_code.py:737-781)."""

import numpy as np
import pytest

from qcss_tpu.codes import families, symplectic
from qcss_tpu.circuits.ir import Circuit


@pytest.fixture(scope="module")
def steane():
    return families.steane()


def all_zero_stabilisers(n):
    """Check matrix of the |0>^n state: [0 | I]."""
    return np.concatenate(
        (np.zeros((n, n), dtype=np.uint8), np.eye(n, dtype=np.uint8)), axis=1
    )


class TestNoisyEncodeZero:
    def test_steane_golden(self, steane):
        # Mirrors reference: test/test_css_code.py:61-85.
        n = 7
        circ = steane.noisy_encode_zero(range(n))
        mat = all_zero_stabilisers(n)
        # Multiply some generators to match the expected basis exactly.
        for i in range(3):
            if steane.parity_check_c2[i, 6] == 1:
                mat[3 + i, :] ^= mat[6, :]

        symplectic.transform_stabilisers(mat, circ)

        expected = np.zeros((n, 2 * n), dtype=np.uint8)
        expected[0:3, 0:7] = steane.parity_check_c1
        expected[3:6, 7:14] = steane.parity_check_c2
        expected[6, 7:10] = steane.parity_check_c1[:, 6]
        expected[6, 13] = 1
        assert np.array_equal(mat, expected)


class TestNoisyEncodePlus:
    def test_steane_golden(self, steane):
        # Mirrors reference: test/test_css_code.py:87-106.
        n = 7
        circ = steane.noisy_encode_plus(range(n))
        mat = all_zero_stabilisers(n)

        symplectic.transform_stabilisers(mat, circ)

        expected = np.zeros((n, 2 * n), dtype=np.uint8)
        expected[0:3, 0:7] = steane.parity_check_c1
        expected[3:6, 7:14] = steane.parity_check_c2
        expected[6, 3:6] = steane.parity_check_c2[:, 6]
        expected[6, 6] = 1
        assert np.array_equal(mat, expected)


class TestGenericInvariant:
    """For every code family: the encoding network must map |0>^n stabilizers
    to a group containing the code stabilizers plus the appropriate logical
    operator — checked by rank/membership rather than an exact basis."""

    @pytest.mark.parametrize(
        "make",
        [families.steane, families.shor, families.reed_muller_15,
         lambda: families.rotated_surface(3)],
        ids=["steane", "shor", "rm15", "surface3"],
    )
    def test_zero_state_stabilised_by_code(self, make):
        from qcss_tpu.ops import gf2

        code = make()
        n = code.n
        mat = all_zero_stabilisers(n)
        symplectic.transform_stabilisers(mat, code.noisy_encode_zero())

        # Expected group generators: X checks on X side, Z checks on Z side,
        # logical Z̄ (state is |0̄⟩).
        expected_rows = []
        for i in range(code.r_1):
            row = np.zeros(2 * n, dtype=np.uint8)
            row[:n] = code.parity_check_c1[i]
            expected_rows.append(row)
        for i in range(code.r_2):
            row = np.zeros(2 * n, dtype=np.uint8)
            row[n:] = code.parity_check_c2[i]
            expected_rows.append(row)
        zbar = np.zeros(2 * n, dtype=np.uint8)
        zbar[n:] = code.z_operator_matrix()[0]
        expected_rows.append(zbar)
        expected = np.array(expected_rows)

        # Same row space over GF(2).
        assert gf2.rank(mat) == n
        assert np.array_equal(gf2.rref(mat), gf2.rref(expected))

    @pytest.mark.parametrize(
        "make",
        [families.steane, families.shor, families.reed_muller_15,
         lambda: families.rotated_surface(3)],
        ids=["steane", "shor", "rm15", "surface3"],
    )
    def test_plus_state_stabilised_by_code(self, make):
        from qcss_tpu.ops import gf2

        code = make()
        n = code.n
        mat = all_zero_stabilisers(n)
        symplectic.transform_stabilisers(mat, code.noisy_encode_plus())

        expected_rows = []
        for i in range(code.r_1):
            row = np.zeros(2 * n, dtype=np.uint8)
            row[:n] = code.parity_check_c1[i]
            expected_rows.append(row)
        for i in range(code.r_2):
            row = np.zeros(2 * n, dtype=np.uint8)
            row[n:] = code.parity_check_c2[i]
            expected_rows.append(row)
        xbar = np.zeros(2 * n, dtype=np.uint8)
        xbar[:n] = code.x_operator_matrix()[0]
        expected_rows.append(xbar)
        expected = np.array(expected_rows)

        assert gf2.rank(mat) == n
        assert np.array_equal(gf2.rref(mat), gf2.rref(expected))


class TestDepthOptimize:
    """`encoding.depth_optimize`: commuting-gate reorder used by the FT
    executor's prep networks (idle noise is charged per layer, so prep
    depth is a fault-tolerance cost)."""

    @pytest.mark.parametrize(
        "make",
        [families.steane, families.golay,
         lambda: families.rotated_surface(5),
         lambda: families.triangular_color(5)],
        ids=["steane", "golay", "surface5", "color5"],
    )
    def test_state_identical_and_shallower(self, make):
        import jax

        from qcss_tpu.circuits.encoding import depth_optimize
        from qcss_tpu.ftqc.schedule import circuit_depth
        from qcss_tpu.sim import tableau as tb

        code = make()
        for build in (code.noisy_encode_zero, code.noisy_encode_plus):
            circ = build()
            opt = depth_optimize(circ)
            # same multiset of gates, strictly shallower schedule
            assert sorted((g.name, g.qubits) for g in circ) == \
                sorted((g.name, g.qubits) for g in opt)
            assert (circuit_depth(opt.to_arrays())
                    < circuit_depth(circ.to_arrays()))
            # identical output tableau (state equality incl. signs)
            t0 = tb.run_circuit(tb.zero_state(1, code.n), circ)
            t1 = tb.run_circuit(tb.zero_state(1, code.n), opt)
            for f0, f1 in zip(jax.tree_util.tree_leaves(t0),
                              jax.tree_util.tree_leaves(t1)):
                assert (np.asarray(f0) == np.asarray(f1)).all()

    def test_non_commuting_order_preserved(self):
        from qcss_tpu.circuits.encoding import depth_optimize

        # H then CNOT on the same qubit must not swap.
        circ = Circuit().h(0).cnot(0, 1).cnot(1, 2)
        opt = depth_optimize(circ)
        names = [(g.name, g.qubits) for g in opt]
        assert names.index(("H", (0,))) < names.index(("CNOT", (0, 1)))
        assert (names.index(("CNOT", (0, 1)))
                < names.index(("CNOT", (1, 2))))

    def test_shared_control_parallelized(self):
        from qcss_tpu.circuits.encoding import depth_optimize
        from qcss_tpu.ftqc.schedule import circuit_depth

        # Row-serial emission of a 2x2 biclique ASAP-schedules to depth 3
        # (target 3 waits for target-2's layer); edge coloring gives 2.
        circ = (Circuit().cnot(0, 2).cnot(0, 3)
                .cnot(1, 2).cnot(1, 3))
        assert circuit_depth(circ.to_arrays()) == 3
        assert circuit_depth(depth_optimize(circ).to_arrays()) == 2


class TestConjugationRules:
    def test_h_swaps_xz(self):
        mat = np.array([[1, 0, 0, 0], [0, 0, 1, 0]], dtype=np.uint8)  # X0, Z0
        symplectic.transform_stabilisers(mat, Circuit().h(0))
        assert np.array_equal(mat, [[0, 0, 1, 0], [1, 0, 0, 0]])

    def test_h_rejects_y(self):
        mat = np.array([[1, 0, 1, 0]], dtype=np.uint8)  # Y0
        with pytest.raises(NotImplementedError):
            symplectic.transform_stabilisers(mat, Circuit().h(0))

    def test_cnot_propagation(self):
        # X on control propagates to target.
        mat = np.array([[1, 0, 0, 0]], dtype=np.uint8)
        symplectic.transform_stabilisers(mat, Circuit().cnot(0, 1))
        assert np.array_equal(mat, [[1, 1, 0, 0]])
        # Z on target propagates to control.
        mat = np.array([[0, 0, 0, 1]], dtype=np.uint8)
        symplectic.transform_stabilisers(mat, Circuit().cnot(0, 1))
        assert np.array_equal(mat, [[0, 0, 1, 1]])

    def test_rejects_unsupported_gate(self):
        mat = np.zeros((1, 4), dtype=np.uint8)
        with pytest.raises(ValueError):
            symplectic.transform_stabilisers(mat, Circuit().s(0))

    def test_rejects_out_of_range(self):
        mat = np.zeros((1, 4), dtype=np.uint8)
        with pytest.raises(ValueError):
            symplectic.transform_stabilisers(mat, Circuit().h(5))
