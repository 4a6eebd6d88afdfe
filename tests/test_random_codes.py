"""Property-based fuzzing: random k=1 CSS codes must construct, satisfy all
structural invariants, and have symplectically-verified encoding networks.

Random construction: pick a random full-rank H1; H2 rows are random
independent combinations of H1's nullspace basis (guaranteeing the duality
H1 H2^T = 0); sizes chosen so k = n - r1 - r2 = 1. This sweeps code shapes
the named families never hit (non-self-dual, ragged r1/r2 splits, dense and
sparse checks)."""

import numpy as np
import pytest

from qcss_tpu.codes import symplectic
from qcss_tpu.codes.css import CSSCode
from qcss_tpu.errors import InvalidCodeError
from qcss_tpu.ops import gf2


def random_css_pair(rng, n, r1):
    """Random (h1, h2) with H1 full rank r1, H2 full rank n-r1-1 inside
    nullspace(H1); returns None if rank conditions fail (caller retries)."""
    h1 = rng.integers(0, 2, size=(r1, n), dtype=np.uint8)
    if gf2.rank(h1) != r1:
        return None
    ns = gf2.nullspace(h1)  # (n - r1) x n
    r2 = n - r1 - 1
    for _ in range(20):
        coeffs = rng.integers(0, 2, size=(r2, ns.shape[0]), dtype=np.uint8)
        h2 = (coeffs.astype(int) @ ns.astype(int) % 2).astype(np.uint8)
        if gf2.rank(h2) == r2:
            return h1, h2
    return None


def make_random_code(seed):
    rng = np.random.default_rng(seed)
    for _ in range(50):
        n = int(rng.integers(5, 12))
        r1 = int(rng.integers(1, n - 1))
        if n - r1 - 1 < 1:
            continue
        pair = random_css_pair(rng, n, r1)
        if pair is None:
            continue
        try:
            return CSSCode(pair[0], pair[1], max_table_weight=2)
        except InvalidCodeError:
            # normalize_parity_check can hit dependent-row layouts at
            # offset > 0 even for full-rank inputs (reference behavior).
            continue
    pytest.skip("no valid random code found for this seed")


@pytest.mark.parametrize("seed", range(12))
def test_random_code_invariants(seed):
    code = make_random_code(seed)
    n, r1, r2, k = code.n, code.r_1, code.r_2, code.k
    h1 = code.parity_check_c1.astype(int)
    h2 = code.parity_check_c2.astype(int)
    assert k == 1
    # Standard forms.
    assert np.array_equal(h1[:, :r1], np.eye(r1))
    assert np.array_equal(h2[:, r1 : r1 + r2], np.eye(r2))
    # Duality survives normalization (column swaps are mirrored).
    assert not np.any((h1 @ h2.T) & 1)
    # Logical operators commute with checks and anticommute pairwise.
    xbar = code.x_operator_matrix().astype(int)
    zbar = code.z_operator_matrix().astype(int)
    assert not np.any((h1 @ zbar.T) & 1)
    assert not np.any((h2 @ xbar.T) & 1)
    assert ((xbar @ zbar.T) & 1) == 1


@pytest.mark.parametrize("seed", range(8))
def test_random_code_encoding_networks(seed):
    """|0̄⟩ and |+̄⟩ networks of random codes map the all-|0⟩ stabilizers to
    exactly the code group + the right logical operator (symplectic check,
    no simulator — the reference's verification trick generalized)."""
    code = make_random_code(100 + seed)
    n = code.n

    for plus in (False, True):
        mat = np.concatenate(
            (np.zeros((n, n), dtype=np.uint8), np.eye(n, dtype=np.uint8)), axis=1
        )
        circ = code.noisy_encode_plus() if plus else code.noisy_encode_zero()
        symplectic.transform_stabilisers(mat, circ)

        rows = []
        for i in range(code.r_1):
            row = np.zeros(2 * n, np.uint8)
            row[:n] = code.parity_check_c1[i]
            rows.append(row)
        for i in range(code.r_2):
            row = np.zeros(2 * n, np.uint8)
            row[n:] = code.parity_check_c2[i]
            rows.append(row)
        logical = np.zeros(2 * n, np.uint8)
        if plus:
            logical[:n] = code.x_operator_matrix()[0]
        else:
            logical[n:] = code.z_operator_matrix()[0]
        rows.append(logical)
        expected = np.array(rows)

        assert gf2.rank(mat) == n, (seed, plus)
        assert np.array_equal(gf2.rref(mat), gf2.rref(expected)), (seed, plus)
