"""Lifted-product codes — codes/families.py::lifted_product.

Three independent anchors pin the construction:

* trivial group -> EXACTLY `hypergraph_product` (bit-identical checks);
* 1x1 base matrices over Z_l x Z_m -> EXACTLY `bivariate_bicycle`
  (bit-identical, with the adjoint's exponent negation accounted);
* 1x1 univariate (generalized bicycle): k = 2 deg gcd(a, b, x^l - 1),
  verified against an independent F2[x] gcd.
"""

import numpy as np

from qcss_tpu.codes import families


def _f2_gcd(p, q):
    """gcd of F2[x] polynomials as coefficient arrays (index = degree)."""
    p, q = np.trim_zeros(p % 2, "b"), np.trim_zeros(q % 2, "b")
    while len(q):
        # reduce p mod q
        while len(p) >= len(q) and len(p):
            shift = len(p) - len(q)
            p = p.copy()
            p[shift:] ^= q
            p = np.trim_zeros(p % 2, "b")
        p, q = q, p
    return p


def _poly(terms, l):
    out = np.zeros(l + 1, np.uint8)
    for t in terms:
        out[t % l] ^= 1
    return out


class TestAnchors:
    def test_trivial_group_is_hypergraph_product(self):
        rng = np.random.default_rng(5)
        h_a = rng.integers(0, 2, (3, 6), dtype=np.uint8)
        h_b = rng.integers(0, 2, (2, 5), dtype=np.uint8)
        h_a[0, 0] = h_b[0, 0] = 1  # avoid degenerate all-zero rows
        hgp = families.hypergraph_product(h_a, h_b)
        ring_a = [[[(0,)] if h_a[i, j] else [] for j in range(6)]
                  for i in range(3)]
        ring_b = [[[(0,)] if h_b[i, j] else [] for j in range(5)]
                  for i in range(2)]
        lp = families.lifted_product(ring_a, ring_b, (1,))
        np.testing.assert_array_equal(lp.redundant_parity_check_c1,
                                      hgp.redundant_parity_check_c1)
        np.testing.assert_array_equal(lp.redundant_parity_check_c2,
                                      hgp.redundant_parity_check_c2)
        assert lp.k == hgp.k and lp.n == hgp.n

    def test_one_by_one_is_bivariate_bicycle(self):
        """bb72: lifted_product([[A]], [[B*]], (6, 6)) must reproduce the
        BB construction bit-identically (B* = exponent-negated terms,
        because the LP adjoint transposes ring entries)."""
        a_terms = [(3, 0), (0, 1), (0, 2)]
        b_terms = [(0, 3), (1, 0), (2, 0)]
        bb = families.bb72()
        b_conj = [tuple(-x % s for x, s in zip(t, (6, 6)))
                  for t in b_terms]
        lp = families.lifted_product([[a_terms]], [[b_conj]], (6, 6))
        np.testing.assert_array_equal(lp.redundant_parity_check_c1,
                                      bb.redundant_parity_check_c1)
        np.testing.assert_array_equal(lp.redundant_parity_check_c2,
                                      bb.redundant_parity_check_c2)
        assert (lp.n, lp.k) == (72, 12)

    def test_generalized_bicycle_k_formula(self):
        """Univariate 1x1 LP (generalized bicycle over a and the ADJOINT
        of b — the LP construction places B* in H_X): k = 2 deg
        gcd(a(x), b*(x), x^l - 1), b* the exponent-negated polynomial —
        an independent analytic anchor."""
        rng = np.random.default_rng(11)
        for l in (5, 7, 9, 12):
            for _ in range(3):
                a_t = sorted(set(rng.integers(0, l, 3).tolist()))
                b_t = sorted(set(rng.integers(0, l, 3).tolist()))
                lp = families.lifted_product(
                    [[[(t,) for t in a_t]]], [[[(t,) for t in b_t]]],
                    (l,))
                xl = np.zeros(l + 1, np.uint8)
                xl[0] = xl[l] = 1
                b_conj = [(-t) % l for t in b_t]
                g = _f2_gcd(_f2_gcd(_poly(a_t, l), _poly(b_conj, l)), xl)
                k_expect = 2 * (len(g) - 1)
                assert lp.k == k_expect, (l, a_t, b_t, lp.k, k_expect)

    def test_nontrivial_lift_decodes(self):
        """A genuinely lifted (non-bicycle, non-HGP) instance: 2x3 base
        over Z_7, [[91, 19]] with d > 2 certified by brute force over
        all weight <= 2 errors (the seed is pinned to one that passes
        that certificate). BP+OSD corrects every weight-1 error at code
        capacity up to stabilizer."""
        from qcss_tpu.decode.bp import BPDecoder

        rng = np.random.default_rng(1)
        a = [[[(int(rng.integers(0, 7)),), (int(rng.integers(0, 7)),)]
              for _ in range(3)] for _ in range(2)]
        b = [[[(int(rng.integers(0, 7)),), (int(rng.integers(0, 7)),)]
              for _ in range(3)] for _ in range(2)]
        lp = families.lifted_product(a, b, (7,))
        assert lp.n == (3 * 3 + 2 * 2) * 7 and lp.k == 19
        h = lp.redundant_parity_check_c2
        dec = BPDecoder(h, 1e-2, iters=64, osd=True)
        errs = np.eye(lp.n, dtype=np.uint8)
        syn = (errs @ h.T) & 1
        e_hat, _ = dec.decode_batch(syn)
        # residual must be a stabilizer (syndrome-free and not logical)
        res = (e_hat ^ errs)
        assert not ((res @ h.T) & 1).any()
        lz = lp.z_operator_matrix()
        assert not ((res @ lz.T) & 1).any()
