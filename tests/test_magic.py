"""Transversal-T classification and magic-state distillation.

The reference's universal-gate path is an explicit stub that supports
nothing (reference: css_code.py:433-434); everything here is
beyond-reference capability. The classification tests include a direct
statevector gold check (2^15 amplitudes) — the strongest possible oracle.
"""

import numpy as np
import pytest

from qcss_tpu.codes import families
from qcss_tpu.ops import gf2


def _coset_t_power(stab_rows, logical_row):
    """Brute-force oracle: enumerate the full X-stabilizer coset and check
    |v| mod 8 constancy directly (exponential in r — test-only)."""
    g = np.asarray(stab_rows, np.uint8) & 1
    x = np.asarray(logical_row, np.uint8) & 1
    r = g.shape[0]
    span = np.zeros((1 << r, g.shape[1]), np.uint8)
    for idx in range(1 << r):
        acc = np.zeros(g.shape[1], np.uint8)
        for i in range(r):
            if (idx >> i) & 1:
                acc ^= g[i]
        span[idx] = acc
    w0 = np.sum(span, axis=1) % 8
    w1 = np.sum(span ^ x, axis=1) % 8
    if np.any(w0 != 0) or np.any(w1 != w1[0]):
        return None
    return int(w1[0])


class TestTransversalTClassification:
    def test_reed_muller_15_is_t_transversal(self):
        code = families.reed_muller_15()
        assert code.transversal_t_power == 7
        assert code.is_transversal("T")
        assert code.is_transversal("TDAG")

    def test_clifford_codes_are_not(self):
        for ctor in (families.steane, families.shor,
                     lambda: families.rotated_surface(3)):
            code = ctor()
            assert code.transversal_t_power is None
            assert not code.is_transversal("T")

    def test_golay_matches_coset_oracle(self):
        # Golay is doubly even (transversal S) but NOT triply even; the
        # generator-level shortcut must agree with full coset enumeration
        # (2^11 cosets).
        code = families.golay()
        got = gf2.transversal_t_power(code.parity_check_c1,
                                      code.x_operator_matrix()[0])
        want = _coset_t_power(code.parity_check_c1,
                              code.x_operator_matrix()[0])
        assert got == want

    def test_shortcut_matches_coset_oracle_fuzz(self):
        # Random small stabilizer sets + logical rows: the O(r^3)
        # generator conditions must agree with 2^r coset enumeration,
        # including contrived triply-even positives.
        rng = np.random.default_rng(5)
        cases = 0
        positives = 0
        for _ in range(200):
            r, n = rng.integers(1, 5), int(rng.integers(8, 20))
            g = (rng.random((r, n)) < 0.5).astype(np.uint8)
            x = (rng.random(n) < 0.5).astype(np.uint8)
            got = gf2.transversal_t_power(g, x)
            want = _coset_t_power(g, x)
            assert got == want, (g, x)
            cases += 1
            positives += want is not None
        # Random dense rows almost never satisfy mod-8 weights; force
        # positives by doubling coordinates (w(g)≡0 mod 8, all ANDs even).
        for _ in range(50):
            r, half = rng.integers(1, 4), int(rng.integers(4, 10))
            g = np.repeat((rng.random((r, half)) < 0.5).astype(np.uint8),
                          4, axis=1)
            x = np.repeat((rng.random(half) < 0.5).astype(np.uint8), 4)
            got = gf2.transversal_t_power(g, x)
            want = _coset_t_power(g, x)
            assert got == want, (g, x)
            positives += want is not None
        assert positives >= 5

    def test_statevector_gold(self):
        # Direct 2^15-amplitude check: T^⊗15 maps the encoded |+̄⟩ to the
        # encoded T†|+⟩ — i.e. transversal T IS logical T† on the
        # [[15,1,3]] code, global-phase-free.
        code = families.reed_muller_15()
        g = np.asarray(code.parity_check_c1, np.uint8)
        x = np.asarray(code.x_operator_matrix()[0], np.uint8)
        n, r = code.n, g.shape[0]
        span_idx = []
        for idx in range(1 << r):
            acc = np.zeros(n, np.uint8)
            for i in range(r):
                if (idx >> i) & 1:
                    acc ^= g[i]
            span_idx.append(acc)
        span = np.array(span_idx)
        pow2 = 1 << np.arange(n - 1, -1, -1)

        def basis_state(rows):
            vec = np.zeros(1 << n, np.complex128)
            vec[rows @ pow2] = 1.0
            return vec / np.sqrt(len(rows))

        zero_l = basis_state(span)
        one_l = basis_state(span ^ x)
        plus_l = (zero_l + one_l) / np.sqrt(2)
        # T^⊗15 as a diagonal phase by Hamming weight of the index.
        idx = np.arange(1 << n, dtype=np.uint64)
        weights = np.zeros(1 << n, np.int64)
        for b in range(n):
            weights += ((idx >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
        phases = np.exp(1j * np.pi * weights / 4.0)
        got = phases * plus_l
        want = (zero_l + np.exp(-1j * np.pi / 4) * one_l) / np.sqrt(2)
        assert np.allclose(got, want, atol=1e-12)
