"""Transversal-T classification and magic-state distillation.

The reference's universal-gate path is an explicit stub that supports
nothing (reference: css_code.py:433-434); everything here is
beyond-reference capability. The classification tests include a direct
statevector gold check (2^15 amplitudes) — the strongest possible oracle.
"""

import itertools

import numpy as np
import pytest

from qcss_tpu.codes import families
from qcss_tpu.errors import UnsupportedGateError
from qcss_tpu.ftqc import magic
from qcss_tpu.ops import gf2
from qcss_tpu.sim import noise as noise_mod


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


class TestDistillationProtocol:
    def test_enumerators_are_the_15_to_1_polynomials(self):
        # [[15,1,3]]: accepted error patterns are rowspace(H_2) (harmless,
        # 1024 words, min nonzero weight 4) and the logical coset (harmful,
        # 1024 words, 35 of weight 3 leading — the famous 35 p^3).
        # Exhaustive over all 2^11 accepted words.
        code = families.reed_muller_15()
        w0, w1 = magic.distillation_enumerators(code)
        assert w0[0] == 1 and not np.any(w0[1:4])
        assert not np.any(w1[:3]) and w1[3] == 35
        assert w0.sum() == w1.sum() == 1 << (code.n - code.k - code.r_1)

    def test_exact_map_small_p_asymptotics(self):
        for p in (1e-3, 1e-4):
            r = magic.distill_exact(p)
            assert abs(r["p_out"] / (35 * p**3) - 1) < 20 * p
            assert abs(r["p_accept"] - (1 - 15 * p)) < 120 * p * p
        # Exact acceptance identity at p = 1/2: every pattern equally
        # likely, so p_accept = 2^{r_2+1} / 2^n exactly.
        r = magic.distill_exact(0.5)
        code = families.reed_muller_15()
        assert abs(r["p_accept"] - 2.0 ** (code.r_2 + 1 - code.n)) < 1e-15

    def test_mc_matches_exact(self):
        p = 0.02
        want = magic.distill_exact(p)
        got = magic.distill_mc(p, 1 << 20, seed=11)
        assert abs(got["p_accept"] - want["p_accept"]) < 3e-3
        # ~2.7e-4 expected; Poisson tolerance on ~290 expected failures.
        assert abs(got["p_out"] / want["p_out"] - 1) < 0.35

    def test_cascade_squares_down(self):
        levels = magic.distill_cascade(0.01, 3)
        outs = [lv["p_out"] for lv in levels]
        assert outs[0] < 1e-4 and outs[1] < 1e-10 and outs[2] < 1e-25
        costs = [lv["raw_cost"] for lv in levels]
        assert costs[0] > 15 and costs[2] > costs[1] > costs[0]

    def test_non_distillable_codes_refused(self):
        for ctor in (families.steane, families.golay):
            with pytest.raises(UnsupportedGateError):
                magic.distill_exact(1e-3, code=ctor())


class TestDistillationCircuit:
    def test_quiet_circuit_reproduces_exact_map_exhaustively(self):
        # Trivial Clifford noise + explicit injections: run EVERY weight<=2
        # Z pattern (all must be rejected — d=3 detects them) and every
        # weight-3 pattern (exactly the 35 coset words accepted, all
        # erroneous; the other 420 rejected).
        code = families.reed_muller_15()
        n = code.n
        pats = [np.zeros(n, np.uint8)]
        for w in (1, 2, 3):
            for sites in itertools.combinations(range(n), w):
                v = np.zeros(n, np.uint8)
                v[list(sites)] = 1
                pats.append(v)
        inject = np.array(pats)
        quiet = noise_mod.NoiseModel()
        r = magic.distill_circuit(quiet, 0.0, inject.shape[0], inject=inject,
                                  return_samples=True, seed=0)
        weights = inject.sum(axis=1)
        assert r["accept"][0] and not r["error"][0]
        assert not np.any(r["accept"][(weights == 1) | (weights == 2)])
        acc3 = r["accept"][weights == 3]
        assert acc3.sum() == 35
        # every accepted weight-3 word is a logical error (the coset)
        assert np.all(r["error"][weights == 3][acc3])

    def test_noisy_cliffords_floor_the_output(self):
        # With circuit noise the output error floors well above 35 p^3 —
        # the quantity the protocol-level map cannot see.
        noisy = noise_mod.NoiseModel(p_gate1=3e-4, p_gate2=3e-4,
                                     p_meas=3e-4, p_reset=3e-4)
        r = magic.distill_circuit(noisy, 0.01, 1 << 17, seed=5)
        exact = magic.distill_exact(0.01)
        assert r["p_accept"] > 0.75
        assert r["p_out"] > 5 * exact["p_out"]
        # And the floor really is the Cliffords: quiet run at same batch.
        q = magic.distill_circuit(noise_mod.NoiseModel(), 0.01, 1 << 17,
                                  seed=5)
        assert q["p_out"] < r["p_out"]
