"""Heralded-erasure noise + erasure-aware decoding (experiments/erasure.py).

No reference analogue (the reference's LUT decode has no per-shot side
information — reference: css_code.py:649-685). Correctness is pinned by
(a) the exact combinatorial guarantee — any erasure pattern of weight < d
decodes without logical failure, exhaustively at d=3 and sampled at d=5 —
and (b) the physics: heralding must strictly help on identical shots, and
pure-erasure failure must be suppressed with distance below the 50%
bond-percolation threshold and not above it.
"""

from itertools import combinations

import numpy as np
import pytest

from qcss_tpu.codes import families
from qcss_tpu.decode.uf import UFDecoder, graph_from_checks, _pack_parity
from qcss_tpu.experiments import erasure as er


def _decode_erasure_shots(code, erased_sets, flip_bits):
    """Decode constructed pure-erasure shots (X errors on erased qubits
    given by flip_bits) on the Z-check graph; returns logical-failure
    mask."""
    h2 = code.raw_parity_check_c2
    lz = code.z_operator_matrix()
    g = graph_from_checks(h2, lz)
    dec = UFDecoder(g)
    B = len(erased_sets)
    x_err = np.zeros((B, code.n), np.uint8)
    er_mask = np.zeros((B, code.n), np.uint8)
    for b, (qs, bits) in enumerate(zip(erased_sets, flip_bits)):
        for q, bit in zip(qs, bits):
            er_mask[b, q] = 1
            x_err[b, q] = bit
    syn = (x_err @ h2.T) % 2
    par = (x_err @ lz.T) % 2
    sw = np.where(er_mask[:, g.edge_qubit] == 1, er.ERASED_WEIGHT,
                  250).astype(np.uint8)
    _, obs = dec.decode_batch(syn.astype(np.uint8), want_corrections=False,
                              shot_weights=sw)
    return obs != _pack_parity(par.astype(np.uint8))


class TestExactness:
    def test_weight_below_d_exhaustive_d3(self):
        """d=3: every erasure set of weight <= 2, every flip pattern —
        zero logical failures (the correction is unique modulo
        stabilizers when no logical fits in the erased support)."""
        code = families.rotated_surface(3)
        sets, flips = [], []
        for w in (1, 2):
            for qs in combinations(range(code.n), w):
                for m in range(1 << w):
                    sets.append(qs)
                    flips.append([(m >> i) & 1 for i in range(w)])
        fails = _decode_erasure_shots(code, sets, flips)
        assert not fails.any()

    def test_weight_below_d_sampled_d5(self):
        """d=5: random erasure sets of weight <= 4 with random flips."""
        code = families.rotated_surface(5, max_table_weight=0, t=2)
        rng = np.random.default_rng(7)
        sets, flips = [], []
        for _ in range(800):
            w = int(rng.integers(1, 5))
            qs = tuple(rng.choice(code.n, size=w, replace=False))
            sets.append(qs)
            flips.append(rng.integers(0, 2, size=w).tolist())
        fails = _decode_erasure_shots(code, sets, flips)
        assert not fails.any()


class TestPhysics:
    def test_herald_strictly_helps(self):
        code = families.rotated_surface(5, max_table_weight=0, t=2)
        rh = er.erasure_error_rate(code, 0.02, 0.10, samples=1 << 12,
                                   seed=3, heralded=True)
        ru = er.erasure_error_rate(code, 0.02, 0.10, samples=1 << 12,
                                   seed=3, heralded=False)
        # measured 1.5% vs 10% — demand a >= 2x separation
        assert rh["word_fail"] * 2 < ru["word_fail"]

    def test_pure_erasure_distance_suppression(self):
        """Below the 50% percolation threshold larger d wins; above it
        nothing is protected."""
        d3 = families.rotated_surface(3)
        d7 = families.rotated_surface(7, max_table_weight=0, t=3)
        lo3 = er.erasure_error_rate(d3, 0.0, 0.25, samples=1 << 12, seed=5)
        lo7 = er.erasure_error_rate(d7, 0.0, 0.25, samples=1 << 12, seed=5)
        assert lo7["word_fail"] < lo3["word_fail"]
        hi7 = er.erasure_error_rate(d7, 0.0, 0.65, samples=1 << 11, seed=6)
        assert hi7["word_fail"] > 0.3  # above threshold: unprotected

    def test_phenomenological_herald_gain(self):
        code = families.rotated_surface(5, max_table_weight=0, t=2)
        rh = er.erasure_phenomenological_error_rate(
            code, 0.005, 0.02, samples=1 << 11, seed=4, heralded=True)
        ru = er.erasure_phenomenological_error_rate(
            code, 0.005, 0.02, samples=1 << 11, seed=4, heralded=False)
        assert rh["logical_fail"] < ru["logical_fail"]

    def test_pure_erasure_zero_rate_is_zero(self):
        code = families.rotated_surface(3)
        r = er.erasure_error_rate(code, 0.0, 0.0, samples=1 << 10, seed=0)
        assert r["word_fail"] == 0.0
