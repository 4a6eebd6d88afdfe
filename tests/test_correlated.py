"""Correlated two-pass decoding tests (decode/correlated.py) and the
per-shot weight machinery it rides on (UFDecoder shot_weights)."""

import numpy as np

from qcss_tpu.codes import families
from qcss_tpu.decode.correlated import (
    conditional_weights,
    correlated_logical_error_rate,
)
from qcss_tpu.decode.uf import UFDecoder, graph_from_checks


def _graph(d):
    code = families.rotated_surface(d)
    return code, graph_from_checks(code.raw_parity_check_c2,
                                   code.z_operator_matrix())


class TestShotWeights:
    def test_native_matches_python(self):
        _, g = _graph(5)
        rng = np.random.default_rng(3)
        syn = (rng.random((150, g.num_nodes)) < 0.15).astype(np.uint8)
        wts = rng.integers(2, 12, (150, g.num_edges)).astype(np.uint8)
        cn, on = UFDecoder(g, use_native=True).decode_batch(
            syn, shot_weights=wts)
        cp, op = UFDecoder(g, use_native=False).decode_batch(
            syn, shot_weights=wts)
        assert (on == op).all() and (cn == cp).all()

    def test_uniform_override_equals_default(self):
        _, g = _graph(5)
        rng = np.random.default_rng(4)
        syn = (rng.random((100, g.num_nodes)) < 0.1).astype(np.uint8)
        wts = np.tile(g.edge_weight, (100, 1))
        dec = UFDecoder(g)
        c0, o0 = dec.decode_batch(syn)
        c1, o1 = dec.decode_batch(syn, shot_weights=wts)
        assert (o0 == o1).all() and (c0 == c1).all()

    def test_bad_shape_raises(self):
        import pytest

        _, g = _graph(3)
        syn = np.zeros((4, g.num_nodes), np.uint8)
        with pytest.raises(ValueError, match="shot_weights"):
            UFDecoder(g).decode_batch(
                syn, shot_weights=np.zeros((4, 3), np.uint8))


class TestCorrelated:
    def test_weight_gap_scales_like_one_over_p(self):
        base, cheap = conditional_weights(0.01)
        assert cheap == 2 and base > 10
        base2, _ = conditional_weights(0.1)
        assert base2 < base  # smaller gap at higher p

    def test_correlated_beats_independent(self):
        """The point of the scheme: conditioning the Z pass on the X
        corrections exploits the Y-error correlation the independent
        decoder ignores (measured 2.8% -> 1.6% z_fail at d=7, p=0.08)."""
        code = families.rotated_surface(7)
        out = correlated_logical_error_rate(
            code, 0.08, samples=1 << 14, batch=1 << 14, seed=0)
        assert out["z_fail_corr"] < out["z_fail"] * 0.85
        assert out["word_fail_corr"] <= out["word_fail"]
