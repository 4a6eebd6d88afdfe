"""Decoder calibration from detector statistics (`decode.calibrate`).

The two-point identity num/den = p(1-p) is exact for matching graphs, so
sampled phenomenological streams must give back their own (p, q) — and a
graph weighted by the ESTIMATES must decode exactly like one weighted by
the true rates (integer weights coincide at these statistics)."""

import jax
import numpy as np

from qcss_tpu.codes import families
from qcss_tpu.decode.calibrate import calibrated_graph, estimate_edge_probs
from qcss_tpu.decode.streaming import sample_phenomenological_stream
from qcss_tpu.decode.uf import UFDecoder, _pack_parity, spacetime_graph


def _sample(code, p, q, rounds, batch, seed=0):
    h = code.raw_parity_check_c2
    lz = code.z_operator_matrix()
    dets, par = sample_phenomenological_stream(
        jax.random.key(seed), p, q, batch, rounds, h, lz)
    return (np.asarray(dets, np.uint8).reshape(batch, -1),
            np.asarray(par, np.uint8))


class TestCalibration:
    def test_recovers_known_rates(self):
        code = families.rotated_surface(5)
        p, q = 0.03, 0.006
        dets, _ = _sample(code, p, q, rounds=8, batch=1 << 15)
        g = spacetime_graph(code.raw_parity_check_c2,
                            code.z_operator_matrix(), 8)
        est = estimate_edge_probs(dets, g)
        r = code.raw_parity_check_c2.shape[0]
        e = g.edges
        is_time = ((e[:, 0] >= 0) & (e[:, 1] >= 0)
                   & (np.abs(e[:, 0] - e[:, 1]) == r))
        assert abs(est[is_time].mean() - q) < 0.15 * q
        assert abs(est[~is_time].mean() - p) < 0.1 * p
        # per-edge, not just on average (boundary residuals included)
        assert np.all(np.abs(est[is_time] - q) < 0.5 * q)
        assert np.all(np.abs(est[~is_time] - p) < 0.5 * p)

    def test_calibrated_matches_true_weighting(self):
        code = families.rotated_surface(5)
        p, q = 0.03, 0.006
        dets, par = _sample(code, p, q, rounds=8, batch=1 << 15, seed=1)
        h = code.raw_parity_check_c2
        lz = code.z_operator_matrix()
        g_unw = spacetime_graph(h, lz, 8)
        g_true = spacetime_graph(h, lz, 8, p_space=p, p_time=q)
        g_cal = calibrated_graph(g_unw, dets)

        def fail(graph):
            _, obs = UFDecoder(graph).decode_batch(dets,
                                                   want_corrections=False)
            return float(np.mean((obs & 1) != _pack_parity(par)))

        f_unw, f_true, f_cal = fail(g_unw), fail(g_true), fail(g_cal)
        # measured: 12.1% unweighted, 9.9% true-weighted == calibrated
        assert f_cal < f_unw
        assert abs(f_cal - f_true) < 0.005

    def test_rejects_wrong_shape(self):
        import pytest

        code = families.rotated_surface(3)
        g = spacetime_graph(code.raw_parity_check_c2,
                            code.z_operator_matrix(), 3)
        with pytest.raises(ValueError):
            estimate_edge_probs(np.zeros((8, 3), np.uint8), g)
