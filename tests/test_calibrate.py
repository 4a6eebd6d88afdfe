"""Decoder calibration from detector statistics (`decode.calibrate`).

The two-point identity num/den = p(1-p) is exact for matching graphs, so
sampled phenomenological streams must give back their own (p, q) — and a
graph weighted by the ESTIMATES must decode exactly like one weighted by
the true rates (integer weights coincide at these statistics)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from qcss_tpu.codes import families
from qcss_tpu.decode.calibrate import calibrated_graph, estimate_edge_probs
from qcss_tpu.decode.streaming import sample_phenomenological_stream
from qcss_tpu.decode.uf import UFDecoder, _pack_parity, spacetime_graph
from qcss_tpu.sim.noise import NoiseModel


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


def _sample_circuit_level(code, noise, rounds, batch, seed=0):
    """Frame-sampled circuit-level Z-memory detector histories, the same
    machinery `memory_experiment(engine='frames')` runs."""
    from qcss_tpu.decode.spacetime import detector_history
    from qcss_tpu.experiments.memory import (
        _memory_circuit_frames,
        z_extraction_circuit,
    )
    from qcss_tpu.sim import frame as fr

    raw = code.raw_parity_check_c2
    extract_arrays = tuple(map(jnp.asarray, z_extraction_circuit(
        code, checks=raw).to_arrays()))
    extract_comp = fr.maybe_compile(extract_arrays, code.n + raw.shape[0])
    fn = jax.jit(
        partial(_memory_circuit_frames, code=code, noise=noise,
                extract_arrays=extract_arrays, n_anc=raw.shape[0],
                extract_comp=extract_comp),
        static_argnames=("batch", "rounds"),
    )
    syns, word = fn(jax.random.key(seed), batch, rounds)
    syns, word = np.asarray(syns), np.asarray(word)
    final_syn = ((word.astype(np.int64) @ raw.T.astype(np.int64)) & 1)
    dets = detector_history(syns, final_syn.astype(np.uint8))
    par = (word.astype(np.int64)
           @ code.z_operator_matrix().T.astype(np.int64)) & 1
    return np.asarray(dets, np.uint8), np.asarray(par, np.uint8)


class TestCircuitLevelCalibration:
    """The two-point identity is graph-agnostic: on CIRCUIT-LEVEL detector
    data it must hand back the DEM's own merged per-edge fault
    probabilities (every enumerated fault flips <= 2 detectors, so the
    DEM is a matching graph and every mechanism hitting a pair folds into
    that pair's edge — including hook and diagonal faults the
    phenomenological model cannot even represent)."""

    ROUNDS = 5
    NOISE = NoiseModel(p_gate2=3e-3, p_meas=8e-3, p_reset=3e-3)

    def _graph_and_truth(self, code):
        from qcss_tpu.decode.dem import (
            circuit_level_graph,
            extraction_gate_list,
        )

        raw = code.raw_parity_check_c2
        n = self.NOISE
        return circuit_level_graph(
            raw, extraction_gate_list(code, raw), self.ROUNDS,
            p_gate2=n.p_gate2, p_meas=n.p_meas, p_reset=n.p_reset,
            logicals=code.z_operator_matrix(), return_probs=True)

    def test_recovers_dem_edge_probs(self):
        code = families.rotated_surface(3)
        dets, _ = _sample_circuit_level(
            code, self.NOISE, self.ROUNDS, batch=1 << 17)
        graph, true_p = self._graph_and_truth(code)
        est = estimate_edge_probs(dets, graph)

        # species-level (group edges by true probability): means tight
        for pv in np.unique(np.round(true_p, 9)):
            sel = np.abs(true_p - pv) < 1e-9
            assert abs(est[sel].mean() - pv) < 0.15 * pv, (
                pv, est[sel].mean(), int(sel.sum()))
        # per-edge: within statistical scatter of the truth
        assert np.all(np.abs(est - true_p) < np.maximum(0.6 * true_p, 6e-4))

    def test_calibrated_decoding_matches_true_dem_weights(self):
        code = families.rotated_surface(5)
        dets, par = _sample_circuit_level(
            code, self.NOISE, self.ROUNDS, batch=1 << 16, seed=3)
        graph, true_p = self._graph_and_truth(code)
        # unweighted structure: same edges, flat weights
        from qcss_tpu.decode.uf import MatchingGraph
        g_unw = MatchingGraph(
            num_nodes=graph.num_nodes, edges=graph.edges,
            edge_qubit=graph.edge_qubit, edge_obs=graph.edge_obs,
            n_qubits=graph.n_qubits)
        g_cal = calibrated_graph(g_unw, dets)

        def fail(g):
            _, obs = UFDecoder(g).decode_batch(dets, want_corrections=False)
            return float(np.mean((obs & 1) != _pack_parity(par)))

        f_unw, f_true, f_cal = fail(g_unw), fail(graph), fail(g_cal)
        # calibrated-from-data must match the true-likelihood weighting and
        # beat flat weights (hook/diagonal vs measurement edges differ ~4x)
        assert f_cal <= f_unw
        assert abs(f_cal - f_true) < 2.5e-3, (f_unw, f_true, f_cal)
