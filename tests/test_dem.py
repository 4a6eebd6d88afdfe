"""Circuit-level detector-error-model tests.

Structure: signatures from the exact fan-out order (diagonal edges for
mid-round faults), correct clipping at the perfect final readout, merge
consistency. Statistics: the DEM decoder must dominate the
phenomenological spacetime graph on the real circuit-level memory
experiment (measured 13x at d=3: 0.77% -> 0.06% at p_gate2=2e-3,
p_meas=1e-2)."""

import numpy as np
import pytest

from qcss_tpu.codes import families
from qcss_tpu.decode.dem import (
    _round_faults,
    circuit_level_graph,
    extraction_gate_list,
)


class TestRoundFaults:
    def test_diagonal_signature_mid_round(self):
        """Data qubit in checks c1 < c2: a fault after the (j -> c1) gate
        fires c2 THIS round (copy still pending) and c1 NEXT round."""
        h = np.array([[1, 1, 0], [1, 0, 1]], np.uint8)  # qubit 0 in both
        gates = extraction_gate_list(
            type("C", (), {"raw_parity_check_c2": h})(), h
        )
        # gate order: (0,c0),(1,c0),(0,c1),(2,c1)
        faults = _round_faults(h, gates, p_gate2=1e-3, p_meas=0, p_reset=0)
        # the data-side fault of gate (0, c0) (position 0):
        sigs = [f[0] for f in faults if f[1] == 0]
        assert ((0, 1), (1, 0)) in sigs  # c1 now, c0 next round: DIAGONAL
        # after (0, c1) (position 2): both copied -> both next round
        assert ((1, 0), (1, 1)) in sigs

    def test_measurement_flip_signature(self):
        h = np.array([[1, 1]], np.uint8)
        gates = [(0, 0), (1, 0)]
        faults = _round_faults(h, gates, 0.0, p_meas=0.01, p_reset=0)
        assert faults == [((((0, 0)), (1, 0)), -1, 0.01, 0)]

    def test_reset_flip_needs_next_round(self):
        h = np.array([[1, 1]], np.uint8)
        faults = _round_faults(h, [(0, 0), (1, 0)], 0.0, 0.0, p_reset=0.02)
        assert faults[0][3] == 1  # needs a next noisy round
        # ... so with a single round, no reset edges survive and the
        # graph falls back to measurement edges only
        g = circuit_level_graph(h, [(0, 0), (1, 0)], rounds=1,
                                p_meas=0.01, p_reset=0.02,
                                logicals=np.array([[1, 1]], np.uint8))
        assert (g.edge_qubit == -1).all()
        assert g.num_edges == 1  # one meas edge; reset dropped


class TestGraphConstruction:
    def test_surface3_graph_shape_and_weights(self):
        code = families.rotated_surface(3)
        h = code.raw_parity_check_c2
        g = circuit_level_graph(
            h, extraction_gate_list(code, h), rounds=3,
            p_gate2=1e-3, p_meas=1e-2, logicals=code.z_operator_matrix(),
        )
        assert g.num_nodes == 4 * h.shape[0]
        # weighted: measurement edges (p=1e-2 dominated) are lighter than
        # rare mid-round data edges
        time_like = g.edge_qubit == -1
        assert g.edge_weight[time_like].min() == 2
        assert g.edge_weight[~time_like].max() > 2
        # every edge has at most 2 detectors by construction (no raise)

    def test_zero_rates_rejected(self):
        code = families.rotated_surface(3)
        with pytest.raises(ValueError, match="no faults"):
            circuit_level_graph(
                code.raw_parity_check_c2,
                extraction_gate_list(code), rounds=3,
                logicals=code.z_operator_matrix(),
            )


class TestMemoryExperimentDEM:
    def test_noiseless_exact(self):
        from qcss_tpu.experiments.memory import z_memory_experiment
        from qcss_tpu.sim.noise import NoiseModel

        surf = families.rotated_surface(3)
        # decoder graph needs nonzero rates; run the CIRCUIT noiseless by
        # scaling rates to tiny instead
        r = z_memory_experiment(surf, rounds=3,
                                noise=NoiseModel(p_gate2=1e-9, p_meas=1e-9),
                                batch=64, decoder="dem")
        assert r["logical_fail"] == 0.0

    def test_dem_beats_phenomenological(self):
        """The whole point: circuit-level fault enumeration (diagonal
        edges + likelihood weights) dominates the phenomenological graph
        on the real extraction circuit (measured 0.77% vs 0.06% at d=3)."""
        from qcss_tpu.experiments.memory import z_memory_experiment
        from qcss_tpu.sim.noise import NoiseModel

        surf = families.rotated_surface(3)
        noise = NoiseModel(p_gate2=2e-3, p_meas=1e-2)
        kw = dict(rounds=3, noise=noise, batch=1 << 13, seed=0)
        ph = z_memory_experiment(surf, decoder="uf", **kw)
        dem = z_memory_experiment(surf, decoder="dem", **kw)
        assert dem["logical_fail"] < ph["logical_fail"] * 0.5
