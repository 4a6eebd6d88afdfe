"""Two-level concatenated memory (`experiments/concatenated.py`)."""

import os

import numpy as np
import pytest

from qcss_tpu.experiments.concatenated import (
    logical_repetition_memory,
    repetition_spacetime_graph,
)


class TestGraph:
    def test_structure(self):
        k, layers = 4, 3
        g = repetition_spacetime_graph(k, layers)
        n_checks = k - 1
        assert g.num_nodes == layers * n_checks
        # per layer: k space + (k-1) pair; between layers: (k-1) time
        # + (k-2) diagonal
        expected = layers * (k + n_checks) + (layers - 1) * (
            n_checks + n_checks - 1)
        assert g.num_edges == expected
        # space edges carry one obs bit, pair edges two, time none
        masks = g.edge_obs[: k + n_checks]
        assert [int(m).bit_count() for m in masks] == [1] * k + [2] * n_checks
        # pair/diagonal edges are weighted less likely than singles
        assert set(np.unique(g.edge_weight)) == {2, 3}

    def test_guards(self):
        with pytest.raises(ValueError):
            repetition_spacetime_graph(1, 3)
        with pytest.raises(ValueError):
            repetition_spacetime_graph(3, 0)


class TestTwoLevelMemory:
    def test_quiet_is_exact(self):
        out = logical_repetition_memory(3, 3, 2, 0.0, 0.0, batch=64,
                                        seed=0)
        assert out["word_fail_l1"] == 0.0
        assert out["word_fail_l2"] == 0.0
        assert out["mzz_flip_rate"] == 0.0

    def test_level2_beats_level1(self):
        """The headline: at an operating point where the d=3 patches
        fail often over the program duration, the logical-level
        repetition decode recovers most shots (measured 34.2% -> 4.7%
        at this seed/batch)."""
        out = logical_repetition_memory(3, 3, 3, 4e-3, batch=1 << 11,
                                        seed=1)
        assert out["word_fail_l1"] > 0.2          # level 1 is drowning
        assert out["word_fail_l2"] < out["word_fail_l1"] / 3

    def test_guards(self):
        with pytest.raises(ValueError):
            logical_repetition_memory(3, 1, 3, 1e-3)
        with pytest.raises(ValueError):
            logical_repetition_memory(3, 3, 0, 1e-3)
        with pytest.raises(ValueError, match="decoder"):
            logical_repetition_memory(3, 3, 2, 1e-3, decoder="bogus")

    def test_device_pipeline_matches_host(self):
        """The fused device pipeline (sampling + both UF levels + counts
        in one compiled program) agrees with the host path statistically
        (exact agreement is not expected: the device kernel's
        pairing-to-representative obs flips differ from host peeling on
        ambiguous shots — see decode/device_uf.py)."""
        host = logical_repetition_memory(3, 3, 2, 4e-3, batch=1 << 10,
                                         seed=5)
        dev = logical_repetition_memory(3, 3, 2, 4e-3, batch=1 << 10,
                                        seed=5, decoder="device-uf")
        assert dev["word_fail_l1"] == pytest.approx(
            host["word_fail_l1"], abs=0.03)
        assert dev["word_fail_l2"] <= host["word_fail_l2"] + 0.03
        assert dev["word_fail_l2"] < dev["word_fail_l1"] / 3

    def test_device_quiet_is_exact(self):
        out = logical_repetition_memory(3, 3, 2, 0.0, 0.0, batch=64,
                                        seed=0, decoder="device-uf")
        assert out["word_fail_l1"] == 0.0
        assert out["word_fail_l2"] == 0.0

    def test_circuit_level_tier(self):
        """Level 1 at CIRCUIT noise (real extraction circuits, BP
        decode): level 2 still recovers most shots on the same graph
        (measured 30% -> 6% at this operating point)."""
        from qcss_tpu.sim.noise import NoiseModel

        p = 3e-3
        noise = NoiseModel(p_gate1=p, p_gate2=p, p_meas=p, p_reset=p)
        out = logical_repetition_memory(3, 3, 2, 0.0, batch=1 << 9,
                                        seed=1, noise=noise)
        assert out["level"] == "circuit"
        assert out["word_fail_l1"] > 0.15
        assert out["word_fail_l2"] < out["word_fail_l1"] / 2

    def test_brickwork_layout(self):
        """Brickwork sweeps (parallel mzz layers): fewer phases per
        sweep at k=5, the permuted mzz record assembles the same
        detector structure, and level 2 still corrects."""
        from qcss_tpu.experiments.concatenated import _build_program

        prog_b, _, perm_b = _build_program(3, 5, 2, "brickwork")
        prog_c, _, perm_c = _build_program(3, 5, 2, "chain")
        assert len(prog_b._phases) < len(prog_c._phases) * 0.7
        assert (np.sort(perm_b) == np.arange(8)).all()
        assert (perm_c == np.arange(8)).all()
        out = logical_repetition_memory(3, 5, 2, 4e-3, batch=1 << 10,
                                        seed=3, layout="brickwork")
        assert out["word_fail_l2"] < out["word_fail_l1"] / 2
        quiet = logical_repetition_memory(3, 5, 2, 0.0, 0.0, batch=32,
                                          seed=0, layout="brickwork")
        assert quiet["word_fail_l1"] == 0.0
        assert quiet["word_fail_l2"] == 0.0

    @pytest.mark.skipif(not os.environ.get("QCSS_SLOW_TESTS"),
                        reason="slow; set QCSS_SLOW_TESTS=1")
    def test_longer_chain(self):
        out = logical_repetition_memory(3, 4, 3, 3e-3, batch=1 << 11,
                                        seed=2)
        assert out["word_fail_l2"] < out["word_fail_l1"] / 2
