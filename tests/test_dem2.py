"""Two-sector DEM + correlated X<->Z decoding (round 3)."""

import numpy as np
import pytest

from qcss_tpu.codes.families import rotated_surface
from qcss_tpu.decode.dem2 import build_two_sector_dem
from qcss_tpu.sim.noise import NoiseModel


@pytest.fixture(scope="module")
def dem3():
    return build_two_sector_dem(
        rotated_surface(3), 3, NoiseModel(p_gate2=2e-3, p_meas=5e-3))


def test_graphs_are_matchable(dem3):
    for g in (dem3.graph_x_errors, dem3.graph_z_errors):
        assert g.num_edges > 0
        assert (g.edge_weight >= 2).all()
        # every edge touches at most 2 detectors by construction
        assert g.edges.shape[1] == 2


def test_pairs_reference_valid_edges(dem3):
    p = dem3.pairs
    assert p.shape[0] > 0
    assert (p[:, 0] < dem3.graph_x_errors.num_edges).all()
    assert (p[:, 1] < dem3.graph_z_errors.num_edges).all()


def test_pure_meas_noise_has_no_data_edges():
    dem = build_two_sector_dem(
        rotated_surface(3), 3, NoiseModel(p_gate2=1e-9, p_meas=1e-2))
    # measurement flips dominate: the heaviest (most likely) edges are
    # the time-like (c, c+r) pairs in both sectors
    g = dem.graph_x_errors
    w = np.asarray(g.edge_weight)
    heaviest = np.asarray(g.edges)[w == w.min()]
    deltas = heaviest[:, 1] - heaviest[:, 0]
    assert (deltas == g.num_nodes // 4).all()  # r detectors apart


def test_single_fault_signatures_decode_most_likely(dem3):
    """Every elementary edge, presented as its own detector pattern, must
    decode to the MOST LIKELY (minimum-weight) explanation of that
    pattern — its own observable unless a lighter parallel edge exists
    (hook errors at d=3 make some weight-1 faults genuinely ambiguous)."""
    from qcss_tpu.decode.mwpm import MWPMDecoder

    g = dem3.graph_x_errors
    dets = np.zeros((g.num_edges, g.num_nodes), np.uint8)
    for e in range(g.num_edges):
        for v in g.edges[e]:
            if v >= 0:
                dets[e, v] ^= 1
    _, obs = MWPMDecoder(g).decode_batch(dets, want_corrections=False)
    sig = [tuple(sorted(v for v in g.edges[e] if v >= 0))
           for e in range(g.num_edges)]
    best = {}
    for e in range(g.num_edges):
        cur = best.get(sig[e])
        if cur is None or g.edge_weight[e] < g.edge_weight[cur]:
            best[sig[e]] = e
    ok = 0
    checked = 0
    for e in range(g.num_edges):
        b = best[sig[e]]
        if g.edge_weight[b] < g.edge_weight[e]:
            continue  # a strictly likelier parallel edge wins, by design
        checked += 1
        ok += int((obs[e] & 1) == (g.edge_obs[b] & 1))
    assert checked > 0 and ok / checked == 1.0, (ok, checked)


def test_correlated_beats_independent():
    from qcss_tpu.experiments.memory_xz import xz_memory_experiment

    res = xz_memory_experiment(
        rotated_surface(3), rounds=3,
        noise=NoiseModel(p_gate2=2e-3, p_meas=5e-3), batch=8192, seed=0)
    # measured: z_fail 1.11% -> 0.65%, word 2.64% -> 2.17%
    assert res["z_fail_corr"] < res["z_fail"], res
    assert res["word_fail_corr"] <= res["word_fail"], res
    assert res["pairs"] > 0


class TestIdleNoise:
    """Per-round data-qubit idle in the two-sector pipelines: sampled by
    `_sample_two_sector` and modeled as k=-1 fault species — the memory
    counterpart of the executor's idle locations (tests/test_idle.py)."""

    def test_idle_species_structure(self):
        from qcss_tpu.decode.dem2 import _RoundCircuit, _fault_species

        code = rotated_surface(3)
        circ = _RoundCircuit(code)
        noise = NoiseModel(p_idle=3e-3)
        comps, pairs = _fault_species(circ, noise)
        idle = [c for c in comps if c[0][0] == "idle"]
        assert len(idle) == 2 * code.n  # X and Z component per data qubit
        # uniform depolarizing split: component marginal 2p/3, pair p/3
        for key, info, _, _, prob in idle:
            assert abs(prob - 2 * 3e-3 / 3) < 1e-12
        idle_pairs = [v for k, v in pairs.items() if k[0][0] == "idle"]
        assert len(idle_pairs) == code.n
        assert all(abs(v - 1e-3) < 1e-12 for v in idle_pairs)

    def test_idle_raises_failure_and_is_decoded(self):
        from qcss_tpu.experiments.memory_xz import xz_memory_experiment

        code = rotated_surface(3)
        base = xz_memory_experiment(
            code, rounds=3, noise=NoiseModel(p_gate2=1e-3, p_meas=3e-3),
            batch=4096, seed=1)
        idle = xz_memory_experiment(
            code, rounds=3,
            noise=NoiseModel(p_gate2=1e-3, p_meas=3e-3, p_idle=1e-2),
            batch=4096, seed=1)
        # measured at 8192 shots: word 1.32% -> 2.28% monotone in p_idle
        assert idle["word_fail"] > base["word_fail"]
        assert idle["word_fail"] < 0.1  # the idle-aware DEM still decodes

    def test_single_sector_paths_refuse_idle(self):
        from qcss_tpu.decode.device_streaming import stream_memory_rate_dem
        from qcss_tpu.experiments.memory import memory_experiment

        noise = NoiseModel(p_gate2=1e-3, p_idle=1e-3)
        with pytest.raises(ValueError, match="idle"):
            memory_experiment(rotated_surface(3), rounds=2, noise=noise)
        with pytest.raises(ValueError, match="idle"):
            stream_memory_rate_dem(rotated_surface(3), noise, rounds=8,
                                   batch=8)
