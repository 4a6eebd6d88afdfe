"""Belief-matching (decode/belief.py): joint-graph BP posteriors as
per-shot matching weights.

Exactness anchors: the builder structurally asserts every joint Tanner
variable's per-sector edge decomposition XORs back to its own detector
signature and observable effect; zero BP iterations must reduce the
per-shot weights to syndrome-independent (prior) weights; and on sampled
circuit noise belief-matching must beat independent matching on the same
shots (measured 1.21% vs 2.70% word-fail at d=3, 8k shots,
p_gate2=2e-3/p_meas=5e-3)."""

import numpy as np
import pytest

from qcss_tpu.codes.families import rotated_surface
from qcss_tpu.decode.belief import BeliefMatchingDecoder
from qcss_tpu.sim.noise import NoiseModel

NOISE = NoiseModel(p_gate2=2e-3, p_meas=5e-3)


@pytest.fixture(scope="module")
def bm3():
    # construction runs the per-variable decomposition-exactness asserts
    return BeliefMatchingDecoder(rotated_surface(3), 3, NOISE, iters=48)


def test_zero_iteration_weights_are_prior_weights(bm3):
    """With iters=0 the posterior IS the prior, so per-shot weights must
    not depend on the syndrome at all — and must anchor the most likely
    edge at ~weight_scale growth units."""
    bm0 = BeliefMatchingDecoder(rotated_surface(3), 3, NOISE, iters=0)
    rng = np.random.default_rng(0)
    nz = bm0.dem.graph_x_errors.num_nodes
    nx = bm0.dem.graph_z_errors.num_nodes
    dets_z = (rng.random((8, nz)) < 0.05).astype(np.uint8)
    dets_x = (rng.random((8, nx)) < 0.05).astype(np.uint8)
    wts, conv = bm0.shot_weights(dets_z, dets_x)
    assert not conv.any()
    for sector in ("z", "x"):
        w = wts[sector]
        assert (w == w[0]).all()  # syndrome-independent
        assert w.min() >= 1
        # the most likely edge sits at the weight_scale anchor (16 +- 1)
        assert abs(int(w[0].min()) - 16) <= 1


def test_single_variable_signatures_decode_to_their_obs(bm3):
    """Present every joint variable's own detector signature: the decode
    must return the observable of the likeliest variable sharing that
    signature (hook degeneracy at d=3 makes a few signatures genuinely
    ambiguous — the max-prior explanation is the correct answer)."""
    tan_checks = bm3.bp.h
    priors = bm3.bp.priors
    obs = bm3.bp.logicals
    F = tan_checks.shape[1]
    off = bm3._off

    best = {}
    for f in range(F):
        sig = tuple(np.nonzero(tan_checks[:, f])[0])
        cur = best.get(sig)
        if cur is None or priors[f] > priors[cur]:
            best[sig] = f

    dets = tan_checks.T.astype(np.uint8)  # [F, D]
    obs_z, obs_x = bm3.decode_obs(dets[:, :off], dets[:, off:])
    ok = 0
    for f in range(F):
        sig = tuple(np.nonzero(tan_checks[:, f])[0])
        b = best[sig]
        hit = ((obs_z[f] & 1) == obs[0, b]
               and (obs_x[f] & 1) == obs[1, b])
        # elementary (<= 2-detector) faults MUST decode exactly; rare
        # >= 5-detector compound hooks presented in isolation may decode
        # to a cheaper multi-edge explanation (matching is not ML-exact
        # on compounds) — hold those to the aggregate bar only
        assert hit or len(sig) > 2, (f, sig)
        ok += int(hit)
    assert ok / F >= 0.95, (ok, F)


def test_belief_beats_independent_matching_same_shots():
    from qcss_tpu.experiments.memory_xz import xz_memory_experiment

    res = xz_memory_experiment(
        rotated_surface(3), rounds=3, noise=NOISE, batch=8192, seed=0,
        belief=32)
    # measured: word 2.70% indep / 2.22% corr / 1.21% belief
    assert res["word_fail_belief"] < res["word_fail"], res
    assert res["word_fail_belief"] < res["word_fail_corr"], res
    assert res["x_fail_belief"] < res["x_fail"], res
    assert res["z_fail_belief"] < res["z_fail"], res
