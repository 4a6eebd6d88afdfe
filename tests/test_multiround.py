"""Repeated-syndrome-extraction decoding tests: majority voting must
restore decoding accuracy under measurement noise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcss_tpu.codes import families
from qcss_tpu.decode import multiround


@pytest.fixture(scope="module")
def steane():
    return families.steane()


class TestVoting:
    def test_vote_majority(self):
        syns = jnp.asarray(
            [
                [[1, 0, 1]],
                [[1, 1, 0]],
                [[1, 0, 0]],
            ],
            dtype=jnp.uint8,
        )  # 3 rounds, B=1, r=3
        voted = multiround.vote_syndromes(syns)
        assert np.array_equal(np.asarray(voted), [[1, 0, 0]])

    def test_even_rounds_rejected(self):
        with pytest.raises(ValueError):
            multiround.vote_syndromes(jnp.zeros((2, 1, 3), jnp.uint8))

    def test_noiseless_rounds_reproduce_syndrome(self, steane):
        dev = steane.device
        err = np.zeros((1, 7), np.uint8)
        err[0, 3] = 1
        syns = multiround.noisy_syndromes(
            jnp.asarray(err), dev.h2, 0.0, jax.random.key(0), rounds=3
        )
        voted = multiround.vote_syndromes(syns)
        from qcss_tpu.ops import gf2_jax

        want = gf2_jax.syndromes_dense(jnp.asarray(err), dev.h2)
        assert np.array_equal(np.asarray(voted), np.asarray(want))


class TestMeasurementNoiseRobustness:
    def test_voting_beats_single_round(self, steane):
        """At p=0 (no data errors) and q=0.05 measurement noise, a single
        round mis-corrects often; 5-round voting nearly eliminates it."""
        p, q = 0.0, 0.05
        single = multiround.multiround_error_rate(
            steane, p, q, rounds=1, samples=1 << 15, batch=1 << 15, seed=0
        )
        voted = multiround.multiround_error_rate(
            steane, p, q, rounds=5, samples=1 << 15, batch=1 << 15, seed=1
        )
        # Single-round: any flipped syndrome bit (rate ~ 1-(1-q)^3 ~ 0.14
        # per sector) applies a spurious weight-1 correction; those do not
        # flip the logical directly, but two flipped bits can. Voting must
        # cut the failure rate by well over an order of magnitude.
        assert voted["word_fail"] < single["word_fail"] / 5 or (
            single["word_fail"] == 0.0 and voted["word_fail"] == 0.0
        )

    def test_zero_noise_zero_failures(self, steane):
        out = multiround.multiround_error_rate(
            steane, 0.0, 0.0, samples=1 << 12, batch=1 << 12
        )
        assert out["word_fail"] == 0.0

    def test_with_data_errors_still_works(self, steane):
        out = multiround.multiround_error_rate(
            steane, 0.01, 0.01, rounds=5, samples=1 << 15, batch=1 << 15, seed=2
        )
        # Should be close to the noiseless-measurement rate at p=0.01
        # (~1.6e-3), well below the single-round measurement-noise floor.
        assert out["word_fail"] < 0.02
