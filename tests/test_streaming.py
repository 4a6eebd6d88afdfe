"""Sliding-window streaming decoder tests (decode/streaming.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcss_tpu.codes import families
from qcss_tpu.decode.streaming import (
    StreamingDecoder,
    sample_phenomenological_stream,
)
from qcss_tpu.decode.uf import (
    UFDecoder,
    _pack_parity,
    _sample_phenomenological,
    spacetime_graph,
)


def _surface(d):
    code = families.rotated_surface(d)
    return code.raw_parity_check_c2, code.z_operator_matrix()


class TestWindowing:
    def test_silent_on_zero_stream(self):
        h, lz = _surface(3)
        sd = StreamingDecoder(h, lz, window=6, commit=3)
        dets = np.zeros((8, 41, h.shape[0]), np.uint8)
        assert (sd.decode_stream(dets) == 0).all()

    def test_single_deep_error_decoded(self):
        """One data error at round 200 of a 400-round stream: detectors
        fire once in slice 200; the decoder must place a correction of
        the right logical class (obs parity == the error's Z̄ overlap)."""
        h, lz = _surface(5)
        r, n = h.shape
        sd = StreamingDecoder(h, lz, window=8, commit=4)
        for q in (0, 7, 12, 24):
            dets = np.zeros((1, 401, r), np.uint8)
            dets[0, 200] = h[:, q]
            obs = sd.decode_stream(dets)
            assert int(obs[0]) & 1 == int(lz[0, q]) & 1, q

    def test_single_measurement_error_decoded(self):
        """A measurement flip at round 150 fires detectors in slices 150
        and 151; the decoder must pair them through a time edge (obs 0)."""
        h, lz = _surface(5)
        r = h.shape[0]
        sd = StreamingDecoder(h, lz, window=8, commit=4)
        dets = np.zeros((1, 301, r), np.uint8)
        dets[0, 150, 3] = 1
        dets[0, 151, 3] = 1
        assert int(sd.decode_stream(dets)[0]) == 0

    def test_matches_whole_history(self):
        """At window = 2d slices the committed decisions should almost
        always coincide with the whole-history decode (99%+ per shot)."""
        h, lz = _surface(5)
        R, B = 12, 1024
        dets, par = _sample_phenomenological(
            jax.random.key(0), jnp.float32(0.015), jnp.float32(0.015),
            B, R, jnp.asarray(h, jnp.uint8), jnp.asarray(lz, jnp.uint8))
        dets = np.asarray(dets).reshape(B, R + 1, h.shape[0])
        full = UFDecoder(spacetime_graph(h, lz, R))
        _, obs_full = full.decode_batch(
            dets.reshape(B, -1), want_corrections=False)
        sd = StreamingDecoder(h, lz, window=10, commit=5)
        obs_s = sd.decode_stream(dets)
        assert np.mean(obs_s == obs_full) > 0.99

    def test_bad_params_raise(self):
        h, lz = _surface(3)
        with pytest.raises(ValueError, match="window"):
            StreamingDecoder(h, lz, window=3, commit=3)


class TestStreamSampler:
    def test_matches_unrolled_statistics(self):
        h, lz = _surface(3)
        d1, p1 = _sample_phenomenological(
            jax.random.key(1), jnp.float32(0.02), jnp.float32(0.02),
            4096, 6, jnp.asarray(h, jnp.uint8), jnp.asarray(lz, jnp.uint8))
        d2, p2 = sample_phenomenological_stream(
            jax.random.key(2), 0.02, 0.02, 4096, 6, h, lz)
        assert abs(float(np.mean(np.asarray(d1)))
                   - float(np.mean(np.asarray(d2)))) < 0.01
        assert abs(float(np.mean(np.asarray(p1)))
                   - float(np.mean(np.asarray(p2)))) < 0.03


class TestLongMemory:
    def test_distance_suppression_over_300_rounds(self):
        """The headline contract: O(window) state decodes streams no
        whole-history graph would be built for, and distance still
        suppresses failure (d=5 beats d=3 at p=0.005 over 300 rounds)."""
        fails = {}
        for d in (3, 5):
            h, lz = _surface(d)
            dets, par = sample_phenomenological_stream(
                jax.random.key(d), 0.005, 0.005, 384, 300, h, lz)
            sd = StreamingDecoder(h, lz, window=4 * d, commit=2 * d)
            obs = sd.decode_stream(np.asarray(dets))
            fails[d] = float(np.mean(obs != _pack_parity(np.asarray(par))))
        assert fails[5] < fails[3]
