"""Parallel-window decoder tests (decode/parallel_window.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcss_tpu.codes import families
from qcss_tpu.decode.parallel_window import ParallelWindowDecoder
from qcss_tpu.decode.streaming import StreamingDecoder
from qcss_tpu.decode.uf import (
    UFDecoder,
    _sample_phenomenological,
    spacetime_graph,
)


def _surface(d):
    code = families.rotated_surface(d)
    return code.raw_parity_check_c2, code.z_operator_matrix()


class TestParallelWindows:
    def test_silent_on_zero_stream(self):
        h, lz = _surface(3)
        pw = ParallelWindowDecoder(h, lz, core=3, buf=3)
        dets = np.zeros((8, 41, h.shape[0]), np.uint8)
        assert (pw.decode_stream(dets) == 0).all()

    def test_single_data_error_decoded(self):
        """One data error deep in the stream: decoded class must equal
        the fault's Z̄ overlap wherever the fault lands relative to the
        core/seam partition (sweep the round so it hits first core,
        interior cores, seams, and the widened last core)."""
        h, lz = _surface(3)
        r = h.shape[0]
        pw = ParallelWindowDecoder(h, lz, core=3, buf=3)
        for t in (0, 2, 3, 5, 6, 9, 14, 19, 21, 22):
            for q in (0, 3, 4, 8):
                dets = np.zeros((1, 23, r), np.uint8)
                dets[0, t] = h[:, q]
                obs = pw.decode_stream(dets)
                assert int(obs[0]) & 1 == int(lz[0, q]) & 1, (t, q)

    def test_single_measurement_error_decoded(self):
        """A measurement flip fires two consecutive slices; wherever the
        pair lands (inside a core, inside a seam, straddling a commit
        boundary) it must decode to obs 0 via a time edge."""
        h, lz = _surface(3)
        r = h.shape[0]
        pw = ParallelWindowDecoder(h, lz, core=3, buf=3)
        for t in range(1, 21):
            for c in (0, 2, 3):
                dets = np.zeros((1, 23, r), np.uint8)
                dets[0, t, c] = 1
                dets[0, t + 1, c] = 1
                assert int(pw.decode_stream(dets)[0]) == 0, (t, c)

    def test_matches_whole_history(self):
        """At operating density with buf >= 1.5d, parallel-window
        commits agree with the whole-history decode on ~99.5% of shots
        and the failure rate matches whole-history and the forward
        streaming decoder on the same shots (measured: 0.51% vs 0.49%
        at d=5, p=q=0.004, R=40)."""
        h, lz = _surface(5)
        R, B = 40, 2048
        dets, par = _sample_phenomenological(
            jax.random.key(7), jnp.float32(0.004), jnp.float32(0.004),
            B, R, jnp.asarray(h, jnp.uint8), jnp.asarray(lz, jnp.uint8))
        dets = np.asarray(dets).reshape(B, R + 1, h.shape[0])
        par = np.asarray(par)[:, 0]
        full = UFDecoder(spacetime_graph(h, lz, R))
        _, obs_full = full.decode_batch(
            dets.reshape(B, -1), want_corrections=False)
        pw = ParallelWindowDecoder(h, lz, core=5, buf=8)
        obs_pw = pw.decode_stream(dets)
        agree = np.mean((obs_pw & 1) == (np.asarray(obs_full) & 1))
        assert agree >= 0.985, agree
        fail_full = np.mean((np.asarray(obs_full) & 1) != par)
        fail_pw = np.mean((obs_pw & 1) != par)
        assert fail_pw <= fail_full + 0.004, (fail_pw, fail_full)
        sd = StreamingDecoder(h, lz, window=10, commit=5)
        fail_fw = np.mean((sd.decode_stream(dets) & 1) != par)
        assert fail_pw <= fail_fw + 0.004, (fail_pw, fail_fw)

    def test_weighted_matches_unweighted_shape(self):
        """Weighted graphs build and decode; q >> p weighting prefers
        time edges, so a measurement-flip pair still decodes silent."""
        h, lz = _surface(3)
        r = h.shape[0]
        pw = ParallelWindowDecoder(h, lz, core=3, buf=3,
                                   p_space=1e-3, p_time=1e-2)
        dets = np.zeros((2, 17, r), np.uint8)
        dets[0, 7, 1] = 1
        dets[0, 8, 1] = 1
        assert int(pw.decode_stream(dets)[0]) == 0
        assert int(pw.decode_stream(dets)[1]) == 0

    def test_short_stream_falls_back_to_single_window(self):
        """S too short for two cores: decoded as one closed window —
        same failure rate as whole-history host UF on the same shots
        (device and host UF pick different valid matchings on ambiguous
        shots, so bit-identity is not the contract)."""
        h, lz = _surface(3)
        R, B = 4, 1024
        dets, par = _sample_phenomenological(
            jax.random.key(3), jnp.float32(0.02), jnp.float32(0.02),
            B, R, jnp.asarray(h, jnp.uint8), jnp.asarray(lz, jnp.uint8))
        dets = np.asarray(dets).reshape(B, R + 1, h.shape[0])
        par = np.asarray(par)[:, 0]
        pw = ParallelWindowDecoder(h, lz, core=8, buf=4)
        full = UFDecoder(spacetime_graph(h, lz, R))
        _, obs_full = full.decode_batch(
            dets.reshape(B, -1), want_corrections=False)
        fail_full = np.mean((np.asarray(obs_full) & 1) != par)
        fail_pw = np.mean((pw.decode_stream(dets) & 1) != par)
        assert abs(fail_pw - fail_full) <= 0.015, (fail_pw, fail_full)

    def test_bad_params_raise(self):
        h, lz = _surface(3)
        with pytest.raises(ValueError):
            ParallelWindowDecoder(h, lz, core=0, buf=3)
        with pytest.raises(ValueError):
            ParallelWindowDecoder(h, lz, core=3, buf=0)
        # a closed ring (every qubit in exactly two checks, no space
        # boundary) could strand odd seam parity — refused
        h_ring = np.array([[1, 1, 0], [0, 1, 1], [1, 0, 1]], np.uint8)
        with pytest.raises(ValueError, match="boundary"):
            ParallelWindowDecoder(h_ring, np.array([[1, 1, 1]], np.uint8),
                                  core=3, buf=3)


class TestFusedRate:
    def test_fused_rate_matches_decoder(self):
        """The one-program fused pipeline (sampling + all windows + seam
        decodes + counting in a single jit) gives the same failure rate
        as the host-orchestrated decode path at the same operating
        point."""
        from qcss_tpu.decode.parallel_window import (
            parallel_window_memory_rate,
        )

        h, lz = _surface(3)
        out = parallel_window_memory_rate(
            h, lz, 0.008, 0.008, rounds=24, batch=2048, core=3, buf=5,
            seed=11)
        assert out["samples"] == 2048
        dets, par = _sample_phenomenological(
            jax.random.key(12), jnp.float32(0.008), jnp.float32(0.008),
            2048, 24, jnp.asarray(h, jnp.uint8), jnp.asarray(lz, jnp.uint8))
        pw = ParallelWindowDecoder(h, lz, core=3, buf=5,
                                   p_space=0.008, p_time=0.008)
        obs = pw.decode_stream(
            np.asarray(dets).reshape(2048, 25, h.shape[0]))
        ref = np.mean((obs & 1) != np.asarray(par)[:, 0])
        assert abs(out["logical_fail"] - ref) < 0.015, (out, ref)


class TestSharded:
    def test_sharded_parallel_window_memory(self):
        """The fused parallel-window pipeline sharded over the mesh
        (twelfth pipeline): failure rate matches the single-device fused
        pipeline at the same operating point."""
        from qcss_tpu.decode.parallel_window import (
            parallel_window_memory_rate,
        )
        from qcss_tpu.parallel import (
            make_mesh,
            sharded_parallel_window_memory,
        )

        code = families.rotated_surface(3)
        out = sharded_parallel_window_memory(
            code, make_mesh(), rounds=24, p=8e-3, q=8e-3, batch=8 * 256,
            core=3, buf=5, seed=1)
        assert out["decoder"] == "device-parallel-window"
        h, lz = _surface(3)
        ref = parallel_window_memory_rate(
            h, lz, 8e-3, 8e-3, rounds=24, batch=2048, core=3, buf=5,
            seed=2)
        assert abs(out["logical_fail"] - ref["logical_fail"]) < 0.02
