"""Device sliding-window decoding vs the host streaming decoder."""

import jax
import numpy as np
import pytest

from qcss_tpu.codes.families import rotated_surface
from qcss_tpu.decode.device_streaming import (
    DeviceStreamingDecoder,
    stream_memory_rate,
)
from qcss_tpu.decode.streaming import (
    StreamingDecoder,
    sample_phenomenological_stream,
)
from qcss_tpu.decode.uf import UFDecoder, spacetime_graph


@pytest.fixture(scope="module")
def d5_stream():
    code = rotated_surface(5)
    h = code.raw_parity_check_c2
    lz = code.z_operator_matrix()
    dets, par = sample_phenomenological_stream(
        jax.random.key(0), 0.008, 0.008, 512, 24, h, lz)
    return code, h, lz, np.asarray(dets), np.asarray(par)[:, 0]


def test_matches_host_streaming_statistically(d5_stream):
    code, h, lz, dets, par = d5_stream
    host = StreamingDecoder(h, lz, window=8, commit=4,
                            p_space=0.008, p_time=0.008)
    dev = DeviceStreamingDecoder(h, lz, window=8, commit=4,
                                 p_space=0.008, p_time=0.008)
    obs_h = host.decode_stream(dets)
    obs_d = dev.decode_stream(dets)
    fail_h = np.mean((obs_h & 1) != par)
    fail_d = np.mean((obs_d & 1) != par)
    agree = np.mean((obs_h & 1) == (obs_d & 1))
    assert agree > 0.9, agree
    assert abs(fail_h - fail_d) < 0.03, (fail_h, fail_d)


def test_matches_whole_history_uf(d5_stream):
    """Committed decisions must track whole-history decoding closely."""
    code, h, lz, dets, par = d5_stream
    g = spacetime_graph(h, lz, 24)
    _, obs_w = UFDecoder(g).decode_batch(
        dets.reshape(dets.shape[0], -1), want_corrections=False)
    dev = DeviceStreamingDecoder(h, lz, window=10, commit=5)
    obs_d = dev.decode_stream(dets)
    fail_w = np.mean((obs_w & 1) != par)
    fail_d = np.mean((obs_d & 1) != par)
    assert fail_d <= fail_w + 0.05, (fail_w, fail_d)


def test_fused_stream_memory_distance_suppression():
    """End-to-end (sample + windowed decode, O(W) state): distance
    suppression must hold over a 100-round memory."""
    res = {}
    for d in (3, 5):
        code = rotated_surface(d)
        res[d] = stream_memory_rate(
            code.raw_parity_check_c2, code.z_operator_matrix(),
            0.004, 0.004, rounds=100, batch=1024, window=8, commit=4,
            seed=1)["logical_fail"]
    assert res[5] < res[3], res
    assert res[3] < 0.9  # not totally scrambled


def test_wide_code_multi_lane_carry():
    """d=9 has r = 40 > 30 detectors/slice: the carry splits across two
    label lanes; the stream must still decode coherently."""
    code = rotated_surface(9)
    h = code.raw_parity_check_c2
    lz = code.z_operator_matrix()
    dets, par = sample_phenomenological_stream(
        jax.random.key(4), 0.004, 0.004, 128, 16, h, lz)
    dets, par = np.asarray(dets), np.asarray(par)[:, 0]
    dev = DeviceStreamingDecoder(h, lz, window=8, commit=4)
    assert dev._n_carry == 2
    obs_d = dev.decode_stream(dets)
    host = StreamingDecoder(h, lz, window=8, commit=4)
    obs_h = host.decode_stream(dets)
    agree = np.mean((obs_h & 1) == (obs_d & 1))
    assert agree > 0.9, agree
    fail_d = np.mean((obs_d & 1) != par)
    assert fail_d < 0.2, fail_d
