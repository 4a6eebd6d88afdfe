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


def test_dem_streaming_matches_whole_history():
    """Circuit-level sliding windows (`DeviceStreamingDecoder.from_dem`)
    must be statistically interchangeable with whole-history device
    decoding of the same DEM-sampled shots. The commit rule carries over
    unchanged because every DEM fault signature spans <= 1 slice between
    endpoints — crossing edges all land on next-window slice 0."""
    import jax
    import jax.numpy as jnp

    from qcss_tpu.decode.dem import (circuit_level_graph,
                                     extraction_gate_list)
    from qcss_tpu.decode.device_uf import DeviceUFDecoder
    from qcss_tpu.experiments import memory as M
    from qcss_tpu.ops import gf2_jax
    from qcss_tpu.sim import frame as fr
    from qcss_tpu.sim.noise import NoiseModel

    d, R, B = 3, 20, 512
    code = rotated_surface(d)
    raw = code.raw_parity_check_c2
    logicals = code.z_operator_matrix()
    noise = NoiseModel(p_gate2=3e-3, p_meas=1.5e-2)
    gates = extraction_gate_list(code, raw)
    graph = circuit_level_graph(raw, gates, R, p_gate2=noise.p_gate2,
                                p_meas=noise.p_meas, logicals=logicals)
    ext = tuple(map(jnp.asarray, M.z_extraction_circuit(
        code, checks=raw).to_arrays()))
    comp = fr.maybe_compile(ext, code.n + raw.shape[0])
    syns, word = M._memory_circuit_frames(
        jax.random.key(7), B, R, code, noise, ext, n_anc=raw.shape[0],
        extract_comp=comp)
    raw_j = jnp.asarray(raw, jnp.uint8)
    from qcss_tpu.decode.spacetime import detector_history
    final = gf2_jax.syndromes_dense(word, raw_j)
    dets = np.asarray(detector_history(syns, final))
    par = (np.asarray(word) @ np.asarray(logicals[0])) & 1

    _, obs_wh = DeviceUFDecoder(graph).decode_batch(dets)
    wh = np.asarray(obs_wh) & 1
    dec = DeviceStreamingDecoder.from_dem(
        raw, logicals, gates, window=8, commit=4,
        p_gate2=noise.p_gate2, p_meas=noise.p_meas)
    st = np.asarray(dec.decode_stream(
        dets.reshape(B, R + 1, raw.shape[0]))) & 1
    fail_wh = np.mean(wh != par)
    fail_st = np.mean(st != par)
    assert abs(fail_wh - fail_st) < 0.02, (fail_wh, fail_st)
    assert np.mean(wh == st) > 0.97


def test_dem_stream_memory_rate_smoke():
    """Fused circuit-level streaming harness: sample (frames) + windowed
    DEM decode, O(window) state; failure rate in the whole-history
    ballpark at d=3."""
    from qcss_tpu.decode.device_streaming import stream_memory_rate_dem
    from qcss_tpu.sim.noise import NoiseModel

    code = rotated_surface(3)
    res = stream_memory_rate_dem(
        code, NoiseModel(p_gate2=3e-3, p_meas=1.5e-2),
        rounds=12, batch=512, window=8, commit=4, seed=5)
    assert 0.0 <= res["logical_fail"] < 0.05, res
