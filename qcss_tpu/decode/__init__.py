"""Batched syndrome extraction, lookup-table decoding, and Monte-Carlo
logical-error-rate estimation — the device-side replacement for the
reference's emitted Quil classical decode programs
(reference: css_code.py:649-713, quil_classical.py:60-111) and its
QVM-numshots fidelity harness (reference: test/test_fidelity.py)."""

from qcss_tpu.decode.lut import (
    decode_corrections,
    correct_errors,
    detect_errors,
)
from qcss_tpu.decode.montecarlo import (
    sample_depolarizing,
    mc_decode_step,
    mc_decode_rounds,
    logical_error_rate,
)
from qcss_tpu.decode.sweep import error_rate_curve
from qcss_tpu.decode.multiround import multiround_error_rate
from qcss_tpu.decode.uf import (
    MatchingGraph,
    UFDecoder,
    graph_from_checks,
    spacetime_graph,
    uf_logical_error_rate,
    uf_phenomenological_error_rate,
    weights_from_probs,
)
from qcss_tpu.decode.calibrate import calibrated_graph, estimate_edge_probs
from qcss_tpu.decode.correlated import (
    conditional_weights,
    correlated_logical_error_rate,
)
from qcss_tpu.decode.device_uf import DeviceUFDecoder, make_obs_decoder
from qcss_tpu.decode.device_streaming import (
    DeviceStreamingDecoder,
    stream_memory_rate,
    stream_memory_rate_dem,
)
from qcss_tpu.decode.dem2 import TwoSectorDEM, build_two_sector_dem
from qcss_tpu.decode.bp import (
    BPDecoder,
    bp_logical_error_rate,
    bp_phenomenological_error_rate,
    spacetime_tanner,
)
from qcss_tpu.decode.bp_dem import (
    CircuitTanner,
    build_circuit_tanner,
    build_joint_circuit_tanner,
    circuit_bp_decoder,
    joint_circuit_bp_decoder,
)
from qcss_tpu.decode.bp_streaming import (
    BPStreamingDecoder,
    CircuitBPStreamingDecoder,
)
from qcss_tpu.decode.belief import BeliefMatchingDecoder
from qcss_tpu.decode.mwpm import MWPMDecoder, MWPMOracle
from qcss_tpu.decode.dem import (
    circuit_level_graph,
    extraction_gate_list,
)
from qcss_tpu.decode.mld import MLDecoder, mld_logical_error_rate
from qcss_tpu.decode.parallel_window import (
    ParallelWindowDecoder,
    parallel_window_memory_rate,
)
from qcss_tpu.decode.streaming import (
    StreamingDecoder,
    sample_phenomenological_stream,
)
from qcss_tpu.decode.spacetime import (
    detector_history,
    spacetime_check_matrix,
    spacetime_correction_lut,
)
from qcss_tpu.decode import classical

__all__ = [
    "MatchingGraph",
    "UFDecoder",
    "graph_from_checks",
    "spacetime_graph",
    "uf_logical_error_rate",
    "uf_phenomenological_error_rate",
    "weights_from_probs",
    "circuit_level_graph",
    "DeviceUFDecoder",
    "make_obs_decoder",
    "DeviceStreamingDecoder",
    "stream_memory_rate",
    "stream_memory_rate_dem",
    "TwoSectorDEM",
    "build_two_sector_dem",
    "BPDecoder",
    "bp_logical_error_rate",
    "bp_phenomenological_error_rate",
    "spacetime_tanner",
    "CircuitTanner",
    "build_circuit_tanner",
    "build_joint_circuit_tanner",
    "circuit_bp_decoder",
    "estimate_edge_probs",
    "joint_circuit_bp_decoder",
    "BPStreamingDecoder",
    "calibrated_graph",
    "CircuitBPStreamingDecoder",
    "BeliefMatchingDecoder",
    "MWPMDecoder",
    "MWPMOracle",
    "conditional_weights",
    "correlated_logical_error_rate",
    "MLDecoder",
    "mld_logical_error_rate",
    "ParallelWindowDecoder",
    "parallel_window_memory_rate",
    "StreamingDecoder",
    "sample_phenomenological_stream",
    "extraction_gate_list",
    "detector_history",
    "spacetime_check_matrix",
    "spacetime_correction_lut",
    "decode_corrections",
    "correct_errors",
    "detect_errors",
    "sample_depolarizing",
    "mc_decode_step",
    "mc_decode_rounds",
    "logical_error_rate",
    "error_rate_curve",
    "multiround_error_rate",
    "classical",
]
