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
from qcss_tpu.decode import classical

__all__ = [
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
