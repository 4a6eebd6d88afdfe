"""Shared utilities: bit packing re-exports, throughput counters, and
profiling hooks (the reference's only instrumentation is two wall-clock
prints — reference: test/test_fidelity.py:38-46)."""

from qcss_tpu.ops.gf2_jax import (
    bits_to_index,
    pack_bits,
    packed_width,
    parity32,
    popcount32,
    unpack_bits,
)
from qcss_tpu.utils.profiling import Throughput, trace

__all__ = [
    "bits_to_index",
    "pack_bits",
    "packed_width",
    "parity32",
    "popcount32",
    "unpack_bits",
    "Throughput",
    "trace",
]
