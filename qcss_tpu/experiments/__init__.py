"""End-to-end QEC experiments composed from the framework's layers."""

from qcss_tpu.experiments.memory import (
    z_extraction_circuit,
    z_memory_experiment,
)

__all__ = ["z_extraction_circuit", "z_memory_experiment"]
