"""Clifford circuit/program IR and encoding-network synthesis."""

from qcss_tpu.circuits.ir import (
    Circuit,
    Program,
    GateInst,
    MeasureInst,
    ResetInst,
    IfThenInst,
    DeclareInst,
    BitRef,
    CLIFFORD_1Q,
    CLIFFORD_2Q,
)

__all__ = [
    "Circuit",
    "Program",
    "GateInst",
    "MeasureInst",
    "ResetInst",
    "IfThenInst",
    "DeclareInst",
    "BitRef",
    "CLIFFORD_1Q",
    "CLIFFORD_2Q",
]
