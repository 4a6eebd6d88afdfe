"""CSS-code construction: validation, standard-form reduction, stabilizer
generators, logical operators, syndrome tables, transversal-gate
classification, plus a library of standard code families."""

from qcss_tpu.codes.css import CSSCode
from qcss_tpu.codes.pauli import PauliOperator, pauli_for_row
from qcss_tpu.codes.qecc import QECC
from qcss_tpu.codes import families

__all__ = ["CSSCode", "QECC", "PauliOperator", "pauli_for_row", "families"]
