"""Encoding-network synthesis for CSS codes.

Produces the non-fault-tolerant |0̄⟩ / |+̄⟩ preparation circuits from the
standard-form parity checks, by the stabilizer-transformation derivation of
the reference (reference: css_code.py:203-312): starting from the all-|0⟩
stabilizer group ⟨Z_1..Z_n⟩, Hadamards move identity blocks to the X side
and CNOTs copy them across the A/E regions until the target check matrix
[I A1 A2 | 0; 0 0 0 | D I2 E; ...] is reached.

Gate order is identical to the reference's loops so that symplectic
verification tests agree exactly.
"""

from qcss_tpu.circuits.ir import Circuit


def encode_zero_network(code, qubits=None) -> Circuit:
    """|0̄⟩ preparation network (reference: css_code.py:203-260).

    H on the first r_1 qubits, then CNOT(i -> j) for every 1 in the
    A1/A2 region of the standard-form H_1. Qubits must start in |0⟩^n.
    """
    n, r1 = code.n, code.r_1
    qubits = list(range(n)) if qubits is None else list(qubits)
    h1 = code.parity_check_c1
    circ = Circuit()
    for i in range(r1):
        circ.h(qubits[i])
    for i in range(r1):
        for j in range(r1, n):
            if h1[i, j]:
                circ.cnot(qubits[i], qubits[j])
    return circ


def encode_plus_network(code, qubits=None) -> Circuit:
    """|+̄⟩ preparation network (reference: css_code.py:262-312).

    H on the first r_1 and the last k qubits; CNOT(j -> i) for the E region
    of the standard-form H_2; then the H_1 CNOTs as in `encode_zero_network`.
    """
    n, r1, r2 = code.n, code.r_1, code.r_2
    qubits = list(range(n)) if qubits is None else list(qubits)
    h1, h2 = code.parity_check_c1, code.parity_check_c2
    circ = Circuit()
    for i in range(r1):
        circ.h(qubits[i])
    for i in range(r1 + r2, n):
        circ.h(qubits[i])
    for i in range(r1, r1 + r2):
        for j in range(r1 + r2, n):
            if h2[i - r1, j]:
                circ.cnot(qubits[j], qubits[i])
    for i in range(r1):
        for j in range(r1, n):
            if h1[i, j]:
                circ.cnot(qubits[i], qubits[j])
    return circ
