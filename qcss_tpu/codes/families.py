"""Standard CSS code family constructors.

The reference constructs codes only by passing raw parity-check matrices in
tests (reference: test/test_css_code.py:12-18); this module provides the
named families used across the framework's tests and benchmarks:
Steane [[7,1,3]], Shor [[9,1,3]], quantum Reed-Muller [[15,1,3]], rotated
surface codes d=3..11, and toric codes (k=2, decode/extraction use only).
"""

from __future__ import annotations

import numpy as np

from qcss_tpu.codes.css import CSSCode


def hamming_parity_check(r: int = 3) -> np.ndarray:
    """Parity check of the [2^r - 1, 2^r - 1 - r] Hamming code; column j
    (1-indexed) is the big-endian binary representation of j. For r=3 this
    is exactly the matrix used by the reference's tests
    (reference: test/test_css_code.py:13-18)."""
    n = (1 << r) - 1
    h = np.zeros((r, n), dtype=np.uint8)
    for j in range(1, n + 1):
        for bit in range(r):
            h[r - 1 - bit, j - 1] = (j >> bit) & 1
    return h


def steane(**kwargs) -> CSSCode:
    """The Steane [[7,1,3]] code: CSS(Hamming(7,4), Hamming(7,4))."""
    h = hamming_parity_check(3)
    return CSSCode(h, h, **kwargs)


def shor(**kwargs) -> CSSCode:
    """The Shor [[9,1,3]] code.

    X checks: X^6 over blocks (1,2) and (2,3); Z checks: Z_i Z_{i+1} within
    each 3-qubit block. Note the reference's unique-decoding-threshold logic
    reports t=0 for this code (degenerate weight-1 Z errors share a
    syndrome), which this constructor reproduces faithfully.
    """
    h_x = np.array(
        [
            [1, 1, 1, 1, 1, 1, 0, 0, 0],
            [0, 0, 0, 1, 1, 1, 1, 1, 1],
        ],
        dtype=np.uint8,
    )
    h_z = np.zeros((6, 9), dtype=np.uint8)
    for block in range(3):
        for i in range(2):
            h_z[2 * block + i, 3 * block + i] = 1
            h_z[2 * block + i, 3 * block + i + 1] = 1
    return CSSCode(h_x, h_z, **kwargs)


def reed_muller_15(**kwargs) -> CSSCode:
    """The quantum Reed-Muller [[15,1,3]] code.

    H_X is the Hamming(15,11) check (4x15); H_Z stacks the H_X rows with all
    pairwise bitwise products (10x15 total), i.e. the punctured RM(1,4)
    structure. Famous for a transversal T gate (outside the reference's
    Clifford-only classification)."""
    h_x = hamming_parity_check(4)
    rows = [h_x[i] for i in range(4)]
    for i in range(4):
        for j in range(i + 1, 4):
            rows.append(h_x[i] & h_x[j])
    h_z = np.array(rows, dtype=np.uint8)
    return CSSCode(h_x, h_z, **kwargs)


def rotated_surface(d: int, **kwargs) -> CSSCode:
    """Rotated surface code of odd distance d: n = d^2 qubits, k = 1,
    (d^2-1)/2 checks of each type.

    Qubit (row, col) -> index row*d + col. Faces between rows (r, r+1) and
    cols (c, c+1) for r, c in [-1, d-1]; interior faces alternate X/Z by
    checkerboard parity, boundary half-faces survive only on the matching
    boundary type (X on top/bottom, Z on left/right).

    Syndrome-table construction is exponential in the check count, so by
    default tables are skipped and t = (d-1)//2 is set directly; pass
    ``max_table_weight`` to build bounded LUTs for small d.
    """
    if d % 2 == 0 or d < 3:
        raise ValueError("distance must be odd and >= 3")
    n = d * d

    def face_qubits(r: int, c: int) -> list[int]:
        out = []
        for dr in (0, 1):
            for dc in (0, 1):
                rr, cc = r + dr, c + dc
                if 0 <= rr < d and 0 <= cc < d:
                    out.append(rr * d + cc)
        return out

    x_rows, z_rows = [], []
    for r in range(-1, d):
        for c in range(-1, d):
            qubits = face_qubits(r, c)
            if len(qubits) < 2:
                continue
            is_x = (r + c) % 2 != 0
            if len(qubits) == 2:
                on_horizontal_boundary = r == -1 or r == d - 1
                # Weight-2 checks: X faces live on top/bottom, Z on sides.
                if on_horizontal_boundary != is_x:
                    continue
            row = np.zeros(n, dtype=np.uint8)
            row[qubits] = 1
            (x_rows if is_x else z_rows).append(row)

    h_x = np.array(x_rows, dtype=np.uint8)
    h_z = np.array(z_rows, dtype=np.uint8)
    kwargs.setdefault("t", (d - 1) // 2)
    kwargs.setdefault("max_table_weight", 0)
    return CSSCode(h_x, h_z, **kwargs)


def toric(d: int, **kwargs) -> CSSCode:
    """Toric code on a d x d torus: n = 2d^2 edge qubits, k = 2.

    One dependent row of each check type is dropped so the parity checks are
    full rank (the constructor requires independent rows). k=2, so this is
    usable for syndrome extraction / decoding benchmarks only
    (``require_k1=False`` is forced).
    """
    n = 2 * d * d

    def h_edge(r, c):  # horizontal edge to the right of vertex (r, c)
        return (r % d) * d + (c % d)

    def v_edge(r, c):  # vertical edge below vertex (r, c)
        return d * d + (r % d) * d + (c % d)

    x_rows, z_rows = [], []
    for r in range(d):
        for c in range(d):
            # Vertex (star) operator: 4 incident edges -> X check.
            star = np.zeros(n, dtype=np.uint8)
            star[[h_edge(r, c), h_edge(r, c - 1), v_edge(r, c), v_edge(r - 1, c)]] = 1
            x_rows.append(star)
            # Plaquette operator: 4 boundary edges -> Z check.
            plaq = np.zeros(n, dtype=np.uint8)
            plaq[[h_edge(r, c), h_edge(r + 1, c), v_edge(r, c), v_edge(r, c + 1)]] = 1
            z_rows.append(plaq)

    h_x = np.array(x_rows[:-1], dtype=np.uint8)  # drop one dependent row
    h_z = np.array(z_rows[:-1], dtype=np.uint8)
    kwargs.setdefault("t", (d - 1) // 2)
    kwargs.setdefault("max_table_weight", 0)
    kwargs["require_k1"] = False
    return CSSCode(h_x, h_z, **kwargs)
