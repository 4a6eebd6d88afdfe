"""Block-engine equivalence: every UnpackedEngine/PackedEngine block
operation must produce identical states (after unpacking the word-aligned
layout back to the contiguous one)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcss_tpu.circuits.ir import Circuit
from qcss_tpu.ftqc.engines import PackedEngine, UnpackedEngine
from qcss_tpu.sim import tableau as tb
from qcss_tpu.sim import tableau_packed as tp
from qcss_tpu.sim.noise import NoiseModel

N = 7          # Steane-sized blocks
N_BLOCKS = 3
BATCH = 4


def make_engines(noise=None):
    noise = noise or NoiseModel()
    return (UnpackedEngine(N, N_BLOCKS, noise), PackedEngine(N, N_BLOCKS, noise))


def packed_to_contiguous(eng: PackedEngine, t: tp.PackedTableau) -> np.ndarray:
    """Extract (x, z, r) restricted to real qubits, mapped to the contiguous
    block layout of the unpacked engine, as comparable arrays."""
    up = tp.to_unpacked(t)
    cols = np.concatenate(
        [np.arange(N) + b * eng.stride for b in range(N_BLOCKS)]
    )
    return (
        np.asarray(up.x)[:, :, cols],
        np.asarray(up.z)[:, :, cols],
        np.asarray(up.r),
    )


def unpacked_arrays(t: tb.Tableau):
    return np.asarray(t.x), np.asarray(t.z), np.asarray(t.r)


def entangle(ue, pe, key):
    """Drive both engines into the same nontrivial state via a shared
    block-local circuit on every block."""
    circ = Circuit()
    for q in range(N):
        circ.h(q)
    for q in range(N - 1):
        circ.cnot(q, q + 1)
    circ.s(0).cz(0, N - 1)
    arrays = circ.to_arrays()
    ut = ue.zero_state(BATCH)
    pt = pe.zero_state(BATCH)
    for b in range(N_BLOCKS):
        ut = ue.run_block_circuit(ut, arrays, b, key)
        pt = pe.run_block_circuit(pt, arrays, b, key)
    return ut, pt


def rows_equal_upto_padding(ue, pe, ut, pt):
    """Compare states. The packed engine's rows live on a wider qubit set
    (padded columns are always zero); row ORDER differs only by the
    destabilizer/stabilizer split positions, which both layouts share when
    n_blocks*stride rows line up — so compare per-block row slices."""
    px, pz, pr = packed_to_contiguous(pe, pt)
    uxp, uzp, urp = unpacked_arrays(ut)
    # Rows: unpacked has 2*(3N); packed has 2*(3*stride). Compare the rows
    # corresponding to real qubits: destabilizers i and stabilizers i for
    # qubit (b, q) sit at row b*stride + q (+ total/2 for stabilizers).
    n_tot_u = N * N_BLOCKS
    n_tot_p = pe.stride * N_BLOCKS
    rows_u, rows_p = [], []
    for b in range(N_BLOCKS):
        for q in range(N):
            rows_u += [b * N + q, n_tot_u + b * N + q]
            rows_p += [b * pe.stride + q, n_tot_p + b * pe.stride + q]
    assert np.array_equal(uxp[:, rows_u, :], px[:, rows_p, :])
    assert np.array_equal(uzp[:, rows_u, :], pz[:, rows_p, :])
    assert np.array_equal(urp[:, rows_u], pr[:, rows_p])


@pytest.mark.parametrize("op", ["cnot", "cz", "h", "s", "x", "z"])
def test_transversal_ops_agree(op):
    ue, pe = make_engines()
    key = jax.random.key(3)
    ut, pt = entangle(ue, pe, key)
    k = jax.random.key(7)
    if op == "cnot":
        ut2 = ue.transversal_cnot(ut, 0, 1, k)
        pt2 = pe.transversal_cnot(pt, 0, 1, k)
    elif op == "cz":
        ut2 = ue.transversal_cz(ut, 0, 2, k)
        pt2 = pe.transversal_cz(pt, 0, 2, k)
    else:
        ut2 = ue.transversal_1q(ut, op.upper(), 1, k)
        pt2 = pe.transversal_1q(pt, op.upper(), 1, k)
    rows_equal_upto_padding(ue, pe, ut2, pt2)


def test_pauli_inject_agrees():
    ue, pe = make_engines()
    key = jax.random.key(5)
    ut, pt = entangle(ue, pe, key)
    rng = np.random.default_rng(0)
    x_row = jnp.asarray(rng.integers(0, 2, N), jnp.uint8)
    z_row = jnp.asarray(rng.integers(0, 2, N), jnp.uint8)
    mask = jnp.asarray([1, 0, 1, 1], jnp.uint8)
    ut2 = ue.pauli_inject(ut, 2, x_row, z_row, mask)
    pt2 = pe.pauli_inject(pt, 2, x_row, z_row, mask)
    rows_equal_upto_padding(ue, pe, ut2, pt2)


def test_measure_block_agrees():
    ue, pe = make_engines()
    key = jax.random.key(11)
    ut, pt = entangle(ue, pe, key)
    k = jax.random.key(13)
    ut2, uo = ue.measure_block(ut, 1, k)
    pt2, po = pe.measure_block(pt, 1, k)
    assert np.array_equal(np.asarray(uo), np.asarray(po))
    rows_equal_upto_padding(ue, pe, ut2, pt2)


def test_reset_block_agrees():
    ue, pe = make_engines()
    key = jax.random.key(17)
    ut, pt = entangle(ue, pe, key)
    k = jax.random.key(19)
    ut2 = ue.reset_block(ut, 0, k)
    pt2 = pe.reset_block(pt, 0, k)
    rows_equal_upto_padding(ue, pe, ut2, pt2)
