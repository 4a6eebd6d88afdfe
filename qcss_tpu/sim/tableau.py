"""Batched CHP (Aaronson-Gottesman) stabilizer-tableau simulation in JAX.

The tableau holds, per Monte-Carlo sample, n destabilizer rows followed by
n stabilizer rows as GF(2) X/Z bit matrices plus a sign bit per row. All
gate updates are column-wise XOR/AND vector ops over the whole batch at
once; measurements vectorize over samples with per-sample branch masking
(random vs deterministic outcomes) so the whole thing stays inside one
`jax.jit` with static shapes.

This component replaces both the reference's external QVM simulator (its
only execution substrate — reference: test/test_ftqc.py:153-156) and its
host-side symplectic verifier `transform_stabilisers` (reference:
css_code.py:737-781), which is the destabilizer- and phase-free special
case of these update rules.

Layout: x, z are [batch, 2n, n] uint8 (rows 0..n-1 destabilizers,
n..2n-1 stabilizers); r is [batch, 2n] uint8 (sign bit, 1 = negative).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from qcss_tpu.circuits.ir import Circuit


class Tableau(NamedTuple):
    x: jax.Array  # [B, 2n, n] uint8
    z: jax.Array  # [B, 2n, n] uint8
    r: jax.Array  # [B, 2n] uint8

    @property
    def batch(self) -> int:
        return self.x.shape[0]

    @property
    def n(self) -> int:
        return self.x.shape[-1]

    def stabilizer_check_matrix(self) -> jax.Array:
        """[B, n, 2n] check matrix (X columns then Z columns) of the
        stabilizer half — the representation used by
        `qcss_tpu.codes.symplectic` and the reference's verifier tests."""
        n = self.n
        return jnp.concatenate([self.x[:, n:, :], self.z[:, n:, :]], axis=-1)


def zero_state(batch: int, n: int) -> Tableau:
    """|0>^n for every sample: destabilizer i = X_i, stabilizer i = Z_i."""
    eye = jnp.eye(n, dtype=jnp.uint8)
    zeros = jnp.zeros((n, n), dtype=jnp.uint8)
    x = jnp.broadcast_to(
        jnp.concatenate([eye, zeros], axis=0), (batch, 2 * n, n)
    )
    z = jnp.broadcast_to(
        jnp.concatenate([zeros, eye], axis=0), (batch, 2 * n, n)
    )
    r = jnp.zeros((batch, 2 * n), dtype=jnp.uint8)
    return Tableau(x, z, r)


# ---------------------------------------------------------------------------
# Gates (Clifford conjugation rules, all rows and samples at once)
# ---------------------------------------------------------------------------

def apply_h(t: Tableau, q: int) -> Tableau:
    xq, zq = t.x[:, :, q], t.z[:, :, q]
    r = t.r ^ (xq & zq)
    return Tableau(t.x.at[:, :, q].set(zq), t.z.at[:, :, q].set(xq), r)


def apply_s(t: Tableau, q: int) -> Tableau:
    xq, zq = t.x[:, :, q], t.z[:, :, q]
    r = t.r ^ (xq & zq)
    return Tableau(t.x, t.z.at[:, :, q].set(zq ^ xq), r)


def apply_x(t: Tableau, q: int) -> Tableau:
    return Tableau(t.x, t.z, t.r ^ t.z[:, :, q])


def apply_z(t: Tableau, q: int) -> Tableau:
    return Tableau(t.x, t.z, t.r ^ t.x[:, :, q])


def apply_y(t: Tableau, q: int) -> Tableau:
    return Tableau(t.x, t.z, t.r ^ t.x[:, :, q] ^ t.z[:, :, q])


def apply_cnot(t: Tableau, c: int, q: int) -> Tableau:
    xc, zc = t.x[:, :, c], t.z[:, :, c]
    xt, zt = t.x[:, :, q], t.z[:, :, q]
    r = t.r ^ (xc & zt & (xt ^ zc ^ 1))
    return Tableau(
        t.x.at[:, :, q].set(xt ^ xc),
        t.z.at[:, :, c].set(zc ^ zt),
        r,
    )


def apply_cz(t: Tableau, a: int, b: int) -> Tableau:
    xa, za = t.x[:, :, a], t.z[:, :, a]
    xb, zb = t.x[:, :, b], t.z[:, :, b]
    r = t.r ^ (xa & xb & (za ^ zb))
    return Tableau(
        t.x,
        t.z.at[:, :, a].set(za ^ xb).at[:, :, b].set(zb ^ xa),
        r,
    )


_GATE_FNS = {
    "I": lambda t, q: t,
    "X": apply_x,
    "Y": apply_y,
    "Z": apply_z,
    "H": apply_h,
    "S": apply_s,
    "CNOT": apply_cnot,
    "CZ": apply_cz,
}


# ---------------------------------------------------------------------------
# Vectorized multi-qubit forms (transversal layers)
#
# Transversal gates touch pairwise-disjoint qubit (pairs), so their column
# updates are independent and the sign contributions XOR together — one
# gather/scatter instead of n sequential gate applications. These carry the
# weight of Steane error correction, where every round applies whole-block
# CNOT/H layers (reference: css_code.py:457-467 via apply_transversally,
# css_code.py:852-853).
# ---------------------------------------------------------------------------

def _parity_reduce(bits: jax.Array) -> jax.Array:
    """XOR-reduce uint8 bits over the last axis."""
    return (jnp.sum(bits.astype(jnp.int32), axis=-1) & 1).astype(jnp.uint8)


def apply_h_many(t: Tableau, qubits) -> Tableau:
    q = jnp.asarray(qubits, dtype=jnp.int32)
    xq, zq = t.x[:, :, q], t.z[:, :, q]
    r = t.r ^ _parity_reduce(xq & zq)
    return Tableau(t.x.at[:, :, q].set(zq), t.z.at[:, :, q].set(xq), r)


def apply_s_many(t: Tableau, qubits) -> Tableau:
    q = jnp.asarray(qubits, dtype=jnp.int32)
    xq, zq = t.x[:, :, q], t.z[:, :, q]
    r = t.r ^ _parity_reduce(xq & zq)
    return Tableau(t.x, t.z.at[:, :, q].set(zq ^ xq), r)


def apply_z_many(t: Tableau, qubits) -> Tableau:
    q = jnp.asarray(qubits, dtype=jnp.int32)
    return Tableau(t.x, t.z, t.r ^ _parity_reduce(t.x[:, :, q]))


def apply_x_many(t: Tableau, qubits) -> Tableau:
    q = jnp.asarray(qubits, dtype=jnp.int32)
    return Tableau(t.x, t.z, t.r ^ _parity_reduce(t.z[:, :, q]))


def apply_cnot_many(t: Tableau, controls, targets) -> Tableau:
    """CNOT on m pairwise-disjoint (control, target) pairs at once."""
    c = jnp.asarray(controls, dtype=jnp.int32)
    q = jnp.asarray(targets, dtype=jnp.int32)
    xc, zc = t.x[:, :, c], t.z[:, :, c]
    xt, zt = t.x[:, :, q], t.z[:, :, q]
    r = t.r ^ _parity_reduce(xc & zt & (xt ^ zc ^ 1))
    return Tableau(
        t.x.at[:, :, q].set(xt ^ xc),
        t.z.at[:, :, c].set(zc ^ zt),
        r,
    )


def apply_cz_many(t: Tableau, qubits_a, qubits_b) -> Tableau:
    a = jnp.asarray(qubits_a, dtype=jnp.int32)
    b = jnp.asarray(qubits_b, dtype=jnp.int32)
    xa, za = t.x[:, :, a], t.z[:, :, a]
    xb, zb = t.x[:, :, b], t.z[:, :, b]
    r = t.r ^ _parity_reduce(xa & xb & (za ^ zb))
    return Tableau(
        t.x,
        t.z.at[:, :, a].set(za ^ xb).at[:, :, b].set(zb ^ xa),
        r,
    )


def apply_gate(t: Tableau, name: str, *qubits: int) -> Tableau:
    return _GATE_FNS[name](t, *qubits)


def run_circuit(t: Tableau, circuit: Circuit) -> Tableau:
    """Apply every gate of a Circuit (unrolled at trace time). For long
    circuits inside jitted programs prefer `run_circuit_scanned`, which
    produces an O(1)-size graph."""
    for g in circuit:
        t = apply_gate(t, g.name, *g.qubits)
    return t


# Opcode order for array-lowered circuits; must match Circuit.to_arrays.
_SCAN_BRANCHES = (
    lambda t, a, b: t,                      # I
    lambda t, a, b: apply_x(t, a),
    lambda t, a, b: apply_y(t, a),
    lambda t, a, b: apply_z(t, a),
    lambda t, a, b: apply_h(t, a),
    lambda t, a, b: apply_s(t, a),
    lambda t, a, b: apply_cnot(t, a, b),
    lambda t, a, b: apply_cz(t, a, b),
)


def run_circuit_scanned(t: Tableau, ops, q0, q1) -> Tableau:
    """Execute an array-lowered circuit (see `Circuit.to_arrays`) with a
    `lax.scan` over instructions — the graph contains each gate rule once,
    regardless of circuit length. All gate rules accept traced qubit
    indices (gathers/scatters on the qubit axis)."""

    def body(carry, xs):
        op, a, b = xs
        return jax.lax.switch(op, _SCAN_BRANCHES, carry, a, b), None

    xs = (jnp.asarray(ops, jnp.int32), jnp.asarray(q0, jnp.int32),
          jnp.asarray(q1, jnp.int32))
    t, _ = jax.lax.scan(body, t, xs)
    return t


def measure_many(t: Tableau, qubits, key: jax.Array) -> tuple[Tableau, jax.Array]:
    """Measure a sequence of qubits in Z order-sequentially via one scanned
    measurement kernel. Returns (state, outcomes [B, len(qubits)])."""
    q = jnp.asarray(qubits, dtype=jnp.int32)
    keys = jax.random.split(key, q.shape[0])

    def body(carry, xs):
        qq, kk = xs
        carry, out = measure_z(carry, qq, kk)
        return carry, out

    t, outs = jax.lax.scan(body, t, (q, keys))
    return t, outs.T


def reset_many(t: Tableau, qubits, key: jax.Array) -> Tableau:
    """Reset a sequence of qubits to |0> via one scanned reset kernel."""
    q = jnp.asarray(qubits, dtype=jnp.int32)
    keys = jax.random.split(key, q.shape[0])

    def body(carry, xs):
        qq, kk = xs
        return reset_z(carry, qq, kk), None

    t, _ = jax.lax.scan(body, t, (q, keys))
    return t


def select(mask: jax.Array, new: Tableau, old: Tableau) -> Tableau:
    """Per-sample select: take `new` where mask[b] else `old`."""
    m2 = mask[:, None].astype(bool)
    m3 = mask[:, None, None].astype(bool)
    return Tableau(
        jnp.where(m3, new.x, old.x),
        jnp.where(m3, new.z, old.z),
        jnp.where(m2, new.r, old.r),
    )


def run_circuit_masked(t: Tableau, circuit: Circuit, mask: jax.Array) -> Tableau:
    """Apply a circuit only to samples where mask[b] is set — the execution
    form of classical feedback (`if_then`) and masked repeat-until-success
    retries under batching."""
    return select(mask, run_circuit(t, circuit), t)


def apply_pauli_frame(t: Tableau, x_flips: jax.Array, z_flips: jax.Array) -> Tableau:
    """Inject a batch of Pauli errors: X on qubits with x_flips[b, q] = 1 and
    Z where z_flips[b, q] = 1 (Y = both). Only row signs change: row i picks
    up a sign for every anticommuting position.

    This is the device form of noise injection — one fused einsum instead of
    per-qubit gate applications.
    """
    zi = t.z.astype(jnp.int32)
    xi = t.x.astype(jnp.int32)
    flips = (
        jnp.einsum("brn,bn->br", zi, x_flips.astype(jnp.int32))
        + jnp.einsum("brn,bn->br", xi, z_flips.astype(jnp.int32))
    ) & 1
    return Tableau(t.x, t.z, t.r ^ flips.astype(jnp.uint8))


# ---------------------------------------------------------------------------
# Measurement
# ---------------------------------------------------------------------------

def _g_exponent(x1, z1, x2, z2):
    """Aaronson-Gottesman g: the exponent of i picked up when multiplying
    the single-qubit Pauli (x1, z1) by (x2, z2). Values in {-1, 0, 1}."""
    x1 = x1.astype(jnp.int8)
    z1 = z1.astype(jnp.int8)
    x2 = x2.astype(jnp.int8)
    z2 = z2.astype(jnp.int8)
    return (
        x1 * z1 * (z2 - x2)
        + x1 * (1 - z1) * z2 * (2 * x2 - 1)
        + (1 - x1) * z1 * x2 * (1 - 2 * z2)
    )


def measure_z(t: Tableau, q: int, key: jax.Array) -> tuple[Tableau, jax.Array]:
    """Measure qubit q in the Z basis across the batch.

    Per sample: if some stabilizer row anticommutes with Z_q the outcome is
    random (the tableau is updated by the AG row operations and the outcome
    drawn from `key`); otherwise the outcome is deterministic (the sign of
    the product of stabilizers whose destabilizer partners anticommute).
    Both branches are computed batch-wide and selected per sample.

    Returns (new_tableau, outcomes[B] uint8).
    """
    B, two_n, n = t.x.shape[0], t.x.shape[1], t.n
    row_ids = jnp.arange(two_n, dtype=jnp.int32)

    xq = t.x[:, :, q]  # [B, 2n]
    stab_anticommutes = xq[:, n:] == 1  # [B, n]
    is_random = jnp.any(stab_anticommutes, axis=1)  # [B]

    # ---- random branch -----------------------------------------------------
    p_row = n + jnp.argmax(stab_anticommutes, axis=1).astype(jnp.int32)  # [B]
    idx = p_row[:, None, None]
    px = jnp.take_along_axis(t.x, idx, axis=1)  # [B, 1, n]
    pz = jnp.take_along_axis(t.z, idx, axis=1)
    pr = jnp.take_along_axis(t.r, p_row[:, None], axis=1)[:, 0]  # [B]

    # rowsum(i, p) for every row i != p with x_iq = 1.
    targets = (xq == 1) & (row_ids[None, :] != p_row[:, None])  # [B, 2n]
    g_sum = jnp.sum(
        _g_exponent(px, pz, t.x, t.z), axis=-1, dtype=jnp.int32
    )  # [B, 2n]
    r4 = (
        2 * t.r.astype(jnp.int32)
        + 2 * pr.astype(jnp.int32)[:, None]
        + g_sum
    ) % 4
    new_r = jnp.where(targets, (r4 // 2).astype(jnp.uint8), t.r)
    new_x = jnp.where(targets[:, :, None], t.x ^ px, t.x)
    new_z = jnp.where(targets[:, :, None], t.z ^ pz, t.z)

    # Copy row p into its destabilizer slot p - n.
    dest = row_ids[None, :] == (p_row - n)[:, None]  # [B, 2n]
    new_x = jnp.where(dest[:, :, None], px, new_x)
    new_z = jnp.where(dest[:, :, None], pz, new_z)
    new_r = jnp.where(dest, pr[:, None], new_r)

    # Row p becomes +/- Z_q with a fresh random sign = the outcome.
    rand_bit = jax.random.bernoulli(key, 0.5, (B,)).astype(jnp.uint8)
    at_p = row_ids[None, :] == p_row[:, None]
    zq_col = (jnp.arange(n, dtype=jnp.int32)[None, None, :] == q).astype(jnp.uint8)
    new_x = jnp.where(at_p[:, :, None], jnp.zeros_like(new_x), new_x)
    new_z = jnp.where(at_p[:, :, None], zq_col, new_z)
    new_r = jnp.where(at_p, rand_bit[:, None], new_r)
    random_state = Tableau(new_x, new_z, new_r)

    # ---- deterministic branch ------------------------------------------------
    # The outcome is the sign of the product of stabilizer rows n+i over
    # destabilizer rows i that anticommute with Z_q. Because the selected
    # rows pairwise commute, the ordered-product phase has a closed form:
    #
    #   product = i^( sum_i m_i (2 r_i + |x_i & z_i|)
    #                 + 2 * sum_{j<l} z_j . x_l )  *  X^0 Z^(e_q)
    #
    # where the ordered pair term reduces, mod 2, to an exclusive prefix
    # count — log-depth (cumsum) instead of the textbook O(n) sequential
    # row accumulation.
    m = (xq[:, :n] == 1).astype(jnp.int32)  # [B, n] selected stabilizers
    sx = t.x[:, n:, :].astype(jnp.int32) * m[:, :, None]
    sz = t.z[:, n:, :].astype(jnp.int32) * m[:, :, None]
    prefix_z = jnp.cumsum(sz, axis=1) - sz  # exclusive prefix counts
    pair = jnp.sum(sx * prefix_z, axis=(1, 2))  # [B]
    y = jnp.sum(t.x[:, n:, :] & t.z[:, n:, :], axis=-1).astype(jnp.int32)
    base = jnp.sum(m * (2 * t.r[:, n:].astype(jnp.int32) + y), axis=1)
    det_outcome = (((base + 2 * pair) % 4) // 2).astype(jnp.uint8)

    outcome = jnp.where(is_random, rand_bit, det_outcome)
    state = select(is_random, random_state, t)
    return state, outcome


def reset_z(t: Tableau, q: int, key: jax.Array) -> Tableau:
    """Reset qubit q to |0>: measure in Z, then flip with X where the
    outcome was 1 (the reference's CodeBlock.reset does the same with an
    if_then — reference: qecc.py:33-42)."""
    t, outcome = measure_z(t, q, key)
    flipped = apply_x(t, q)
    return select(outcome, flipped, t)
