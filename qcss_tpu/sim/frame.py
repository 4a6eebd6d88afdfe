"""Pauli-frame Monte-Carlo simulator — the sampling fast path.

The batched tableau engines (`sim.tableau`, `sim.tableau_packed`) carry a
full CHP tableau PER SAMPLE: every gate costs O(rows · words) per sample
and every measurement a full-tableau reduction. For the Monte-Carlo
workloads that dominate QEC benchmarking (memory experiments, error-rate
sweeps, break-even curves) that is massively redundant: all samples run
the SAME Clifford circuit and differ only in which Pauli faults struck.

This module propagates only the per-sample Pauli fault frame (the
deviation from the noiseless reference run) through the circuit — the
architecture Stim introduced for CPU sampling (Gidney, "Stim: a fast
stabilizer circuit simulator", arXiv:2103.02202 §4.2), rebuilt TPU-first:
frames are `[B, nq]` bit arrays, gates are XOR/permute column ops, noise
is fused batched injection, and the whole per-round loop jits into a few
elementwise kernels. Per-gate cost drops from O(rows·words) to O(1) bits
per sample — measured >100x over the packed tableau engine on the
memory experiment.

Soundness domain (asserted by callers, see `experiments.memory`):

* the noiseless reference circuit must have DETERMINISTIC measurement
  outcomes (true for syndrome extraction on stabilizer eigenstates);
  outcomes are then reported as deviations (reference ⊕ deviation, with
  the reference outcome fixed to 0 — for a memory experiment this pins
  the reference codeword, which no syndrome/logical-parity statistic can
  distinguish);
* measured qubits must be reset before reuse (the frame simulator does
  not model the post-measurement phase scramble a tableau would track);
* conditional operations must be Pauli (frame-linear). Programs needing
  conditional Clifford bodies or non-deterministic references stay on the
  tableau engines.

Fault injection semantics are bit-compatible with `sim.noise`
(thresholds, 15-way 2q patterns, biased twirled-decoherence tuples), and
single-fault detector signatures are cross-validated against the
independent DEM enumeration (`decode.dem`) in tests/test_frame.py.

(The reference simulates every shot through the Forest QVM state-vector
process — SURVEY.md §3.3; no frame machinery of any kind.)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from qcss_tpu.sim import noise as noise_mod


class Frames(NamedTuple):
    """Per-sample Pauli deviation from the reference run: `x[b, q]` /
    `z[b, q]` set iff sample b carries an X / Z error on qubit q."""

    x: jax.Array  # [B, nq] uint8
    z: jax.Array  # [B, nq] uint8

    @property
    def batch(self) -> int:
        return self.x.shape[0]

    @property
    def n(self) -> int:
        return self.x.shape[1]


def zero_frames(batch: int, n: int) -> Frames:
    z = jnp.zeros((batch, n), dtype=jnp.uint8)
    return Frames(z, z)


# -- gate propagation (conjugation of the frame, no signs) ---------------------


def _prop_h(f: Frames, q, _b) -> Frames:
    xq, zq = f.x[:, q], f.z[:, q]
    return Frames(f.x.at[:, q].set(zq), f.z.at[:, q].set(xq))


def _prop_s(f: Frames, q, _b) -> Frames:
    return Frames(f.x, f.z.at[:, q].set(f.z[:, q] ^ f.x[:, q]))


def _prop_cnot(f: Frames, c, t) -> Frames:
    return Frames(
        f.x.at[:, t].set(f.x[:, t] ^ f.x[:, c]),
        f.z.at[:, c].set(f.z[:, c] ^ f.z[:, t]),
    )


def _prop_cz(f: Frames, a, b) -> Frames:
    z = f.z.at[:, a].set(f.z[:, a] ^ f.x[:, b])
    z = z.at[:, b].set(z[:, b] ^ f.x[:, a])
    return Frames(f.x, z)


def _prop_id(f: Frames, _a, _b) -> Frames:
    return f


# Opcode order matches circuits.ir.OPCODES / tableau._SCAN_BRANCHES.
# Paulis are identity on frames (they change signs only, which frames
# don't track — deviations are defined modulo phase).
_FRAME_BRANCHES = (
    _prop_id,  # I
    _prop_id,  # X
    _prop_id,  # Y
    _prop_id,  # Z
    _prop_h,   # H
    _prop_s,   # S
    _prop_cnot,
    _prop_cz,
)


def propagate_arrays(f: Frames, ops, q0, q1) -> Frames:
    """Noiseless frame propagation through an array-lowered circuit."""

    def body(carry, xs):
        op, a, b = xs
        return jax.lax.switch(op, _FRAME_BRANCHES, carry, a, b), None

    xs = (jnp.asarray(ops, jnp.int32), jnp.asarray(q0, jnp.int32),
          jnp.asarray(q1, jnp.int32))
    f, _ = jax.lax.scan(body, f, xs)
    return f


# -- noise injection (bit-compatible with sim.noise) ----------------------------


def _inject1(f: Frames, q, p, key) -> Frames:
    u = jax.random.uniform(key, (f.batch,), dtype=jnp.float32)
    x_hi, z_lo, z_hi = (jnp.float32(v) for v in noise_mod._thresholds_1q(p))
    x_hit = (u < x_hi).astype(jnp.uint8)
    z_hit = ((u >= z_lo) & (u < z_hi)).astype(jnp.uint8)
    return Frames(
        f.x.at[:, q].set(f.x[:, q] ^ x_hit),
        f.z.at[:, q].set(f.z[:, q] ^ z_hit),
    )


def _inject2(f: Frames, a, b, p, key) -> Frames:
    if isinstance(p, tuple):
        ka, kb = jax.random.split(key)
        return _inject1(_inject1(f, a, p, ka), b, p, kb)
    key_u, key_p = jax.random.split(key)
    hit = (
        jax.random.uniform(key_u, (f.batch,), dtype=jnp.float32) < jnp.float32(p)
    ).astype(jnp.uint8)
    pat = jax.random.randint(key_p, (f.batch,), 1, 16, dtype=jnp.int32)
    x = f.x.at[:, a].set(f.x[:, a] ^ (pat & 1).astype(jnp.uint8) * hit)
    x = x.at[:, b].set(x[:, b] ^ ((pat >> 2) & 1).astype(jnp.uint8) * hit)
    z = f.z.at[:, a].set(f.z[:, a] ^ ((pat >> 1) & 1).astype(jnp.uint8) * hit)
    z = z.at[:, b].set(z[:, b] ^ ((pat >> 3) & 1).astype(jnp.uint8) * hit)
    return Frames(x, z)


def inject1_many(f: Frames, qubits, p, key) -> Frames:
    """IID single-qubit Pauli channel on a set of qubits — the frame
    counterpart of `noise.depolarize1_many` (same thresholds)."""
    q = jnp.asarray(qubits, jnp.int32)
    u = jax.random.uniform(key, (f.batch, q.shape[0]), dtype=jnp.float32)
    x_hi, z_lo, z_hi = (jnp.float32(v) for v in noise_mod._thresholds_1q(p))
    x_hit = (u < x_hi).astype(jnp.uint8)
    z_hit = ((u >= z_lo) & (u < z_hi)).astype(jnp.uint8)
    return Frames(
        f.x.at[:, q].set(f.x[:, q] ^ x_hit),
        f.z.at[:, q].set(f.z[:, q] ^ z_hit),
    )


def inject2_many(f: Frames, controls, targets, p, key) -> Frames:
    """IID two-qubit noise on m disjoint pairs — the frame counterpart of
    `noise.depolarize2_many` (same 15-way patterns / biased split)."""
    if isinstance(p, tuple):
        q_all = jnp.concatenate([
            jnp.asarray(controls, jnp.int32), jnp.asarray(targets, jnp.int32)
        ])
        return inject1_many(f, q_all, p, key)
    c = jnp.asarray(controls, jnp.int32)
    q = jnp.asarray(targets, jnp.int32)
    m = c.shape[0]
    key_u, key_p = jax.random.split(key)
    hit = (
        jax.random.uniform(key_u, (f.batch, m), dtype=jnp.float32)
        < jnp.float32(p)
    ).astype(jnp.uint8)
    pat = jax.random.randint(key_p, (f.batch, m), 1, 16, dtype=jnp.int32)
    x = f.x.at[:, c].set(f.x[:, c] ^ (pat & 1).astype(jnp.uint8) * hit)
    x = x.at[:, q].set(x[:, q] ^ ((pat >> 2) & 1).astype(jnp.uint8) * hit)
    z = f.z.at[:, c].set(f.z[:, c] ^ ((pat >> 1) & 1).astype(jnp.uint8) * hit)
    z = z.at[:, q].set(z[:, q] ^ ((pat >> 3) & 1).astype(jnp.uint8) * hit)
    return Frames(x, z)


def run_arrays_noisy(f: Frames, ops, q0, q1,
                     model: noise_mod.NoiseModel, key) -> Frames:
    """Frame propagation with a depolarizing location after every gate —
    the frame counterpart of `noise.run_arrays_noisy` (same channel
    layout, so hook-error physics is identical)."""
    if model.is_trivial:
        return propagate_arrays(f, ops, q0, q1)

    from qcss_tpu.circuits.ir import OPCODES

    two_q_start = OPCODES["CNOT"]
    ops = jnp.asarray(ops, jnp.int32)
    q0 = jnp.asarray(q0, jnp.int32)
    q1 = jnp.asarray(q1, jnp.int32)
    keys = jax.random.split(key, max(int(ops.shape[0]), 1))

    def body(carry, xs):
        op, a, b, k = xs
        carry = jax.lax.switch(op, _FRAME_BRANCHES, carry, a, b)
        if model.p_gate1 or model.p_gate2:
            carry = jax.lax.cond(
                op >= two_q_start,
                lambda s: _inject2(s, a, b, model.rate2, k),
                lambda s: _inject1(s, a, model.rate1, k),
                carry,
            )
        return carry, None

    f, _ = jax.lax.scan(body, f, (ops, q0, q1, keys))
    return f


def inject_flips(f: Frames, qubits, x_flips, z_flips) -> Frames:
    """XOR explicit [B, m] flips into the frame at the given qubits."""
    q = jnp.asarray(qubits, jnp.int32)
    return Frames(
        f.x.at[:, q].set(f.x[:, q] ^ x_flips),
        f.z.at[:, q].set(f.z[:, q] ^ z_flips),
    )


# -- measurement / reset ---------------------------------------------------------


def measure_deviations(f: Frames, qubits, key=None, p_meas: float = 0.0):
    """Z-basis measurement of qubits whose reference outcome is
    deterministic: returns (frames, outcome deviations [B, m]) — the
    actual outcome is reference ⊕ deviation. Valid only if the measured
    qubits are reset before their next use (see module docstring)."""
    q = jnp.asarray(qubits, jnp.int32)
    outs = f.x[:, q]
    if p_meas:
        outs = noise_mod.flip_bits(outs, p_meas, key)
    return f, outs


def reset_qubits(f: Frames, qubits, key=None, p_reset: float = 0.0) -> Frames:
    """Reset to |0>: the deviation on a reset qubit is the reset-error X
    flip (probability p_reset), independent of its prior frame."""
    q = jnp.asarray(qubits, jnp.int32)
    m = q.shape[0]
    if p_reset:
        xf = jax.random.bernoulli(key, p_reset, (f.batch, m)).astype(jnp.uint8)
    else:
        xf = jnp.zeros((f.batch, m), dtype=jnp.uint8)
    zf = jnp.zeros((f.batch, m), dtype=jnp.uint8)
    return Frames(f.x.at[:, q].set(xf), f.z.at[:, q].set(zf))
