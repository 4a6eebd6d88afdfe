"""Batched classical bit-vector primitives.

Direct counterparts of the reference's ``quil_classical`` module, which
emits straight-line Quil classical instruction streams to compute these at
QVM run time (reference: quil_classical.py:60-127). Here each is a single
batched array op executed on device; the ``MemoryChunk`` scratch-buffer
discipline (reference: quil_classical.py:10-57) has no analogue — classical
temporaries are SSA values in the traced program.

These are the building blocks the higher-level decode/FTQC paths compose;
they are exposed standalone for API parity and for tests.
"""

import jax
import jax.numpy as jnp

from qcss_tpu.ops import gf2_jax


def matmul_bits(mat: jax.Array, vecs: jax.Array) -> jax.Array:
    """``(mat @ v) mod 2`` for a batch of bit vectors: vecs [..., n],
    mat [m, n] -> [..., m]. (reference: quil_classical.py:60-79 emits
    O(m*n) MOVE/AND/XOR instructions per vector; here it is one int8
    matmul.)"""
    return gf2_jax.mod2_matmul(vecs, jnp.asarray(mat).T)


def string_match(vecs: jax.Array, pattern: jax.Array) -> jax.Array:
    """1 where the bit-vector equals the constant pattern, else 0:
    vecs [..., n], pattern [n] -> [...] uint8
    (reference: quil_classical.py:81-97)."""
    diff = vecs ^ jnp.asarray(pattern, vecs.dtype)
    return (~jnp.any(diff != 0, axis=-1)).astype(jnp.uint8)


def conditional_xor(vecs: jax.Array, pattern: jax.Array, flags: jax.Array) -> jax.Array:
    """XOR the constant pattern into each vector whose flag is set:
    vecs [..., n], pattern [n], flags [...] -> [..., n]
    (reference: quil_classical.py:99-111)."""
    pattern = jnp.asarray(pattern, vecs.dtype)
    return vecs ^ (flags[..., None].astype(vecs.dtype) * pattern)


def majority_vote(bits: jax.Array) -> jax.Array:
    """Majority over the last axis (must have odd length):
    bits [..., k] -> [...] uint8 (reference: quil_classical.py:113-127)."""
    k = bits.shape[-1]
    if k % 2 == 0:
        raise ValueError("inputs length must be odd")
    votes = jnp.sum(bits.astype(jnp.int32), axis=-1)
    return (votes >= (k + 1) // 2).astype(jnp.uint8)
