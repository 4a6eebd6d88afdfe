"""Pallas TPU kernels for bit-packed GF(2) operations.

The packed syndrome-extraction kernel computes, per Monte-Carlo sample,
``S[b, r] = parity(popcount(E[b, :] & H[r, :]))`` over uint32 words — the
AND/XOR-parity "matmul" that replaces the reference's per-bit emitted
classical decode (reference: quil_classical.py:60-79) at 1/8th the HBM
traffic of the dense int8 form. The batch axis is tiled through VMEM; the
(small) packed parity check is resident per tile; popcounts ride the VPU.

On non-TPU backends the kernels run in interpreter mode (tests); the
benchmark path (`benchmarks/syndrome_sweep.py`) compares them against the
dense-MXU and packed-XLA forms on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _popcount32(x):
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def _syndrome_kernel(e_ref, h_ref, out_ref):
    """One batch tile: E [TB, W] uint32, H [R, W] uint32 -> S [TB, R] int32.

    The [TB, R, W] AND product lives only in VMEM/registers; the W axis
    reduces immediately, so HBM sees just the packed inputs and the [TB, R]
    output.
    """
    e = e_ref[:]  # [TB, W]
    h = h_ref[:]  # [R, W]
    prod = e[:, None, :] & h[None, :, :]  # [TB, R, W]
    counts = jnp.sum(_popcount32(prod), axis=-1)  # [TB, R]
    out_ref[:] = counts & 1


@functools.partial(jax.jit, static_argnames=("tile_b",))
def syndromes_packed_pallas(
    errors_packed: jax.Array, check_packed: jax.Array, tile_b: int = 512
) -> jax.Array:
    """Packed syndrome extraction as a Pallas kernel.

    errors_packed: [B, W] uint32; check_packed: [R, W] uint32.
    Returns [B, R] uint8. B must be a multiple of `tile_b` (pad upstream).
    """
    B, W = errors_packed.shape
    R = check_packed.shape[0]
    if B % tile_b:
        raise ValueError(f"batch {B} not a multiple of tile_b {tile_b}")

    out = pl.pallas_call(
        _syndrome_kernel,
        grid=(B // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, R), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R), jnp.int32),
        interpret=_interpret(),
    )(errors_packed, check_packed)
    return out.astype(jnp.uint8)


def _syndrome_kernel_t(h_ref, e_ref, out_ref):
    """Lane-oriented tile: E_T [W, TB] uint32 (samples along lanes),
    H [R, W] uint32 scalars in SMEM -> packed S_T [WR, TB] uint32, where
    syndrome bit r of sample b is bit (r % 32) of word S_T[r // 32, b].

    Every vector op runs across the full 128-lane width; the R x W scalar
    loop unrolls at trace time (both are small and static).
    """
    W = e_ref.shape[0]
    R = h_ref.shape[0]
    WR = out_ref.shape[0]
    tb = e_ref.shape[1]
    for rw in range(WR):
        packed = jnp.zeros((tb,), jnp.uint32)
        for r in range(rw * 32, min((rw + 1) * 32, R)):
            acc = jnp.zeros((tb,), jnp.uint32)
            for w in range(W):
                acc = acc ^ (e_ref[w, :] & h_ref[r, w])
            # Parity fold of acc -> one syndrome bit per lane.
            acc = acc ^ (acc >> 16)
            acc = acc ^ (acc >> 8)
            acc = acc ^ (acc >> 4)
            acc = acc ^ (acc >> 2)
            acc = acc ^ (acc >> 1)
            packed = packed | ((acc & jnp.uint32(1)) << (r - rw * 32))
        out_ref[rw, :] = packed


@functools.partial(jax.jit, static_argnames=("tile_b",))
def syndromes_packed_pallas_t(
    errors_packed_t: jax.Array, check_packed: jax.Array, tile_b: int = 2048
) -> jax.Array:
    """Lane-oriented packed syndrome extraction.

    errors_packed_t: [W, B] uint32 — the TRANSPOSED pack (`pack_bits` of
    [B, n] errors, then `.T`); check_packed: [R, W] uint32.
    Returns packed syndromes [ceil(R/32), B] uint32 (bit r of word r//32).

    Input 4W bytes + output 4*ceil(R/32) bytes per sample is the HBM
    speed-of-light form: for a d=11 surface code that is 16+8 bytes/sample
    vs 121+60 for the dense path.
    """
    W, B = errors_packed_t.shape
    R = check_packed.shape[0]
    WR = (R + 31) // 32
    if B % tile_b:
        raise ValueError(f"batch {B} not a multiple of tile_b {tile_b}")

    return pl.pallas_call(
        _syndrome_kernel_t,
        grid=(B // tile_b,),
        in_specs=[
            pl.BlockSpec((R, W), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((W, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((WR, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((WR, B), jnp.uint32),
        interpret=_interpret(),
    )(check_packed, errors_packed_t)


def _lut_decode_kernel(e_ref, h_ref, lut_ref, weights_ref, out_ref):
    """Fused syndrome-extract + LUT-decode tile: emits corrected residuals.

    E [TB, W] packed errors; H [R, W] packed checks; LUT [2^R_pad... no —
    lut [2^R, W] packed corrections; weights [R] = 2^(R-1-r) big-endian.
    out [TB, W] = E ^ LUT[syndrome_index].
    """
    e = e_ref[:]
    h = h_ref[:]
    prod = e[:, None, :] & h[None, :, :]
    syn = jnp.sum(_popcount32(prod), axis=-1) & 1  # [TB, R]
    idx = jnp.sum(syn * weights_ref[:], axis=-1)  # [TB]
    corr = lut_ref[idx]  # gather [TB, W]
    out_ref[:] = e ^ corr


@functools.partial(jax.jit, static_argnames=("tile_b",))
def decode_residual_packed_pallas(
    errors_packed: jax.Array,
    check_packed: jax.Array,
    lut_packed: jax.Array,
    tile_b: int = 512,
) -> jax.Array:
    """Fused packed pipeline: syndrome -> LUT index -> correction gather ->
    residual (error XOR correction), one kernel pass over the batch.

    errors_packed: [B, W] uint32; check_packed: [R, W]; lut_packed: [2^R, W]
    (pack of `gf2.correction_lut`). Returns [B, W] uint32 residuals.
    """
    B, W = errors_packed.shape
    R = check_packed.shape[0]
    if B % tile_b:
        raise ValueError(f"batch {B} not a multiple of tile_b {tile_b}")
    weights = jnp.asarray(
        [1 << (R - 1 - r) for r in range(R)], dtype=jnp.int32
    )

    return pl.pallas_call(
        _lut_decode_kernel,
        grid=(B // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(lut_packed.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, W), jnp.uint32),
        interpret=_interpret(),
    )(errors_packed, check_packed, lut_packed, weights)
