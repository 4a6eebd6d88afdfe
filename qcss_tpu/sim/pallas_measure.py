"""Fused multi-qubit CHP measurement as a Pallas TPU kernel.

The packed engine's measurement path (`tableau_packed.measure_many`) scans
`measure_z` once per measured qubit; every step streams the whole
[B, 2n, W] tableau through HBM, so measuring an n-qubit block costs n full
tableau round-trips — the FT hot loop's bandwidth bill. This kernel keeps
a batch tile of the tableau RESIDENT IN VMEM and loops over all measured
qubits on-chip: one HBM round-trip per block measurement instead of n.

Layout: inside the kernel the tableau is lane-oriented — x, z as
[S, W, 2n] (rows along lanes, packed words along sublanes) — so all row
algebra (pivot selection, row-sums, phase popcounts) vectorizes across the
2n rows at full lane width; W is tiny (n/32) and reduces in sublanes. The
deterministic-outcome branch's ordered-pair parity uses a Hillis-Steele
XOR prefix along lanes (log2(2n) roll-XOR passes) — the in-kernel form of
the associative scan in `tableau_packed.measure_z`.

Bit-exactness: given the same per-qubit random bits, results are identical
to the sequential `measure_many` scan (differentially tested in
tests/test_pallas_measure.py). The random bits are drawn OUTSIDE the
kernel with the same key-splitting discipline as the scan path.

Measured result (v5e, n=121, 32 measured qubits): the kernel is correct
but NOT faster — 2.47M meas·samples/s at batch 4096 vs 3.22M for the XLA
scan (and parity at batch 256, where both are op-latency-bound). XLA's
automatic elementwise fusion over the [B, 2n, W] layout beats this
hand-scheduled form; the per-qubit one-hot reductions and the in-kernel
prefix-XOR cost more VPU passes than XLA's gathers. Kept opt-in
(QCSS_FUSED_MEASURE=1 in `ftqc.engines`) as infrastructure and as the
measured record of the experiment; the default stays on the scan path.

The reference has no simulator at all (it ships states to an external QVM,
reference: test/test_ftqc.py:153-156); this kernel is pure framework
machinery for the FT executor's throughput.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WORD = 32


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _popcount32(v):
    v = v - ((v >> 1) & jnp.uint32(0x55555555))
    v = (v & jnp.uint32(0x33333333)) + ((v >> 2) & jnp.uint32(0x33333333))
    v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((v * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def _select_sum_u32(vals, mask, axis):
    """Sum of a one-hot-masked uint32 array along `axis`, via an int32 view
    (Mosaic has no unsigned reductions). Bit-exact: at most one summand per
    output position is nonzero, so int32 addition never carries."""
    masked = jnp.where(mask, vals, jnp.uint32(0))
    return pltpu.bitcast(
        jnp.sum(pltpu.bitcast(masked, jnp.int32), axis=axis), jnp.uint32
    )


def _prefix_xor_lanes(v, length: int):
    """Inclusive XOR prefix along the last (lane) axis, Hillis-Steele:
    log2(length) roll-and-mask passes."""
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    shift = 1
    while shift < length:
        rolled = pltpu.roll(v, shift, axis=v.ndim - 1)
        v = v ^ jnp.where(lane >= shift, rolled, jnp.zeros_like(v))
        shift *= 2
    return v


def _measure_kernel(qubits_ref, x_ref, z_ref, r_ref, rand_ref,
                    x_out, z_out, r_out, out_ref, *, n: int, n_meas: int):
    """One batch tile: measure `n_meas` qubits sequentially with the
    tableau resident in VMEM. x/z: [S, W, 2n] uint32 (lane-oriented),
    r: [S, 2n] uint8 (sign bits), rand: [S, n_meas] uint8."""
    x_out[:] = x_ref[:]
    z_out[:] = z_ref[:]
    r_out[:] = r_ref[:]
    out_ref[:] = jnp.zeros_like(out_ref)
    S, W, two_n = x_ref.shape
    # All iotas/masks are built at their final rank: Mosaic only supports
    # minor-dim-inserting reshapes for 32-bit types, so sub-32-bit (bool)
    # values must never be [..., None]-expanded on the minor axis. The 1-D
    # per-sample quantities are kept as [S, 1] (32-bit) throughout.
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, two_n), 1)
    word_ids3 = jax.lax.broadcasted_iota(jnp.int32, (S, W, two_n), 1)
    meas_ids = jax.lax.broadcasted_iota(jnp.int32, (S, n_meas), 1)

    def body(m, _):
        q = qubits_ref[m]
        w = q // WORD
        bit = (q % WORD).astype(jnp.uint32)
        x = x_out[:]
        z = z_out[:]
        r = r_out[:].astype(jnp.int32)  # [S, 2n]

        # one-hot word select (Mosaic has no dynamic_slice; W is tiny)
        w_sel3 = word_ids3 == w  # [S, W, 2n]
        xw = _select_sum_u32(x, w_sel3, axis=1)  # [S, 2n]
        xq = ((xw >> bit) & 1).astype(jnp.int32)  # [S, 2n]

        # ---- pivot: first anticommuting stabilizer row -------------------
        stab_anti = (xq == 1) & (lane >= n)
        cand = jnp.where(stab_anti, lane, two_n + 1)
        p = jnp.min(cand, axis=-1, keepdims=True)  # [S, 1]
        is_rand2 = p < two_n  # [S, 1] bool
        onehot_p = lane == p  # [S, 2n]

        # pivot row gather (one-hot lane reduction; exactly one lane set)
        sel3 = onehot_p[:, None, :]  # minor dim preserved
        px = _select_sum_u32(x, sel3, axis=2)  # [S, W]
        pz = _select_sum_u32(z, sel3, axis=2)
        pr = jnp.sum(jnp.where(onehot_p, r, 0), axis=-1, keepdims=True)  # [S,1]

        # ---- random branch: rowsum pivot into every anticommuting row ----
        pxb, pzb = px[:, :, None], pz[:, :, None]  # uint32: reshape OK
        nx, nz = ~x, ~z
        npx, npz = ~pxb, ~pzb
        plus = (pxb & pzb & z & nx) | (pxb & npz & x & z) | (npx & pzb & x & nz)
        minus = (pxb & pzb & x & nz) | (pxb & npz & nx & z) | (npx & pzb & x & z)
        g = jnp.sum(_popcount32(plus) - _popcount32(minus), axis=1)  # [S, 2n]
        targets = (xq == 1) & jnp.logical_not(onehot_p)
        r4 = (2 * r + 2 * pr + g) % 4
        rr = jnp.where(targets, r4 // 2, r)
        t3 = targets[:, None, :]
        rx = jnp.where(t3, x ^ pxb, x)
        rz = jnp.where(t3, z ^ pzb, z)

        # destabilizer row (p - n) := old pivot row
        dest2 = lane == (p - n)
        dest = dest2[:, None, :]
        rx = jnp.where(dest, pxb, rx)
        rz = jnp.where(dest, pzb, rz)
        rr = jnp.where(dest2, pr, rr)

        # pivot row := Z_q with the random outcome as its sign
        # (one-hot column select; dynamic lane indexing doesn't lower)
        rand_bit2 = jnp.sum(
            jnp.where(meas_ids == m, rand_ref[:].astype(jnp.int32), 0),
            axis=1, keepdims=True,
        )  # [S, 1]
        zq_word = jnp.where(
            w_sel3, jnp.uint32(1) << bit, jnp.uint32(0)
        )  # [S, W, 2n]
        rx = jnp.where(sel3, jnp.uint32(0), rx)
        rz = jnp.where(sel3, zq_word, rz)
        rr = jnp.where(onehot_p, rand_bit2, rr)

        # ---- deterministic branch: closed-form commuting product ---------
        # Select stabilizer rows i+n where destabilizer i anticommutes.
        sel_d = ((xq == 1) & (lane < n)).astype(jnp.uint32)  # [S, 2n]
        m_stab2 = pltpu.roll(sel_d, n, axis=1)  # lanes n..2n-1
        m_stab = m_stab2[:, None, :]
        sx = x & (jnp.uint32(0) - m_stab)  # mask: 0 or 0xffffffff
        sz = z & (jnp.uint32(0) - m_stab)
        prefix_excl = _prefix_xor_lanes(sz, two_n) ^ sz
        pair2 = (
            jnp.sum(jnp.sum(_popcount32(sx & prefix_excl), axis=1),
                    axis=-1, keepdims=True) & 1
        )  # [S, 1]
        y = jnp.sum(_popcount32(x & z), axis=1)  # [S, 2n]
        base2 = jnp.sum(m_stab2.astype(jnp.int32) * (2 * r + y),
                        axis=-1, keepdims=True)  # [S, 1]
        det2 = ((base2 + 2 * pair2) % 4) // 2

        # ---- commit -------------------------------------------------------
        sr3 = is_rand2[:, :, None]  # [S,1,1]: minor-1 reshape is a no-op
        x_out[:] = jnp.where(sr3, rx, x)
        z_out[:] = jnp.where(sr3, rz, z)
        r_out[:] = jnp.where(is_rand2, rr, r).astype(jnp.uint8)
        # one-hot column store (dynamic lane-index writes don't vectorize)
        outcome2 = jnp.where(is_rand2, rand_bit2, det2)  # [S, 1] int32
        out_ref[:] = out_ref[:] | jnp.where(
            meas_ids == m, outcome2, 0
        ).astype(jnp.uint8)
        return 0

    jax.lax.fori_loop(0, n_meas, body, 0)


@functools.partial(jax.jit, static_argnames=("n", "tile_b"))
def _measure_many_fused_t(x_t, z_t, r, qubits, rand_bits, n: int, tile_b: int):
    """Lane-oriented entry: x_t/z_t [B, W, 2n], r [B, 2n], qubits [M],
    rand_bits [B, M]. Returns (x_t, z_t, r, outcomes [B, M])."""
    B, W, two_n = x_t.shape
    n_meas = qubits.shape[0]
    grid = (B // tile_b,)
    kernel = functools.partial(_measure_kernel, n=n, n_meas=n_meas)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # qubits [M]
            pl.BlockSpec((tile_b, W, two_n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, W, two_n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, two_n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, n_meas), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, W, two_n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, W, two_n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, two_n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, n_meas), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, W, two_n), jnp.uint32),
            jax.ShapeDtypeStruct((B, W, two_n), jnp.uint32),
            jax.ShapeDtypeStruct((B, two_n), jnp.uint8),
            jax.ShapeDtypeStruct((B, n_meas), jnp.uint8),
        ],
        interpret=_interpret(),
    )(qubits, x_t, z_t, r, rand_bits)


def measure_many_fused(t, qubits, key: jax.Array, tile_b: int | None = None):
    """Drop-in replacement for `tableau_packed.measure_many`: measure the
    given qubits in order with ONE fused kernel. Bit-identical outcomes to
    the sequential scan (same key-splitting: qubit m's random bit comes
    from split(key)[m])."""
    from qcss_tpu.sim.tableau_packed import PackedTableau

    q = jnp.asarray(qubits, dtype=jnp.int32)
    n_meas = q.shape[0]
    B = t.batch
    keys = jax.random.split(key, n_meas)
    rand_bits = jax.vmap(
        lambda k: jax.random.bernoulli(k, 0.5, (B,)).astype(jnp.uint8)
    )(keys).T  # [B, M]

    if tile_b is None:
        # ~40-120KB of VMEM per sample at surface-code scale (tableau in+out
        # plus branch temporaries); 64 samples stays well under the 16MB
        # scoped-vmem limit while filling the VPU.
        tile_b = B
        for cand in (64, 32, 16, 8):
            if B % cand == 0 and B >= cand:
                tile_b = cand
                break

    x_t = jnp.swapaxes(t.x, 1, 2)  # [B, W, 2n]
    z_t = jnp.swapaxes(t.z, 1, 2)
    x_t, z_t, r, outs = _measure_many_fused_t(
        x_t, z_t, t.r, q, rand_bits, t.n, tile_b
    )
    return (
        PackedTableau(jnp.swapaxes(x_t, 1, 2), jnp.swapaxes(z_t, 1, 2), r, t.n),
        outs,
    )
