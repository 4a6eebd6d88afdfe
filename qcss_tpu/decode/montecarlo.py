"""Monte-Carlo logical-error-rate estimation.

Replaces the reference's fidelity harness — 100,000 QVM shots through a
decoherence noise model with results printed and asserted on nothing
(reference: test/test_fidelity.py:38-46) — with an explicit, seeded,
batched depolarizing-channel sampler and a fully fused
sample → syndrome-extract → LUT-decode → residual-logical-check pipeline
that runs at millions of samples per second per chip.

Convention (matching the reference's Steane-EC data flow,
reference: css_code.py:457-470): X errors are detected by the Z-type checks
(``parity_check_c2``) and corrected against the C2 table; Z errors by the
X-type checks (``parity_check_c1``). A residual X-type operator flips the
logical qubit iff it anticommutes with logical Z̄; a residual Z-type
operator iff it anticommutes with X̄ — degeneracy-aware by construction.
"""

from functools import partial

import jax
import jax.numpy as jnp

from qcss_tpu.decode.lut import decode_corrections
from qcss_tpu.ops import gf2_jax


def sample_depolarizing(key: jax.Array, batch: int, n: int, p) -> tuple[jax.Array, jax.Array]:
    """IID single-qubit depolarizing noise: each qubit suffers X, Y or Z
    with probability p/3 each. Returns (x_err, z_err), each [batch, n] uint8.

    Implemented as integer threshold tests on raw 32-bit random words (no
    int->float conversion on the hot path): with u ~ U[0, 2^32),
    X-or-Y <=> u < 2p/3 * 2^32 and Y-or-Z <=> p/3 * 2^32 <= u < p * 2^32.
    The thresholds are float32 products, so the realized probabilities are
    accurate to ~2^-24 relative (and p=1.0 fires with probability
    1 - 2^-32 due to the threshold cap).
    """
    u = jax.random.bits(key, (batch, n), dtype=jnp.uint32)
    p = jnp.asarray(p, jnp.float32)
    cap = jnp.float32(2.0**32 - 1)

    def thresh(frac):
        return jnp.minimum(frac * jnp.float32(2.0**32), cap).astype(jnp.uint32)

    t1, t2, t3 = thresh(p / 3.0), thresh(2.0 * p / 3.0), thresh(p)
    x_err = (u < t2).astype(jnp.uint8)  # X or Y component
    z_err = ((u >= t1) & (u < t3)).astype(jnp.uint8)  # Y or Z component
    return x_err, z_err


def decode_failures(
    x_err: jax.Array,
    z_err: jax.Array,
    h1: jax.Array,
    h2: jax.Array,
    lut1: jax.Array,
    lut2: jax.Array,
    logical_x: jax.Array,
    logical_z: jax.Array,
    flip_z_of_lut2: jax.Array | None = None,
    flip_x_of_lut1: jax.Array | None = None,
) -> dict[str, jax.Array]:
    """Decode a batch of Pauli errors and report per-sample logical flips.

    All inputs are 0/1 arrays; x_err/z_err are [B, n]. Returns uint8 [B]
    flags ``x_fail`` (logical bit flip), ``z_fail`` (logical phase flip) and
    ``word_fail`` (either).

    When the per-syndrome flip tables (``flip_z_of_lut2[s] = L_Z · lut2[s]``,
    [2^r, k]) are provided, the residual logical check
    ``parity(L · (e ^ lut[s]))`` is computed as ``parity(L · e) ^ flip[s]``
    — mathematically identical, but a [B, k]-bit gather instead of a [B, n]
    correction gather plus a second matmul.
    """
    syn_x = gf2_jax.syndromes_dense(x_err, h2)
    err_flip_x = gf2_jax.mod2_matmul(x_err, logical_z.T)  # [B, k]
    if flip_z_of_lut2 is not None:
        corr_flip_x = jnp.take(flip_z_of_lut2, gf2_jax.bits_to_index(syn_x), axis=0)
    else:
        corr_x = decode_corrections(syn_x, lut2)
        corr_flip_x = gf2_jax.mod2_matmul(corr_x, logical_z.T)
    x_fail = (err_flip_x ^ corr_flip_x).any(axis=-1).astype(jnp.uint8)

    syn_z = gf2_jax.syndromes_dense(z_err, h1)
    err_flip_z = gf2_jax.mod2_matmul(z_err, logical_x.T)
    if flip_x_of_lut1 is not None:
        corr_flip_z = jnp.take(flip_x_of_lut1, gf2_jax.bits_to_index(syn_z), axis=0)
    else:
        corr_z = decode_corrections(syn_z, lut1)
        corr_flip_z = gf2_jax.mod2_matmul(corr_z, logical_x.T)
    z_fail = (err_flip_z ^ corr_flip_z).any(axis=-1).astype(jnp.uint8)

    return {
        "x_fail": x_fail,
        "z_fail": z_fail,
        "word_fail": x_fail | z_fail,
    }


@partial(jax.jit, static_argnames=("batch",))
def _mc_step(key, p, batch, h1, h2, lut1, lut2, lx, lz, flip2, flip1):
    x_err, z_err = sample_depolarizing(key, batch, h1.shape[1], p)
    fails = decode_failures(x_err, z_err, h1, h2, lut1, lut2, lx, lz, flip2, flip1)
    return {k: jnp.sum(v, dtype=jnp.int32) for k, v in fails.items()}


def mc_decode_step(code, key: jax.Array, batch: int, p) -> dict[str, jax.Array]:
    """One fused Monte-Carlo round: sample `batch` depolarizing errors at
    physical rate p, decode both Pauli sectors, count logical failures."""
    dev = code.device
    if dev.lut_c1 is None or dev.lut_c2 is None:
        raise ValueError("code has no syndrome tables; pass max_table_weight")
    return _mc_step(
        key, jnp.float32(p), batch,
        dev.h1, dev.h2, dev.lut_c1, dev.lut_c2, dev.logical_x, dev.logical_z,
        dev.flip_z_of_lut_c2, dev.flip_x_of_lut_c1,
    )


@partial(jax.jit, static_argnames=("batch", "rounds"))
def _mc_scan(key, p, batch, rounds, h1, h2, lut1, lut2, lx, lz, flip2, flip1):
    keys = jax.random.split(key, rounds)

    def body(carry, k):
        x_err, z_err = sample_depolarizing(k, batch, h1.shape[1], p)
        fails = decode_failures(
            x_err, z_err, h1, h2, lut1, lut2, lx, lz, flip2, flip1
        )
        counts = {kk: jnp.sum(v, dtype=jnp.int32) for kk, v in fails.items()}
        return jax.tree.map(jnp.add, carry, counts), None

    init = {k: jnp.int32(0) for k in ("x_fail", "z_fail", "word_fail")}
    total, _ = jax.lax.scan(body, init, keys)
    return total


def mc_decode_rounds(code, key: jax.Array, batch: int, rounds: int, p) -> dict:
    """`rounds` fused Monte-Carlo rounds in ONE device program (lax.scan) —
    no host round-trips between rounds; the form used by the throughput
    benchmark."""
    dev = code.device
    if dev.lut_c1 is None or dev.lut_c2 is None:
        raise ValueError("code has no syndrome tables; pass max_table_weight")
    return _mc_scan(
        key, jnp.float32(p), batch, rounds,
        dev.h1, dev.h2, dev.lut_c1, dev.lut_c2, dev.logical_x, dev.logical_z,
        dev.flip_z_of_lut_c2, dev.flip_x_of_lut_c1,
    )


def logical_error_rate(
    code,
    p,
    *,
    samples: int = 1 << 20,
    batch: int = 1 << 18,
    seed: int = 0,
) -> dict[str, float]:
    """Estimate logical error rates at physical error rate p.

    Runs ceil(samples/batch) fused MC rounds and returns rates plus the
    total sample count actually used.
    """
    rounds = -(-samples // batch)
    total = {"x_fail": 0, "z_fail": 0, "word_fail": 0}
    keys = jax.random.split(jax.random.key(seed), rounds)
    for i in range(rounds):
        counts = mc_decode_step(code, keys[i], batch, p)
        for k in total:
            total[k] += int(counts[k])
    n_samples = rounds * batch
    out = {k: v / n_samples for k, v in total.items()}
    out["samples"] = n_samples
    return out
