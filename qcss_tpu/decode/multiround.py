"""Repeated syndrome extraction with majority vote (Shor-style).

A single noisy syndrome measurement cannot be trusted: a flipped syndrome
bit triggers a wrong correction. The classic remedy — measure the syndrome
2t+1 times and majority-vote each bit before decoding — is the same
repetition idea the reference applies to logical measurement
(reference: css_code.py:570-582) lifted to syndrome extraction, here as a
batched phenomenological pipeline: data errors are sampled once, each
round re-extracts the syndrome through an independent measurement-noise
channel, votes run per bit, and the voted syndrome feeds the LUT decoder.

This is the level-0 fault-tolerant decoding experiment (static data error,
phenomenological measurement noise); circuit-level spacetime decoding is a
round-2+ item.
"""

from functools import partial

import jax
import jax.numpy as jnp

from qcss_tpu.decode.lut import decode_corrections
from qcss_tpu.decode.montecarlo import sample_depolarizing
from qcss_tpu.ops import gf2_jax
from qcss_tpu.sim.noise import flip_bits


def noisy_syndromes(errors, parity_check, q_meas, key, rounds: int):
    """Extract the syndrome `rounds` times, each through an independent
    bit-flip channel of rate q_meas. errors [B, n] -> [rounds, B, r]."""
    true_syn = gf2_jax.syndromes_dense(errors, parity_check)
    keys = jax.random.split(key, rounds)

    def one(k):
        return flip_bits(true_syn, q_meas, k)

    return jax.vmap(one)(keys)


def vote_syndromes(syndromes: jax.Array) -> jax.Array:
    """Per-bit majority over the leading rounds axis (odd round count)."""
    rounds = syndromes.shape[0]
    if rounds % 2 == 0:
        raise ValueError("round count must be odd")
    votes = jnp.sum(syndromes.astype(jnp.int32), axis=0)
    return (votes >= (rounds + 1) // 2).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("batch", "rounds"))
def _multiround_step(key, p, q, batch, rounds, h1, h2, lut1, lut2, lx, lz,
                     flip2, flip1):
    k_err, k_mx, k_mz = jax.random.split(key, 3)
    n = h1.shape[1]
    x_err, z_err = sample_depolarizing(k_err, batch, n, p)

    def sector(err, check, flip_tab, logical, k):
        syns = noisy_syndromes(err, check, q, k, rounds)
        voted = vote_syndromes(syns)
        idx = gf2_jax.bits_to_index(voted)
        corr_flip = jnp.take(flip_tab, idx, axis=0)
        err_flip = gf2_jax.mod2_matmul(err, logical.T)
        # A voted syndrome that differs from the true one applies a wrong
        # correction; the logical-flip comparison below accounts for it
        # exactly because corr_flip is looked up from the voted syndrome.
        return (err_flip ^ corr_flip).any(axis=-1).astype(jnp.uint8)

    x_fail = sector(x_err, h2, flip2, lz, k_mx)
    z_fail = sector(z_err, h1, flip1, lx, k_mz)
    return {
        "x_fail": jnp.sum(x_fail, dtype=jnp.int32),
        "z_fail": jnp.sum(z_fail, dtype=jnp.int32),
        "word_fail": jnp.sum(x_fail | z_fail, dtype=jnp.int32),
    }


def multiround_error_rate(code, p, q_meas, *, rounds: int | None = None,
                          samples: int = 1 << 18, batch: int = 1 << 18,
                          seed: int = 0) -> dict[str, float]:
    """Logical error rate with noisy syndrome measurement, decoded from the
    per-bit majority over `rounds` repeated extractions (default 2t+1)."""
    dev = code.device
    if dev.lut_c1 is None or dev.lut_c2 is None:
        raise ValueError("code has no syndrome tables; pass max_table_weight")
    rounds = 2 * code.t + 1 if rounds is None else rounds
    n_rounds = -(-samples // batch)
    total = {"x_fail": 0, "z_fail": 0, "word_fail": 0}
    keys = jax.random.split(jax.random.key(seed), n_rounds)
    for i in range(n_rounds):
        counts = _multiround_step(
            keys[i], jnp.float32(p), jnp.float32(q_meas), batch, rounds,
            dev.h1, dev.h2, dev.lut_c1, dev.lut_c2,
            dev.logical_x, dev.logical_z,
            dev.flip_z_of_lut_c2, dev.flip_x_of_lut_c1,
        )
        for k in total:
            total[k] += int(counts[k])
    n_samples = n_rounds * batch
    out = {k: v / n_samples for k, v in total.items()}
    out["samples"] = n_samples
    return out
