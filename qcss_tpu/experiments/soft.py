"""Soft-readout (analog measurement) decoding.

Real hardware does not measure bits: a syndrome readout returns an
ANALOG value (integrated homodyne voltage, photon count), and the
"measurement outcome" is a threshold decision on it. Hard-decision
decoding throws the confidence away; soft decoding hands the decoder a
per-measurement flip likelihood, so a marginal readout (analog value
near the decision boundary) is cheap to blame and a clean one expensive.

Model: a readout whose true outcome is m returns a = (-1)^m + sigma*N(0,1)
(symmetric Gaussian blobs at +-1); the hard decision is the sign. The
hard assignment error rate is q_eff = Phi(-1/sigma), and the posterior
flip probability given the observed amplitude |a| is

    P(flip | a) = 1 / (1 + exp(2|a|/sigma^2))

(the likelihood ratio of the two blobs at distance |a| from the
boundary). Both decoders in this module consume exactly that posterior:

* matching tier (`soft_phenomenological_error_rate`): the spacetime
  matching graph's TIME edges are the measurement flips — per-shot
  -log-likelihood growth weights ride the union-find kernel's
  ``shot_weights`` override (`UFDecoder.decode_batch`), same mechanism
  as heralded erasure (`experiments/erasure.py`);
* BP tier (`soft_bp_phenomenological_error_rate`): the spacetime Tanner
  graph's measurement VARIABLES (`bp.spacetime_tanner` layout) get
  per-shot priors (`BPDecoder.decode_batch(priors=...)`) — the qLDPC
  form, where matching does not apply.

Every experiment decodes the SAME sampled shots twice — soft and
hard-decision (static weights/priors at q_eff) — so the value of the
analog side information is priced on identical physics.

No reference analogue: the reference's LUT decoding consumes classical
bits only (reference: css_code.py:649-685, quil_classical.py) — there
is no notion of per-shot decoder side information anywhere in it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import norm  # scipy ships with jax's test deps

from qcss_tpu.decode.uf import (
    UFDecoder,
    _pack_parity,
    graph_from_checks,
    spacetime_graph,
)
from qcss_tpu.ops import gf2_jax


def flip_prob(sigma: float) -> float:
    """Hard-decision assignment error rate of the +-1 Gaussian readout:
    q_eff = Phi(-1/sigma)."""
    if sigma <= 0:
        return 0.0
    return float(norm.cdf(-1.0 / sigma))


def sigma_for_flip_prob(q: float) -> float:
    """Inverse of `flip_prob` — the readout width whose hard-decision
    error rate is q (for calibrated soft-vs-hard comparisons)."""
    if not 0.0 < q < 0.5:
        raise ValueError("q must lie in (0, 0.5)")
    return float(-1.0 / norm.ppf(q))


def posterior_flip_prob(amp, sigma: float):
    """P(hard decision wrong | observed amplitude |a| = amp)."""
    amp = np.asarray(amp, np.float64)
    return 1.0 / (1.0 + np.exp(2.0 * amp / (sigma * sigma)))


@partial(jax.jit, static_argnames=("batch", "rounds", "n"))
def _sample_soft_stream(key, p, sigma, batch, rounds, n, h, lz):
    """Phenomenological stream with ANALOG measurement readout: IID data
    flips at rate p before each of `rounds` noisy extraction rounds, one
    final data layer, perfect final readout. Each noisy measurement
    draws u ~ N(1, sigma) — the analog value relative to the true blob —
    so the hard decision flips iff u < 0 and |u| is the observed
    amplitude. Returns (detectors [B, (rounds+1)*r], parities [B, k],
    amplitudes [B, rounds, r])."""
    r = h.shape[0]
    km, ka = jax.random.split(key)
    errs = (
        jax.random.uniform(km, (rounds + 1, batch, n)) < p
    ).astype(jnp.uint8)
    u = 1.0 + sigma * jax.random.normal(ka, (rounds, batch, r),
                                        dtype=jnp.float32)
    flips = (u < 0.0).astype(jnp.uint8)
    cum = jnp.cumsum(errs.astype(jnp.int32), axis=0).astype(jnp.uint8) & 1
    syns = [gf2_jax.syndromes_dense(cum[t], h) ^ flips[t]
            for t in range(rounds)]
    final = gf2_jax.syndromes_dense(cum[rounds], h)
    dets = [syns[0]]
    for t in range(1, rounds):
        dets.append(syns[t] ^ syns[t - 1])
    dets.append(final ^ syns[rounds - 1])
    par = gf2_jax.mod2_matmul(cum[rounds], lz.T)
    return (jnp.concatenate(dets, axis=-1), par,
            jnp.moveaxis(jnp.abs(u), 0, 1))


def _llr_weights(p_edge: np.ndarray, base: float,
                 cap: int = 250) -> np.ndarray:
    """-log-likelihood growth weights on `weights_from_probs`'s scale:
    w = clip(round(2 ln p / ln p_max), 1, cap). Per-shot soft weights and
    the static graph share one `base = ln p_max` so they are comparable
    unit-for-unit."""
    w = np.rint(2.0 * np.log(np.clip(p_edge, 1e-30, 1 - 1e-9)) / base)
    return np.clip(w, 1, cap).astype(np.uint8)


def soft_phenomenological_error_rate(
    code,
    p: float,
    sigma: float,
    *,
    rounds: int | None = None,
    samples: int = 1 << 13,
    batch: int | None = None,
    seed: int = 0,
    soft: bool = True,
    use_native: bool | None = None,
) -> dict[str, float]:
    """Multi-round phenomenological X-memory with analog syndrome
    readout, decoded with spacetime union-find. ``soft=True`` gives the
    decoder per-measurement flip likelihoods (time-edge ``shot_weights``
    from the observed amplitudes); ``soft=False`` decodes the same shots
    hard-decision (static weights at q_eff = `flip_prob(sigma)`)."""
    h = code.raw_parity_check_c2
    lz = code.z_operator_matrix()
    if rounds is None:
        rounds = 2 * code.t + 1
    batch = samples if batch is None else batch
    q_eff = max(flip_prob(sigma), 1e-9)
    p_eff = max(p, 1e-9)
    base_g = graph_from_checks(h, lz)
    graph = spacetime_graph(h, lz, rounds, p_space=p_eff, p_time=q_eff)
    dec = UFDecoder(graph, use_native=use_native)
    r = h.shape[0]
    n_space = base_g.num_edges * (rounds + 1)
    # time edge for (round t, check c) sits at n_space + t*r + c
    # (spacetime_graph layout: space edges first, then t-major time edges)
    base_ln = np.log(max(p_eff, q_eff))
    static_w = np.asarray(graph.edge_weight)
    h_j, lz_j = jnp.asarray(h, jnp.uint8), jnp.asarray(lz, jnp.uint8)

    n_chunks = -(-samples // batch)
    keys = jax.random.split(jax.random.key(seed), n_chunks)
    fails = 0
    for i in range(n_chunks):
        dets, par, amp = map(np.asarray, _sample_soft_stream(
            keys[i], jnp.float32(p), jnp.float32(sigma),
            batch, rounds, code.n, h_j, lz_j))
        sw = None
        if soft:
            p_flip = posterior_flip_prob(amp.reshape(batch, -1), sigma)
            sw = np.tile(static_w, (batch, 1))
            sw[:, n_space:] = _llr_weights(p_flip, base_ln)
        _, obs = dec.decode_batch(dets, want_corrections=False,
                                  shot_weights=sw)
        fails += int(np.sum(obs != _pack_parity(par)))
    n_samples = n_chunks * batch
    return {
        "logical_fail": fails / n_samples,
        "samples": n_samples,
        "rounds": rounds,
        "p": p,
        "sigma": sigma,
        "q_eff": q_eff,
        "soft": soft,
    }


def soft_bp_phenomenological_error_rate(
    code,
    p: float,
    sigma: float,
    *,
    rounds: int,
    samples: int = 1 << 12,
    batch: int | None = None,
    seed: int = 0,
    soft: bool = True,
    iters: int = 64,
    alpha: float = 0.8,
    osd: bool = True,
) -> dict[str, float]:
    """qLDPC form: phenomenological memory with analog readout, decoded
    by spacetime BP(+OSD) whose measurement-variable priors are set per
    shot from the observed amplitudes (``soft=True``) or statically at
    q_eff (``soft=False``). Same-shots comparison, like the UF tier."""
    from qcss_tpu.decode.bp import BPDecoder, spacetime_tanner

    h = getattr(code, "redundant_parity_check_c2", None)
    if h is None:
        h = code.raw_parity_check_c2
    h = np.asarray(h, np.uint8) & 1
    lz = code.z_operator_matrix()
    batch = samples if batch is None else batch
    q_eff = max(flip_prob(sigma), 1e-9)
    tan, priors, obs, n_data = spacetime_tanner(
        h, rounds, max(p, 1e-9), q_eff, logicals=lz)
    dec = BPDecoder(tan, priors, logicals=obs, iters=iters, alpha=alpha,
                    osd=osd)
    r = h.shape[0]
    h_j, lz_j = jnp.asarray(h, jnp.uint8), jnp.asarray(lz, jnp.uint8)

    n_chunks = -(-samples // batch)
    keys = jax.random.split(jax.random.key(seed), n_chunks)
    fails = 0
    n_conv = 0
    for i in range(n_chunks):
        dets, par, amp = map(np.asarray, _sample_soft_stream(
            keys[i], jnp.float32(p), jnp.float32(sigma),
            batch, rounds, code.n, h_j, lz_j))
        pri = None
        if soft:
            # measurement variable (t, c) sits at n_data + t*r + c —
            # exactly the amp layout flattened
            p_flip = np.clip(posterior_flip_prob(
                amp.reshape(batch, -1), sigma), 1e-9, 0.499)
            pri = np.tile(priors, (batch, 1))
            pri[:, n_data:] = p_flip
        flips, conv = dec.decode_obs(dets, priors=pri)
        fails += int(np.sum((flips ^ par).any(axis=1)))
        n_conv += int(conv.sum())
    n_samples = n_chunks * batch
    return {
        "logical_fail": fails / n_samples,
        "bp_converged": n_conv / n_samples,
        "samples": n_samples,
        "rounds": rounds,
        "p": p,
        "sigma": sigma,
        "q_eff": q_eff,
        "soft": soft,
    }
