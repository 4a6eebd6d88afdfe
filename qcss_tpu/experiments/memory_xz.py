"""Two-sector memory experiment with correlated X<->Z decoding.

Each round extracts BOTH check sectors (Z checks via CNOT fan-in, then X
checks via H-sandwich ancillas) under circuit-level noise; X data errors
are decoded from the Z-check detector stream and Z data errors from the
X-check stream, each on its exact circuit-level DEM (`decode.dem2`).

The point is the CORRELATION: a 2q depolarizing fault with a Y-type data
component fires one edge in each graph. Independent decoding ignores
this; the correlated second pass re-weights each Z-error-graph edge whose
partner was chosen by the X-error pass to the conditional likelihood
(P(Z | X) = 1/2 per location), the circuit-level form of
`decode.correlated` (round-2 code-capacity version).

Word failure needs both observables, so the harness reads BOTH residual
frame sectors at the end — a simulation-level readout (physical hardware
measures one basis; the decoders are only ever shown the detector
streams, so the comparison between them is fair).

(The reference decodes each sector with an independent per-extraction LUT
and models no correlations — reference: css_code.py:436-470.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from qcss_tpu.decode.dem2 import build_two_sector_dem
from qcss_tpu.decode.spacetime import detector_history
from qcss_tpu.decode.uf import UFDecoder
from qcss_tpu.experiments.memory import x_extraction_circuit, z_extraction_circuit
from qcss_tpu.ops import gf2_jax
from qcss_tpu.sim import frame as fr
from qcss_tpu.sim import noise as noise_mod


def _sample_two_sector(key, batch, rounds, code, noise, z_arrays, x_arrays,
                       z_comp, x_comp, rz, rx, sigma=None):
    """Frames sampler for the interleaved two-sector schedule. Returns
    (syns_z [R, B, rz], syns_x [R, B, rx], x_err [B, n], z_err [B, n]).
    The reference run is deterministic in both sectors (|0~> is a +1
    eigenstate of every stabilizer), so deviations are outcomes.

    ``sigma`` (static) switches measurement noise to the ANALOG readout
    model (`experiments.soft`): instead of Bernoulli(p_meas) flips, each
    measurement draws u ~ N(1, sigma) — hard flip iff u < 0 — and the
    amplitudes |u| are appended to the return tuple
    (amps_z [R, B, rz], amps_x [R, B, rx]). The sampled flip rate is
    then Phi(-1/sigma); callers must build decoding models with
    p_meas = soft.flip_prob(sigma). sigma=None keeps the original path
    (and key stream) bit-identical."""
    n = code.n
    nq = n + rz + rx
    zanc = jnp.arange(n, n + rz, dtype=jnp.int32)
    xanc = jnp.arange(n + rz, nq, dtype=jnp.int32)
    f = fr.zero_frames(batch, nq)

    def round_body(f, k):
        if noise.p_idle:
            # per-round idle channel on every data qubit, charged at the
            # round boundary — EXACTLY the species dem2._fault_species
            # adds at k=-1, so idle-aware decoding graphs match the
            # sampled physics. Static branch: p_idle == 0 consumes the
            # same key stream as before idle existed.
            k, ki = jax.random.split(k)
            u = jax.random.uniform(ki, (batch, n), jnp.float32)
            x_hi, z_lo, z_hi = (
                jnp.float32(v)
                for v in noise_mod._thresholds_1q(noise.rate_idle))
            dat = jnp.arange(n)
            f = fr.Frames(
                f.x.at[:, dat].set(f.x[:, dat]
                                   ^ (u < x_hi).astype(jnp.uint8)),
                f.z.at[:, dat].set(f.z[:, dat]
                                   ^ ((u >= z_lo)
                                      & (u < z_hi)).astype(jnp.uint8)),
            )
        kz, kzm, kzr, kx, kxm, kxr = jax.random.split(k, 6)
        if z_comp is not None:
            f = fr.run_compiled_noisy(f, z_comp, noise, kz)
        else:
            f = fr.run_arrays_noisy(f, *z_arrays, noise, kz)
        if sigma is None:
            f, syn_z = fr.measure_deviations(f, zanc, kzm, noise.p_meas)
            amp_z = None
        else:
            f, syn_z = fr.measure_deviations(f, zanc)
            u = 1.0 + jnp.float32(sigma) * jax.random.normal(
                kzm, (batch, rz), dtype=jnp.float32)
            syn_z = syn_z ^ (u < 0.0).astype(jnp.uint8)
            amp_z = jnp.abs(u)
        f = fr.reset_qubits(f, zanc, kzr, noise.p_reset)
        if x_comp is not None:
            f = fr.run_compiled_noisy(f, x_comp, noise, kx)
        else:
            f = fr.run_arrays_noisy(f, *x_arrays, noise, kx)
        if sigma is None:
            f, syn_x = fr.measure_deviations(f, xanc, kxm, noise.p_meas)
            amp_x = None
        else:
            f, syn_x = fr.measure_deviations(f, xanc)
            u = 1.0 + jnp.float32(sigma) * jax.random.normal(
                kxm, (batch, rx), dtype=jnp.float32)
            syn_x = syn_x ^ (u < 0.0).astype(jnp.uint8)
            amp_x = jnp.abs(u)
        f = fr.reset_qubits(f, xanc, kxr, noise.p_reset)
        if sigma is None:
            return f, (syn_z, syn_x)
        return f, (syn_z, syn_x, amp_z, amp_x)

    keys = jax.random.split(key, rounds)
    f, outs = jax.lax.scan(round_body, f, keys)
    data = jnp.arange(n, dtype=jnp.int32)
    if sigma is None:
        syns_z, syns_x = outs
        return syns_z, syns_x, f.x[:, data], f.z[:, data]
    syns_z, syns_x, amps_z, amps_x = outs
    return (syns_z, syns_x, f.x[:, data], f.z[:, data],
            jnp.moveaxis(amps_z, 0, 1), jnp.moveaxis(amps_x, 0, 1))


def xz_memory_experiment(code, *, rounds: int, noise: noise_mod.NoiseModel,
                         batch: int = 1 << 12, seed: int = 0,
                         n_threads: int | None = None,
                         belief: bool | int = False) -> dict[str, float]:
    """Run the two-sector memory and decode it three ways on the same
    shots: X errors (always the correlated-pass INPUT), Z errors
    independently, and Z errors with the correlated re-weighting.

    Returns x_fail, z_fail / z_fail_corr, word_fail / word_fail_corr.
    ``belief`` (True, or an int BP iteration count) additionally decodes
    BOTH sectors with belief-matching (`decode.belief`: joint-graph BP
    posteriors as per-shot matching weights) on the same shots and adds
    x/z/word_fail_belief."""
    hz = np.asarray(code.raw_parity_check_c2, np.uint8) & 1
    hx = np.asarray(code.raw_parity_check_c1, np.uint8) & 1
    rz, rx = hz.shape[0], hx.shape[0]
    lz = np.asarray(code.z_operator_matrix(), np.uint8) & 1
    lx = np.asarray(code.x_operator_matrix(), np.uint8) & 1
    n = code.n

    z_arrays = tuple(map(jnp.asarray, z_extraction_circuit(
        code, checks=hz).to_arrays()))
    # X ancillas live AFTER the Z ancillas in this layout
    x_arrays = tuple(map(jnp.asarray, x_extraction_circuit(
        code, anc_offset=n + rz, checks=hx).to_arrays()))
    nq = n + rz + rx
    z_comp = fr.maybe_compile(z_arrays, nq)
    x_comp = fr.maybe_compile(x_arrays, nq)

    fn = jax.jit(
        partial(_sample_two_sector, code=code, noise=noise,
                z_arrays=z_arrays, x_arrays=x_arrays,
                z_comp=z_comp, x_comp=x_comp, rz=rz, rx=rx),
        static_argnames=("batch", "rounds"),
    )
    syns_z, syns_x, x_err, z_err = fn(jax.random.key(seed), batch, rounds)
    syns_z, syns_x = np.asarray(syns_z), np.asarray(syns_x)
    x_err, z_err = np.asarray(x_err), np.asarray(z_err)

    final_z = (x_err.astype(np.int64) @ hz.T) & 1
    final_x = (z_err.astype(np.int64) @ hx.T) & 1
    dets_z = detector_history(syns_z, final_z.astype(np.uint8))
    dets_x = detector_history(syns_x, final_x.astype(np.uint8))

    dem = build_two_sector_dem(code, rounds, noise)
    dec_x_err = UFDecoder(dem.graph_x_errors)
    dec_z_err = UFDecoder(dem.graph_z_errors)

    sel, obs_z = dec_x_err.decode_batch(dets_z, n_threads=n_threads)
    _, obs_x = dec_z_err.decode_batch(dets_x, want_corrections=False,
                                      n_threads=n_threads)
    # correlated second pass: Z-error edges coupled to a CHOSEN X-error
    # edge become cheap
    base = dem.graph_z_errors.edge_weight
    wts = np.broadcast_to(base, (batch, base.shape[0])).copy()
    if dem.pairs.size:
        chosen = sel[:, dem.pairs[:, 0]].astype(bool)  # [B, P]
        cheap_t = np.zeros((base.shape[0], batch), bool)
        np.logical_or.at(cheap_t, dem.pairs[:, 1], chosen.T)
        wts = np.where(cheap_t.T, np.uint8(dem.cheap_weight), wts)
    _, obs_xc = dec_z_err.decode_batch(dets_x, want_corrections=False,
                                       n_threads=n_threads,
                                       shot_weights=wts)

    par_x = ((x_err.astype(np.int64) @ lz[0]) & 1).astype(np.uint32)
    par_z = ((z_err.astype(np.int64) @ lx[0]) & 1).astype(np.uint32)
    xf = (obs_z & 1) != par_x
    zf = (obs_x & 1) != par_z
    zfc = (obs_xc & 1) != par_z
    out = {
        "x_fail": float(np.mean(xf)),
        "z_fail": float(np.mean(zf)),
        "z_fail_corr": float(np.mean(zfc)),
        "word_fail": float(np.mean(xf | zf)),
        "word_fail_corr": float(np.mean(xf | zfc)),
        "samples": batch,
        "rounds": rounds,
        "pairs": int(dem.pairs.shape[0]),
    }
    if belief:
        from qcss_tpu.decode.belief import BeliefMatchingDecoder

        bm = BeliefMatchingDecoder(
            code, rounds, noise,
            iters=32 if belief is True else int(belief))
        obs_zb, obs_xb = bm.decode_obs(dets_z, dets_x, n_threads=n_threads)
        xfb = (obs_zb & 1) != par_x
        zfb = (obs_xb & 1) != par_z
        out["x_fail_belief"] = float(np.mean(xfb))
        out["z_fail_belief"] = float(np.mean(zfb))
        out["word_fail_belief"] = float(np.mean(xfb | zfb))
    return out
