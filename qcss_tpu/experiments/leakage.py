"""Leakage: persistent per-qubit loss of the computational subspace.

Real qubits leak (|2> states in transmons, loss in neutral atoms):
unlike a Pauli fault, leakage PERSISTS — a leaked qubit is effectively
depolarized every round until it decays or is reset, so one leakage
event produces a time-correlated error COLUMN, not a point fault. No
independent-edge detector error model can represent that correlation;
the decoding answer is per-shot side information (leakage detection
units, readout discrimination), which this framework already speaks:
herald masks become per-shot weight overrides on the union-find kernels
(host `UFDecoder.decode_batch(shot_weights=...)` or the device kernels'
new ``shot_weights`` input — `decode.device_uf`).

Model (round-level state machine, the phenomenological tier):

* each intact data qubit LEAKS with probability ``p_leak`` per round;
* each leaked qubit SEEPS back with probability ``p_seep`` per round
  (mean dwell 1/p_seep rounds), returning in a random computational
  state;
* while leaked, the qubit contributes a 1/2 X-component flip per round
  (maximally mixed over the sector under study — the standard
  depolarizing-leakage reduction) and its checks see exactly what the
  syndrome map propagates (no extra measurement randomization at this
  tier: ancillas are fresh each round);
* intact qubits suffer the usual IID data flips ``p``; measurements
  flip with ``q``.

Decoding: the spacetime matching graph with the leak record as heralds
— a qubit leaked in round t makes its slice-t space edge near-free
(`ERASED_WEIGHT`), the same mechanism as heralded erasure
(`experiments.erasure`) but over INTERVALS. ``heralded=False`` decodes
the same shots blind (static weights) — the ablation that prices the
leakage detection hardware.

The reference has no leakage concept anywhere (its error model is IID
Pauli per location — reference: errors.py, test/test_fidelity.py:76-82).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from qcss_tpu.decode.uf import (
    MatchingGraph,
    UFDecoder,
    _pack_parity,
    graph_from_checks,
    spacetime_graph,
)
from qcss_tpu.experiments.erasure import ERASED_WEIGHT, _pauli_weight
from qcss_tpu.ops import gf2_jax


@partial(jax.jit, static_argnames=("batch", "rounds", "n"))
def _sample_leakage_stream(key, p, q, p_leak, p_seep, batch, rounds, n,
                           h, lz):
    """Phenomenological stream with a persistent leakage state machine.
    Returns (detectors [B, (rounds+1)*r], parities [B, k],
    leaked [B, rounds+1, n] — the herald record; layer `rounds` is the
    leak state at final readout, whose 1/2 flip is charged in that
    layer)."""
    r = h.shape[0]

    def round_body(carry, k):
        leak, cum = carry
        kl, ks, ke, km = jax.random.split(k, 4)
        # state machine first: new leaks, then seepage (a qubit leaking
        # and seeping in one round still randomizes that round)
        leak = leak | (jax.random.uniform(kl, (batch, n)) < p_leak
                       ).astype(jnp.uint8)
        u = jax.random.uniform(ke, (batch, n))
        err = jnp.where(leak == 1, (u < 0.5).astype(jnp.uint8),
                        (u < p).astype(jnp.uint8))
        cum = cum ^ err
        syn = gf2_jax.syndromes_dense(cum, h)
        flip = (jax.random.uniform(km, (batch, r)) < q).astype(jnp.uint8)
        herald = leak
        leak = leak & (jax.random.uniform(ks, (batch, n)) >= p_seep
                       ).astype(jnp.uint8)
        return (leak, cum), (syn ^ flip, herald)

    leak0 = jnp.zeros((batch, n), jnp.uint8)
    cum0 = jnp.zeros((batch, n), jnp.uint8)
    keys = jax.random.split(key, rounds)
    (leak, cum), (syns, heralds) = jax.lax.scan(
        round_body, (leak0, cum0), keys)
    # final readout: still-leaked qubits read out randomly (one more 1/2
    # flip, heralded in the final layer); the readout itself is perfect
    kf = jax.random.fold_in(key, 0x5EED)
    u = jax.random.uniform(kf, (batch, n))
    cum = cum ^ (leak & (u < 0.5).astype(jnp.uint8))
    final = gf2_jax.syndromes_dense(cum, h)
    dets = [syns[0]]
    for t in range(1, rounds):
        dets.append(syns[t] ^ syns[t - 1])
    dets.append(final ^ syns[rounds - 1])
    par = gf2_jax.mod2_matmul(cum, lz.T)
    heralds = jnp.concatenate(
        [jnp.moveaxis(heralds, 0, 1), leak[:, None, :]], axis=1)
    return jnp.concatenate(dets, axis=-1), par, heralds


def _space_edge_index(base: MatchingGraph, rounds: int) -> np.ndarray:
    """[rounds+1, n_qubits] spacetime edge index of qubit j's slice-t
    space edge (-1 for check-free qubits); `spacetime_graph` layout."""
    idx = np.full((rounds + 1, base.n_qubits), -1, np.int32)
    for t in range(rounds + 1):
        for e, qb in enumerate(base.edge_qubit):
            idx[t, qb] = t * base.num_edges + e
    return idx


def leakage_memory_experiment(
    code,
    p: float,
    p_leak: float,
    *,
    q: float | None = None,
    p_seep: float = 0.2,
    rounds: int | None = None,
    samples: int = 1 << 13,
    batch: int | None = None,
    seed: int = 0,
    heralded: bool = True,
    decoder: str = "host",
    use_native: bool | None = None,
) -> dict[str, float]:
    """Multi-round phenomenological X-memory under persistent leakage,
    decoded with spacetime union-find whose space edges carry per-shot
    herald weights over the leak INTERVALS. ``heralded=False`` decodes
    the same shots blind; ``decoder='device'`` decodes on the
    accelerator (`DeviceUFDecoder`)."""
    h = code.raw_parity_check_c2
    lz = code.z_operator_matrix()
    if rounds is None:
        rounds = 2 * code.t + 1
    q = p if q is None else q
    batch = samples if batch is None else batch
    base = graph_from_checks(h, lz)
    p_eff, q_eff = max(p, 1e-9), max(q, 1e-9)
    graph = spacetime_graph(h, lz, rounds, p_space=p_eff, p_time=q_eff)
    # static weights on the erasure scale (ERASED_WEIGHT=1 for heralded
    # edges, Pauli edges proportionally more expensive)
    w_space = _pauli_weight(1.5 * p_eff)
    w_time = max(ERASED_WEIGHT + 1,
                 round(w_space * np.log(q_eff) / np.log(p_eff)))
    n_space = base.num_edges * (rounds + 1)
    static_w = np.concatenate([
        np.full(n_space, w_space),
        np.full(graph.num_edges - n_space, min(w_time, 250)),
    ]).astype(np.uint8)
    import dataclasses

    graph = dataclasses.replace(graph, edge_weight=static_w)
    if decoder == "device":
        from qcss_tpu.decode.device_uf import DeviceUFDecoder

        dec = DeviceUFDecoder(graph)
    elif decoder == "host":
        dec = UFDecoder(graph, use_native=use_native)
    else:
        raise ValueError("decoder must be 'host' or 'device'")
    se_idx = _space_edge_index(base, rounds)
    h_j = jnp.asarray(np.asarray(h, np.uint8))
    lz_j = jnp.asarray(np.asarray(lz, np.uint8))

    n_chunks = -(-samples // batch)
    keys = jax.random.split(jax.random.key(seed), n_chunks)
    fails = 0
    leak_frac = 0.0
    for i in range(n_chunks):
        dets, par, heralds = map(np.asarray, _sample_leakage_stream(
            keys[i], jnp.float32(p), jnp.float32(q), jnp.float32(p_leak),
            jnp.float32(p_seep), batch, rounds, code.n, h_j, lz_j))
        leak_frac += float(heralds.mean())
        sw = None
        if heralded:
            sw = np.tile(static_w, (batch, 1))
            valid = se_idx >= 0
            e_flat = se_idx[valid]
            hr_flat = heralds.reshape(batch, -1)[:, valid.ravel()]
            sw[:, e_flat] = np.where(hr_flat == 1, ERASED_WEIGHT,
                                     sw[:, e_flat]).astype(np.uint8)
        _, obs = dec.decode_batch(dets, want_corrections=False,
                                  shot_weights=sw)
        fails += int(np.sum(obs != _pack_parity(par)))
    n_samples = n_chunks * batch
    return {
        "logical_fail": fails / n_samples,
        "leak_fraction": leak_frac / n_chunks,
        "samples": n_samples,
        "rounds": rounds,
        "p": p,
        "q": q,
        "p_leak": p_leak,
        "p_seep": p_seep,
        "heralded": heralded,
    }
