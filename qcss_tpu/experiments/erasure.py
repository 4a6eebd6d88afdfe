"""Heralded-erasure noise and erasure-aware decoding.

Erasure qubits convert the dominant physical fault into a *heralded*
loss: the location is flagged classically and the qubit is replaced by
the maximally mixed state (uniform over I/X/Y/Z — an X-component and a
Z-component flip, each with probability 1/2, independently). The herald
is per-shot side information for the decoder: erased edges decode at
near-zero cost via the union-find kernel's per-shot weight override
(`UFDecoder.decode_batch(shot_weights=...)`), which lifts the surface
code's code-capacity threshold from ~11% (unheralded depolarizing) to
the bond-percolation bound of 50% for pure erasure, and any erasure
pattern of weight < d decodes exactly (the correction is unique up to
stabilizers once no logical operator fits inside the erased support).

Two noise tiers, mirroring the Pauli stack's ladder:

* code capacity (`erasure_error_rate`): one erasure+Pauli layer, both
  sectors decoded on the per-sector matching graphs;
* phenomenological (`erasure_phenomenological_error_rate`): per-round
  data erasures (detected and reset each cycle, the erasure-qubit
  operating model) + data flips p + measurement flips q, decoded on the
  spacetime graph with the erased (round, qubit) space edges down-
  weighted per shot.

Sampling and syndrome extraction run batched on device; only syndromes,
logical parities, and the herald masks cross the host boundary. No
reference analogue: the reference's LUT architecture has no notion of
per-shot decoder side information (reference: css_code.py:649-685).
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
from qcss_tpu.ops import gf2_jax

#: shot-weight assigned to heralded (erased) edges — the minimum the
#: kernel supports, so clusters absorb erased edges first.
ERASED_WEIGHT = 1


def _pauli_weight(p_pauli: float, w_erased: int = ERASED_WEIGHT,
                  cap: int = 250) -> int:
    """Growth weight for un-erased edges such that weight ratios track
    -log-likelihood ratios against the erased edges' 1/2 component rate:
    w = w_erased * ln(p_component) / ln(1/2). Pure erasure (p_pauli = 0)
    pins un-erased edges at the uint8 cap — they are never used."""
    if p_pauli <= 0.0:
        return cap
    comp = 2.0 * p_pauli / 3.0  # X (or Z) component of depolarizing p
    w = round(w_erased * np.log(comp) / np.log(0.5))
    return int(np.clip(w, w_erased + 1, cap))


@partial(jax.jit, static_argnames=("batch", "n"))
def _sample_erasure_layer(key, batch, n, p_pauli, p_erase):
    """One code-capacity layer: erasure mask [B, n] plus X/Z component
    flips — depolarizing p_pauli on intact qubits, 1/2-1/2 independent
    components on erased ones."""
    km, kp, ke = jax.random.split(key, 3)
    erased = (jax.random.uniform(km, (batch, n)) < p_erase).astype(jnp.uint8)
    # depolarizing components on intact qubits (event layout identical to
    # noise._thresholds_1q: X on [0, 2p/3), Z on [p/3, p))
    u = jax.random.uniform(kp, (batch, n), dtype=jnp.float32)
    x_dep = (u < 2.0 * p_pauli / 3.0).astype(jnp.uint8)
    z_dep = ((u >= p_pauli / 3.0) & (u < p_pauli)).astype(jnp.uint8)
    # independent 1/2 components on erased qubits
    v = jax.random.uniform(ke, (batch, 2 * n), dtype=jnp.float32)
    x_er = (v[:, :n] < 0.5).astype(jnp.uint8)
    z_er = (v[:, n:] < 0.5).astype(jnp.uint8)
    x_err = jnp.where(erased == 1, x_er, x_dep)
    z_err = jnp.where(erased == 1, z_er, z_dep)
    return erased, x_err, z_err


def _shot_weights(erased_edges: np.ndarray, w_pauli: int) -> np.ndarray:
    """[B, E] uint8 per-shot weights from a boolean erased-edge mask."""
    return np.where(erased_edges, ERASED_WEIGHT, w_pauli).astype(np.uint8)


def erasure_error_rate(
    code,
    p_pauli: float,
    p_erase: float,
    *,
    samples: int = 1 << 14,
    batch: int | None = None,
    seed: int = 0,
    heralded: bool = True,
    use_native: bool | None = None,
) -> dict[str, float]:
    """Code-capacity logical error rate under mixed depolarizing+erasure
    noise, both sectors decoded with per-shot-weighted union-find.

    ``heralded=False`` decodes the SAME shots ignoring the erasure flags
    (uniform weights) — the ablation that prices the herald."""
    batch = samples if batch is None else batch
    h2, h1 = code.raw_parity_check_c2, code.raw_parity_check_c1
    lz, lx = code.z_operator_matrix(), code.x_operator_matrix()
    gx = graph_from_checks(h2, lz)   # X errors, Z-type checks
    gz = graph_from_checks(h1, lx)
    dec_x, dec_z = UFDecoder(gx, use_native=use_native), UFDecoder(
        gz, use_native=use_native)
    w_pauli = _pauli_weight(p_pauli)
    h2_j, h1_j = jnp.asarray(h2, jnp.uint8), jnp.asarray(h1, jnp.uint8)
    lz_j, lx_j = jnp.asarray(lz, jnp.uint8), jnp.asarray(lx, jnp.uint8)

    @partial(jax.jit, static_argnames=("b",))
    def step(key, b):
        erased, x_err, z_err = _sample_erasure_layer(
            key, b, code.n, jnp.float32(p_pauli), jnp.float32(p_erase))
        return (erased,
                gf2_jax.syndromes_dense(x_err, h2_j),
                gf2_jax.syndromes_dense(z_err, h1_j),
                gf2_jax.mod2_matmul(x_err, lz_j.T),
                gf2_jax.mod2_matmul(z_err, lx_j.T))

    n_rounds = -(-samples // batch)
    keys = jax.random.split(jax.random.key(seed), n_rounds)
    fails = {"x_fail": 0, "z_fail": 0, "word_fail": 0}
    for i in range(n_rounds):
        erased, syn_x, syn_z, par_x, par_z = map(np.asarray, step(keys[i], batch))
        sw_x = sw_z = None
        if heralded:
            sw_x = _shot_weights(erased[:, gx.edge_qubit], w_pauli)
            sw_z = _shot_weights(erased[:, gz.edge_qubit], w_pauli)
        _, obs_x = dec_x.decode_batch(syn_x, want_corrections=False,
                                      shot_weights=sw_x)
        _, obs_z = dec_z.decode_batch(syn_z, want_corrections=False,
                                      shot_weights=sw_z)
        xf = obs_x != _pack_parity(par_x)
        zf = obs_z != _pack_parity(par_z)
        fails["x_fail"] += int(np.sum(xf))
        fails["z_fail"] += int(np.sum(zf))
        fails["word_fail"] += int(np.sum(xf | zf))
    n_samples = n_rounds * batch
    out = {k: v / n_samples for k, v in fails.items()}
    out.update(samples=n_samples, p_pauli=p_pauli, p_erase=p_erase,
               heralded=heralded)
    return out


# -- phenomenological spacetime tier -------------------------------------------


def _space_edge_index(graph: MatchingGraph, base: MatchingGraph,
                      rounds: int) -> np.ndarray:
    """[rounds+1, n_qubits] int32: spacetime edge index of qubit j's space
    edge in slice t (-1 for check-free qubits). Relies on
    `spacetime_graph`'s layout: slices' space edges first, t-major, in
    base-edge order; time edges after."""
    idx = np.full((rounds + 1, base.n_qubits), -1, np.int32)
    e_per_slice = base.num_edges
    for t in range(rounds + 1):
        for e, q in enumerate(base.edge_qubit):
            idx[t, q] = t * e_per_slice + e
    return idx


@partial(jax.jit, static_argnames=("batch", "rounds", "n"))
def _sample_phenom_erasure(key, p, q, p_erase, batch, rounds, n, h, lz):
    """Phenomenological stream with per-round heralded data erasures:
    round t draws an erasure mask [B, n] (each erased qubit suffers a
    1/2 X-component flip and is reset — the erasure-qubit conversion
    model), plus IID data flips p and measurement flips q. Layer
    `rounds` (before the perfect readout) has Pauli noise only. Returns
    (detectors [B, (rounds+1)*r], parities [B, k], erased
    [B, rounds+1, n] with the final layer all-zero)."""
    r = h.shape[0]
    ke, km, kf = jax.random.split(key, 3)
    erased = (
        jax.random.uniform(ke, (rounds + 1, batch, n)) < p_erase
    ).astype(jnp.uint8)
    erased = erased.at[rounds].set(0)
    u = jax.random.uniform(km, (rounds + 1, batch, n))
    errs = jnp.where(erased == 1, (u < 0.5).astype(jnp.uint8),
                     (u < p).astype(jnp.uint8))
    flips = (
        jax.random.uniform(kf, (rounds, batch, r)) < q
    ).astype(jnp.uint8)
    cum = jnp.cumsum(errs.astype(jnp.int32), axis=0).astype(jnp.uint8) & 1
    syns = [gf2_jax.syndromes_dense(cum[t], h) ^ flips[t] for t in range(rounds)]
    final = gf2_jax.syndromes_dense(cum[rounds], h)
    dets = [syns[0]]
    for t in range(1, rounds):
        dets.append(syns[t] ^ syns[t - 1])
    dets.append(final ^ syns[rounds - 1])
    par = gf2_jax.mod2_matmul(cum[rounds], lz.T)
    return jnp.concatenate(dets, axis=-1), par, jnp.moveaxis(erased, 0, 1)


def erasure_phenomenological_error_rate(
    code,
    p: float,
    p_erase: float,
    q: float | None = None,
    *,
    rounds: int | None = None,
    samples: int = 1 << 13,
    batch: int | None = None,
    seed: int = 0,
    heralded: bool = True,
    use_native: bool | None = None,
    decoder: str = "host",
) -> dict[str, float]:
    """Multi-round phenomenological X-memory with per-round heralded data
    erasures, decoded with spacetime union-find whose space edges carry
    per-shot herald weights. `q` defaults to p; `rounds` to the distance.
    ``heralded=False`` is the same-physics ablation (static weights).
    ``decoder='device'`` decodes on the accelerator (the device union-
    find kernel's per-shot ``shot_weights`` input) instead of the host
    C++ kernel."""
    h = code.raw_parity_check_c2
    lz = code.z_operator_matrix()
    if rounds is None:
        rounds = 2 * code.t + 1
    q = p if q is None else q
    batch = samples if batch is None else batch
    base = graph_from_checks(h, lz)
    # static weights reflect the Pauli-only rates; the herald overrides
    # per shot. Effective un-erased space rate is p, time rate q.
    p_eff = max(p, 1e-9)
    graph = spacetime_graph(h, lz, rounds, p_space=p_eff, p_time=max(q, 1e-9))
    w_space = _pauli_weight(1.5 * p_eff)  # p as X-component rate directly
    w_time = max(ERASED_WEIGHT + 1,
                 round(w_space * np.log(max(q, 1e-9)) / np.log(p_eff))) \
        if q > 0 else 250
    static_w = np.concatenate([
        np.full(base.num_edges * (rounds + 1), w_space),
        np.full(graph.num_edges - base.num_edges * (rounds + 1), w_time),
    ]).astype(np.uint8)
    graph = MatchingGraph(
        num_nodes=graph.num_nodes, edges=graph.edges,
        edge_qubit=graph.edge_qubit, edge_obs=graph.edge_obs,
        n_qubits=graph.n_qubits, edge_weight=np.minimum(static_w, 250))
    if decoder == "device":
        from qcss_tpu.decode.device_uf import DeviceUFDecoder

        dec = DeviceUFDecoder(graph)
    elif decoder == "host":
        dec = UFDecoder(graph, use_native=use_native)
    else:
        raise ValueError("decoder must be 'host' or 'device'")
    se_idx = _space_edge_index(graph, base, rounds)  # [rounds+1, n]
    h_j, lz_j = jnp.asarray(h, jnp.uint8), jnp.asarray(lz, jnp.uint8)

    n_rounds = -(-samples // batch)
    keys = jax.random.split(jax.random.key(seed), n_rounds)
    fails = 0
    for i in range(n_rounds):
        dets, par, erased = map(np.asarray, _sample_phenom_erasure(
            keys[i], jnp.float32(p), jnp.float32(q), jnp.float32(p_erase),
            batch, rounds, code.n, h_j, lz_j))
        sw = None
        if heralded:
            sw = np.tile(static_w, (batch, 1))
            # erased[:, t, j] -> space edge se_idx[t, j]
            valid = se_idx >= 0
            e_flat = se_idx[valid]
            er_flat = erased.reshape(batch, -1)[:, valid.ravel()]
            sw[:, e_flat] = np.where(er_flat == 1, ERASED_WEIGHT,
                                     sw[:, e_flat]).astype(np.uint8)
        _, obs = dec.decode_batch(dets, want_corrections=False,
                                  shot_weights=sw)
        fails += int(np.sum(obs != _pack_parity(par)))
    n_samples = n_rounds * batch
    return {
        "logical_fail": fails / n_samples,
        "samples": n_samples,
        "rounds": rounds,
        "p": p,
        "q": q,
        "p_erase": p_erase,
        "heralded": heralded,
    }
