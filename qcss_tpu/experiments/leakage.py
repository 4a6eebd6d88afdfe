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


def _sample_two_sector_leak(key, batch, rounds, code, noise, z_arrays,
                            x_arrays, z_comp, x_comp, rz, rx,
                            p_leak, p_seep, p_leak_anc):
    """`memory_xz._sample_two_sector` with a persistent DATA-qubit
    leakage state machine and per-round ANCILLA leakage. Leaked data
    qubits draw independent 1/2 X and 1/2 Z flips at each round
    boundary (exactly where dem2 books its k=-1 idle species — the
    decoder's static model stays in lockstep); a leaked ancilla's
    measurement outcome is randomized (^= Bernoulli(1/2)). Returns
    (syns_z, syns_x, x_err, z_err, herald_data [B, R, n],
    herald_anc_z [B, R, rz], herald_anc_x [B, R, rx])."""
    from qcss_tpu.sim import frame as fr

    n = code.n
    nq = n + rz + rx
    zanc = jnp.arange(n, n + rz, dtype=jnp.int32)
    xanc = jnp.arange(n + rz, nq, dtype=jnp.int32)
    dat = jnp.arange(n)
    f0 = fr.zero_frames(batch, nq)

    def round_body(carry, k):
        f, leak = carry
        (kl, ks, kxr, kzr_, kz, kzm, kza, kzam, kzrs,
         kx, kxm, kxa, kxam, kxrs) = jax.random.split(k, 14)
        leak = leak | (jax.random.uniform(kl, (batch, n)) < p_leak
                       ).astype(jnp.uint8)
        xr = (jax.random.uniform(kxr, (batch, n)) < 0.5
              ).astype(jnp.uint8) & leak
        zr = (jax.random.uniform(kzr_, (batch, n)) < 0.5
              ).astype(jnp.uint8) & leak
        f = fr.Frames(f.x.at[:, dat].set(f.x[:, dat] ^ xr),
                      f.z.at[:, dat].set(f.z[:, dat] ^ zr))
        if z_comp is not None:
            f = fr.run_compiled_noisy(f, z_comp, noise, kz)
        else:
            f = fr.run_arrays_noisy(f, *z_arrays, noise, kz)
        f, syn_z = fr.measure_deviations(f, zanc, kzm, noise.p_meas)
        anc_z = (jax.random.uniform(kza, (batch, rz)) < p_leak_anc
                 ).astype(jnp.uint8)
        syn_z = syn_z ^ (anc_z & (jax.random.uniform(
            kzam, (batch, rz)) < 0.5).astype(jnp.uint8))
        f = fr.reset_qubits(f, zanc, kzrs, noise.p_reset)
        if x_comp is not None:
            f = fr.run_compiled_noisy(f, x_comp, noise, kx)
        else:
            f = fr.run_arrays_noisy(f, *x_arrays, noise, kx)
        f, syn_x = fr.measure_deviations(f, xanc, kxm, noise.p_meas)
        anc_x = (jax.random.uniform(kxa, (batch, rx)) < p_leak_anc
                 ).astype(jnp.uint8)
        syn_x = syn_x ^ (anc_x & (jax.random.uniform(
            kxam, (batch, rx)) < 0.5).astype(jnp.uint8))
        f = fr.reset_qubits(f, xanc, kxrs, noise.p_reset)
        herald = leak
        leak = leak & (jax.random.uniform(ks, (batch, n)) >= p_seep
                       ).astype(jnp.uint8)
        return (f, leak), (syn_z, syn_x, herald, anc_z, anc_x)

    keys = jax.random.split(key, rounds)
    (f, _), (syns_z, syns_x, hd, hz_, hx_) = jax.lax.scan(
        round_body, (f0, jnp.zeros((batch, n), jnp.uint8)), keys)
    return (syns_z, syns_x, f.x[:, dat], f.z[:, dat],
            jnp.moveaxis(hd, 0, 1), jnp.moveaxis(hz_, 0, 1),
            jnp.moveaxis(hx_, 0, 1))


def expected_leak_profile(p_leak: float, p_seep: float,
                          rounds: int) -> np.ndarray:
    """Deterministic per-round expected leak fraction of the state
    machine (leak events first, herald, then seepage)."""
    out = np.empty(rounds)
    l = 0.0
    for t in range(rounds):
        l = l + (1.0 - l) * p_leak
        out[t] = l
        l *= (1.0 - p_seep)
    return out


def leakage_circuit_memory(
    code,
    *,
    rounds: int,
    noise,
    p_leak: float,
    p_seep: float = 0.2,
    p_leak_anc: float | None = None,
    batch: int = 1 << 12,
    seed: int = 0,
    heralded: bool = True,
    n_threads: int | None = None,
) -> dict[str, float]:
    """CIRCUIT-LEVEL two-sector memory under leakage, decoded on the
    exact circuit-level DEMs. The static model sees leakage as its
    round-boundary idle species at the AVERAGE leak fraction (exact
    lockstep: the sampler randomizes leaked data qubits at the round
    boundary, where dem2 books k=-1 idle species) plus a measurement-
    flip surplus of p_leak_anc/2 for randomized leaked-ancilla readouts;
    heralds make the leaked qubit's idle edges and the leaked ancilla's
    measurement edge near-free PER SHOT. ``heralded=False`` decodes the
    same shots blind. `noise` must carry no idle channel (leakage
    replaces it at this tier)."""
    import dataclasses

    from qcss_tpu.decode.dem2 import build_two_sector_dem
    from qcss_tpu.decode.spacetime import detector_history
    from qcss_tpu.experiments.memory import (
        x_extraction_circuit, z_extraction_circuit)
    from qcss_tpu.experiments.soft import _meas_edge_ids
    from qcss_tpu.sim import frame as fr

    if noise.p_idle:
        raise ValueError("leakage replaces the idle channel at this "
                         "tier; pass noise with p_idle=0")
    if p_leak_anc is None:
        p_leak_anc = p_leak
    hz = np.asarray(code.raw_parity_check_c2, np.uint8) & 1
    hx = np.asarray(code.raw_parity_check_c1, np.uint8) & 1
    rz, rx = hz.shape[0], hx.shape[0]
    lz = np.asarray(code.z_operator_matrix(), np.uint8) & 1
    lx = np.asarray(code.x_operator_matrix(), np.uint8) & 1
    n = code.n

    z_arrays = tuple(map(jnp.asarray, z_extraction_circuit(
        code, checks=hz).to_arrays()))
    x_arrays = tuple(map(jnp.asarray, x_extraction_circuit(
        code, anc_offset=n + rz, checks=hx).to_arrays()))
    nq = n + rz + rx
    fn = jax.jit(
        partial(_sample_two_sector_leak, code=code, noise=noise,
                z_arrays=z_arrays, x_arrays=x_arrays,
                z_comp=fr.maybe_compile(z_arrays, nq),
                x_comp=fr.maybe_compile(x_arrays, nq),
                rz=rz, rx=rx, p_leak=float(p_leak),
                p_seep=float(p_seep), p_leak_anc=float(p_leak_anc)),
        static_argnames=("batch", "rounds"),
    )
    (syns_z, syns_x, x_err, z_err, hd, ha_z, ha_x) = map(
        np.asarray, fn(jax.random.key(seed), batch, rounds))

    final_z = ((x_err.astype(np.int64) @ hz.T) & 1).astype(np.uint8)
    final_x = ((z_err.astype(np.int64) @ hx.T) & 1).astype(np.uint8)
    dets_z = detector_history(syns_z, final_z)
    dets_x = detector_history(syns_x, final_x)

    leak_avg = float(expected_leak_profile(p_leak, p_seep,
                                           rounds).mean())
    pm_eff = noise.p_meas + 0.5 * p_leak_anc \
        - 2.0 * noise.p_meas * 0.5 * p_leak_anc
    noise_dem = dataclasses.replace(
        noise, p_meas=pm_eff, p_idle=0.75 * max(leak_avg, 1e-9),
        pauli_idle=(max(leak_avg, 1e-9) / 4.0,) * 3)
    dem, index, comp_edges = build_two_sector_dem(
        code, rounds, noise_dem, return_comp_edges=True)

    # herald targets: the leaked qubit's idle edge per (t, q), and the
    # leaked ancilla's measurement edge per (t, c)
    idle_eids = {}
    for sector, comp in (("z", "x"), ("x", "z")):
        ids = np.full((rounds, n), -1, np.int32)
        for t in range(rounds):
            for q in range(n):
                e = comp_edges.get((t, ("idle", q, comp), sector))
                if e is not None:
                    ids[t, q] = e
        idle_eids[sector] = ids
    meas_eids = {"z": _meas_edge_ids(index["z"], rounds, rz),
                 "x": _meas_edge_ids(index["x"], rounds, rx)}

    out = {"samples": batch, "rounds": rounds, "p_leak": p_leak,
           "p_seep": p_seep, "p_leak_anc": p_leak_anc,
           "leak_fraction": float(hd.mean()), "heralded": heralded}
    par = {
        "z": ((x_err.astype(np.int64) @ lz[0]) & 1).astype(np.uint32),
        "x": ((z_err.astype(np.int64) @ lx[0]) & 1).astype(np.uint32),
    }
    fails = {}
    for sector, graph, dets, ha in (
            ("z", dem.graph_x_errors, dets_z, ha_z),
            ("x", dem.graph_z_errors, dets_x, ha_x)):
        dec = UFDecoder(graph, use_native=None)
        sw = None
        if heralded:
            static_w = np.asarray(graph.edge_weight)
            sw = np.tile(static_w, (batch, 1))
            ids = idle_eids[sector]
            valid = ids >= 0
            e_flat = ids[valid]
            h_flat = hd.reshape(batch, -1)[:, valid.ravel()]
            sw[:, e_flat] = np.where(h_flat == 1, ERASED_WEIGHT,
                                     sw[:, e_flat]).astype(np.uint8)
            m_ids = meas_eids[sector].ravel()
            ham = ha.reshape(batch, -1)
            sw[:, m_ids] = np.where(ham == 1, ERASED_WEIGHT,
                                    sw[:, m_ids]).astype(np.uint8)
        _, obs = dec.decode_batch(dets, want_corrections=False,
                                  n_threads=n_threads, shot_weights=sw)
        fails[sector] = (obs & 1) != par[sector]
    out["x_fail"] = float(np.mean(fails["z"]))
    out["z_fail"] = float(np.mean(fails["x"]))
    out["word_fail"] = float(np.mean(fails["z"] | fails["x"]))
    return out


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
    calibrated: bool = False,
) -> dict[str, float]:
    """Multi-round phenomenological X-memory under persistent leakage,
    decoded with spacetime union-find whose space edges carry per-shot
    herald weights over the leak INTERVALS. ``heralded=False`` decodes
    the same shots blind — leakage-IGNORANT by default (static weights
    from the Pauli rates alone), or leakage-CALIBRATED with
    ``calibrated=True`` (the average leak-induced flip rate folded into
    the static space-edge weights: what a calibrated-but-unheralded
    stack decodes with). ``decoder='device'`` decodes on the
    accelerator (`DeviceUFDecoder`)."""
    h = code.raw_parity_check_c2
    lz = code.z_operator_matrix()
    if rounds is None:
        rounds = 2 * code.t + 1
    q = p if q is None else q
    batch = samples if batch is None else batch
    base = graph_from_checks(h, lz)
    p_eff, q_eff = max(p, 1e-9), max(q, 1e-9)
    if calibrated:
        # fold the expected leak-induced 1/2-flip rate into the static
        # space-edge likelihoods (average over the round profile)
        leak_avg = float(expected_leak_profile(
            p_leak, p_seep, rounds).mean())
        extra = 0.5 * leak_avg
        p_eff = p_eff + extra - 2.0 * p_eff * extra
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
