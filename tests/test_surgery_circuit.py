"""Circuit-level lattice surgery: enumerator-vs-sampler exactness.

The load-bearing test is the differential: every enumerated fault
component's detector signature and observable effect must be reproduced
by injecting that exact fault into the frame engine running the SAME
extraction circuits (prefix-propagate, inject, suffix-propagate) — the
same guard that keeps dem/dem2 honest, extended to surgery's
time-varying check sets."""

import numpy as np
import pytest

from qcss_tpu.codes import families
from qcss_tpu.experiments import surgery as ph
from qcss_tpu.experiments import surgery_circuit as sc
from qcss_tpu.sim import frame as fr
from qcss_tpu.sim.noise import NoiseModel


def _geometry(d):
    rows, cols = d, 2 * d + 1
    n = rows * cols

    def embed(small, col_off):
        big = np.zeros((small.shape[0], n), np.uint8)
        sm = small.reshape(-1, d, d)
        for r in range(d):
            big[:, r * cols + col_off: r * cols + col_off + d] = sm[:, r, :]
        return big

    hx_p, _ = families.surface_rect_checks(d, d)
    hx_split = np.vstack([embed(hx_p, 0), embed(hx_p, d + 1)])
    hx_M, _ = families.surface_rect_checks(rows, cols)
    seam = [r * cols + d for r in range(rows)]
    return n, hx_split, hx_M, seam


def _signature_by_frames(d, R1, R2, placement, n, hx_split, hx_M, seam):
    """Detector signature + (m, xm) of one fault via frame propagation
    through the actual circuits — independent of the enumerator's walk."""
    import jax.numpy as jnp

    phase, t0, meta = placement
    r_s, r_m = hx_split.shape[0], hx_M.shape[0]
    nq = n + max(r_s, r_m)
    ops_s, arr_s = sc._x_extraction_ops(hx_split, n)
    ops_m, arr_m = sc._x_extraction_ops(hx_M, n)
    arrs = [arr_s, arr_m]
    ancs = [np.arange(n, n + r_s), np.arange(n, n + r_m)]

    f = fr.zero_frames(1, nq)
    o_s = np.zeros((R1, r_s), np.uint8)
    o_m = np.zeros((R2, r_m), np.uint8)
    outs = [o_s, o_m]
    rounds = [R1, R2]
    for pha in range(2):
        if pha == 1 and meta[0] == "seam":
            z = np.zeros(nq, np.uint8)
            z[meta[1]] = 1
            f = fr.Frames(f.x, f.z ^ jnp.asarray(z[None, :]))
        for t in range(rounds[pha]):
            inject_here = (pha == phase and t == t0 and meta[0]
                           in ("2qx", "2qz", "1qx", "1qz"))
            if inject_here:
                k = meta[2]
                ops_a, q0_a, q1_a = (np.asarray(a) for a in arrs[pha])
                idx = np.arange(ops_a.shape[0])
                # fixed-shape prefix/suffix (gates masked to I) — keeps
                # XLA at two compiled shapes instead of one per gate index
                f = fr.propagate_arrays(
                    f, np.where(idx <= k, ops_a, 0), q0_a, q1_a)
                pat = np.zeros(nq, np.uint8)
                pat[meta[3]] = 1
                if meta[0].endswith("x"):
                    f = fr.Frames(f.x ^ jnp.asarray(pat[None, :]), f.z)
                else:
                    f = fr.Frames(f.x, f.z ^ jnp.asarray(pat[None, :]))
                f = fr.propagate_arrays(
                    f, np.where(idx > k, ops_a, 0), q0_a, q1_a)
            else:
                f = fr.propagate_arrays(f, *arrs[pha])
            _, o = fr.measure_deviations(f, ancs[pha])
            outs[pha][t] = np.asarray(o)[0][: outs[pha].shape[1]]
            if meta[0] == "meas" and pha == phase and t == t0:
                outs[pha][t, meta[2]] ^= 1
            f = fr.reset_qubits(f, ancs[pha])
            if meta[0] == "reset" and pha == meta[1] and t == meta[-1]:
                xpat = np.zeros(nq, np.uint8)
                xpat[n + meta[2]] = 1
                f = fr.Frames(f.x ^ jnp.asarray(xpat[None, :]), f.z)
        if pha == 0:
            sq = np.asarray(seam)
            f = fr.Frames(f.x.at[:, sq].set(0), f.z.at[:, sq].set(0))
    w = np.asarray(f.z)[0, :n]
    return o_s, o_m, w


@pytest.mark.parametrize("d", [3])
def test_enumerator_matches_frame_injection(d):
    R1 = R2 = 3
    noise = NoiseModel(p_gate1=1e-3, p_gate2=1e-3, p_meas=1e-3,
                       p_reset=1e-3)
    model = sc.build_xx_merge_circuit(d, R1, R2, noise)
    n, hx_split, hx_M, seam = _geometry(d)
    r_s, r_m = hx_split.shape[0], hx_M.shape[0]
    ab_mask = np.ones(n, np.uint8)
    ab_mask[seam] = 0
    partner = np.full(r_m, -1, np.int64)
    for i in range(r_m):
        restr = hx_M[i] & ab_mask
        hits = np.nonzero((hx_split == restr[None, :]).all(axis=1))[0]
        if hits.size == 1 and restr.any():
            partner[i] = hits[0]
    keep = partner >= 0

    def col_op(c):
        v = np.zeros(n, np.uint8)
        v[[r * (2 * d + 1) + d_ for d_ in [c] for r in range(d)]] = 1
        return v

    system = np.vstack([hx_M * ab_mask[None, :], hx_split])
    target = ((col_op(d - 1) ^ col_op(d + 1)) & ab_mask)
    u = ph._solve_gf2(system, target)
    u_m, u_s = u[: hx_M.shape[0]], u[hx_M.shape[0]:]
    xbar_M = col_op(0)

    # reconstruct the enumerator's placement list deterministically
    rng = np.random.default_rng(0)
    checked = 0
    for f_idx, (dets_want, ob_want, meta) in enumerate(model.fault_sigs):
        # check ALL seam components and a random sample of the rest
        # (every class covered; the full sweep is ~4x slower for the
        # same structural coverage)
        if meta[0] != "seam" and rng.random() > 0.12:
            continue
        if meta[0] == "seam":
            placement = (1, 0, meta)
        else:
            phase, t = meta[1], meta[-1]
            placement = (phase, t, meta)
        o_s, o_m, w = _signature_by_frames(
            d, R1, R2, placement, n, hx_split, hx_M, seam)
        dets = [o_s[0]]
        for t in range(1, R1):
            dets.append(o_s[t] ^ o_s[t - 1])
        tr = o_m[0].copy()
        tr[keep] ^= o_s[R1 - 1][partner[keep]]
        dets.append(tr[keep])
        for t in range(1, R2):
            dets.append(o_m[t] ^ o_m[t - 1])
        fin = (hx_M.astype(np.int64) @ w.astype(np.int64)) & 1
        dets.append((fin ^ o_m[R2 - 1]).astype(np.uint8))
        sig = tuple(np.nonzero(np.concatenate(dets))[0])
        m = (int(u_m.astype(np.int64) @ o_m[0])
             ^ int(u_s.astype(np.int64) @ o_s[R1 - 1])) & 1
        xm = int(xbar_M.astype(np.int64) @ w.astype(np.int64)) & 1
        ob = m | (xm << 1)
        assert sig == dets_want, (meta, sig, dets_want)
        assert ob == ob_want, (meta, ob, ob_want)
        checked += 1
    assert checked >= 40


def test_circuit_merge_near_quiet_is_exact():
    noise = NoiseModel(p_gate2=1e-9, p_gate1=1e-9, p_meas=1e-9,
                       p_reset=1e-9)
    out = sc.xx_merge_circuit_memory(3, noise, batch=256, seed=3)
    assert out["m_fail"] == 0.0 and out["logical_fail"] == 0.0


def test_circuit_merge_distance_suppression():
    noise = NoiseModel(p_gate2=1.5e-3, p_gate1=1.5e-3, p_meas=1.5e-3,
                       p_reset=1.5e-3)
    o3 = sc.xx_merge_circuit_memory(3, noise, batch=1 << 13, seed=4)
    o5 = sc.xx_merge_circuit_memory(5, noise, batch=1 << 13, seed=5)
    assert o3["word_fail"] > 0
    assert o5["word_fail"] < o3["word_fail"]
