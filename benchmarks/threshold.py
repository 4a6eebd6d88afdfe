"""Circuit-level threshold of the rotated surface code under the
DEM-weighted union-find device pipeline — the framework's flagship
quotable number (the reference publishes no benchmark numbers at all;
its QVM ceiling is 21 physical qubits, reference: test/test_ftqc.py:115).

Protocol: Z-basis memory, REAL extraction circuits sampled on the frame
engine, uniform circuit noise (p_gate2 = p_meas = p_reset = p on every
location), rounds = d, decoded on the exact single-fault circuit-level
DEM with the fused device union-find (`memory_experiment(
decoder='device-dem', engine='frames')`). For each adjacent distance
pair the crossing of the logical-failure curves is found by log-linear
interpolation; the quoted p_th is the mean of the pairwise crossings
with a Wilson-interval bootstrap spread.

Literature anchor: DEM-weighted matching-family decoders put the
surface-code circuit-level threshold at ~0.9-1.1% under this style of
uniform model; union-find gives up a little accuracy to matching, so a
slightly lower crossing is expected.

Usage:
  python benchmarks/threshold.py                    # full sweep
  python benchmarks/threshold.py --quick            # 1/8 the shots
Prints one JSON line per (d, p) point, then a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from qcss_tpu.codes.families import rotated_surface
from qcss_tpu.experiments.memory import memory_experiment
from qcss_tpu.sim.noise import NoiseModel


def wilson(k: int, n: int, z: float = 1.96):
    if n == 0:
        return (0.0, 1.0)
    ph = k / n
    den = 1 + z * z / n
    c = (ph + z * z / (2 * n)) / den
    hw = z * np.sqrt(ph * (1 - ph) / n + z * z / (4 * n * n)) / den
    return (max(c - hw, 0.0), min(c + hw, 1.0))


def make_noise(p: float, model: str) -> NoiseModel:
    """Noise conventions. 'uniform': p on every 1q/2q gate, measurement
    and reset — the round-4 headline model (NOT directly comparable to
    published numbers). 'si1000': the superconducting-inspired
    convention (Gidney et al.) mapped onto this framework's location
    types — 2q depolarizing p, 1q depolarizing p/10, measurement flip
    5p, reset X error 2p — the apples-to-apples convention against
    published ~0.5%-of-p2 circuit-level thresholds."""
    if model == "uniform":
        return NoiseModel(p_gate2=p, p_gate1=p, p_meas=p, p_reset=p)
    if model == "si1000":
        return NoiseModel(p_gate2=p, p_gate1=p / 10, p_meas=5 * p,
                          p_reset=2 * p)
    raise ValueError(f"unknown noise model {model!r}")


def run_point(d: int, p: float, shots: int, seed: int,
              decoder: str, batch: int, model: str = "uniform",
              iters: int = 32) -> dict:
    code = rotated_surface(d)
    noise = make_noise(p, model)
    fails = 0
    total = 0
    extra_fails: dict[str, int] = {}
    reps = max(1, shots // batch)
    for rep in range(reps):
        if decoder == "belief":
            # belief-matching tier (decode/belief.py): joint-graph BP
            # posteriors -> per-shot UF weights. The two-sector xz
            # sampler is a HARSHER convention than the Z-memory harness
            # (both sectors' extraction circuits and their correlations
            # are sampled), so its crossings are not comparable to the
            # memory_experiment rows — instead all three decoder tiers
            # (independent matching / correlated / belief) are recorded
            # from the SAME shots so the decoder ORDERING is measured
            # within one convention
            from qcss_tpu.experiments.memory_xz import xz_memory_experiment

            out = xz_memory_experiment(code, rounds=d, noise=noise,
                                       batch=batch,
                                       seed=seed * 1000 + rep,
                                       belief=iters)
            fails += round(out["z_fail_belief"] * batch)
            extra_fails["independent"] = extra_fails.get(
                "independent", 0) + round(out["z_fail"] * batch)
            extra_fails["correlated"] = extra_fails.get(
                "correlated", 0) + round(out["z_fail_corr"] * batch)
        else:
            out = memory_experiment(code, rounds=d, noise=noise,
                                    batch=batch,
                                    seed=seed * 1000 + rep,
                                    decoder=decoder, engine="frames")
            fails += round(out["logical_fail"] * batch)
        total += batch
    lo, hi = wilson(fails, total)
    row = {"d": d, "p": p, "shots": total, "fails": fails,
           "logical_fail": fails / total, "ci_lo": lo, "ci_hi": hi}
    for k, v in extra_fails.items():
        row[f"logical_fail_{k}"] = v / total
    return row


def crossings(rows: list[dict]) -> list[float]:
    """Pairwise curve crossings by log-linear interpolation in p."""
    by_d: dict[int, list[dict]] = {}
    for r in rows:
        by_d.setdefault(r["d"], []).append(r)
    for v in by_d.values():
        v.sort(key=lambda r: r["p"])
    ds = sorted(by_d)
    out = []
    for d1, d2 in zip(ds, ds[1:]):
        ps = [r["p"] for r in by_d[d1]]
        f1 = np.array([max(r["logical_fail"], 1e-9) for r in by_d[d1]])
        f2 = np.array([max(r["logical_fail"], 1e-9) for r in by_d[d2]])
        diff = np.log(f2) - np.log(f1)   # <0 below threshold, >0 above
        for i in range(len(ps) - 1):
            if diff[i] < 0 <= diff[i + 1]:
                # linear in log p between the bracketing points
                t = -diff[i] / (diff[i + 1] - diff[i])
                lp = np.log(ps[i]) + t * (np.log(ps[i + 1]) - np.log(ps[i]))
                out.append(float(np.exp(lp)))
                break
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--distances", default="3,5,7,9,11")
    ap.add_argument("--ps", default="0.004,0.005,0.006,0.007,0.008,0.009")
    ap.add_argument("--shots", type=int, default=1 << 17)
    ap.add_argument("--batch", type=int, default=1 << 15)
    ap.add_argument("--decoder", default="device-dem",
                    help="device-dem | dem | belief (belief-matching "
                    "tier, Z sector quoted)")
    ap.add_argument("--model", default="uniform",
                    choices=["uniform", "si1000"])
    ap.add_argument("--iters", type=int, default=32,
                    help="BP iterations for --decoder belief")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    shots = args.shots // 8 if args.quick else args.shots
    batch = min(args.batch, shots)
    rows = []
    for d in (int(x) for x in args.distances.split(",")):
        for p in (float(x) for x in args.ps.split(",")):
            t0 = time.perf_counter()
            row = run_point(d, p, shots, args.seed, args.decoder, batch,
                            model=args.model, iters=args.iters)
            row["bench"] = "circuit_threshold"
            row["model"] = args.model
            row["wall_sec"] = round(time.perf_counter() - t0, 1)
            rows.append(row)
            print(json.dumps(row), flush=True)
    xs = crossings(rows)
    summary = {"bench": "circuit_threshold_summary",
               "decoder": args.decoder, "model": args.model,
               "pairwise_crossings": [round(x, 5) for x in xs],
               "p_th": round(float(np.mean(xs)), 5) if xs else None,
               "p_th_spread": round(float(np.std(xs)), 5) if xs else None}
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
