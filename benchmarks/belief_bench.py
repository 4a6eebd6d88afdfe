"""Belief-matching accuracy benchmark: the same two-sector circuit-level
shots decoded with independent matching, correlated two-pass matching,
and belief-matching (joint-graph BP posteriors as per-shot UF weights,
decode/belief.py).

Usage: python benchmarks/belief_bench.py [--d 3 5 7] [--batch 16384]
       [--p-gate 2e-3] [--p-meas 5e-3] [--iters 32]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

from qcss_tpu.codes import families
from qcss_tpu.experiments.memory_xz import xz_memory_experiment
from qcss_tpu.sim.noise import NoiseModel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, nargs="+", default=[3, 5, 7])
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--chunks", type=int, default=1,
                    help="independent seeds to accumulate per d")
    ap.add_argument("--p-gate", type=float, default=2e-3)
    ap.add_argument("--p-meas", type=float, default=5e-3)
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    noise = NoiseModel(p_gate2=args.p_gate, p_meas=args.p_meas)
    for d in args.d:
        code = families.rotated_surface(d)
        acc: dict[str, float] = {}
        t0 = time.perf_counter()
        for c in range(args.chunks):
            out = xz_memory_experiment(code, rounds=d, noise=noise,
                                       batch=args.batch, seed=c,
                                       belief=args.iters)
            for k in ("x_fail", "z_fail", "z_fail_corr", "word_fail",
                      "word_fail_corr", "x_fail_belief", "z_fail_belief",
                      "word_fail_belief"):
                acc[k] = acc.get(k, 0.0) + out[k] / args.chunks
        wall = time.perf_counter() - t0
        print(json.dumps({
            "bench": "belief_matching", "d": d, "rounds": d,
            "batch": args.batch * args.chunks,
            "p_gate2": args.p_gate, "p_meas": args.p_meas,
            "bp_iters": args.iters, "wall_s": round(wall, 2), **{
                k: round(v, 6) for k, v in acc.items()},
        }))


if __name__ == "__main__":
    main()
