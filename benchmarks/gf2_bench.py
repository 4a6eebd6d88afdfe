"""Batched GF(2) RREF throughput (the BASELINE Gbit-ops/s metric).

Reduces a large batch of dense binary matrices to reduced row echelon form
on device (`ops/gf2_jax.rref_batched`) and reports throughput as Gbit-ops/s
with bit-ops counted as the dense elimination bound B * n_cols * m * n
(one conditional row-XOR across the full batch per pivot column).

Usage: python benchmarks/gf2_bench.py [--batch 4096] [--shape 64 128]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from qcss_tpu.ops import gf2_jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--shape", type=int, nargs=2, default=[64, 128])
    args = ap.parse_args()
    m, n = args.shape
    rng = np.random.default_rng(0)
    mats = jnp.asarray(rng.integers(0, 2, size=(args.batch, m, n), dtype=np.uint8))

    def run_once(x):
        out = gf2_jax.rref_batched(x)
        return int(out[0, 0, 0]) + int(out.sum())  # host fence

    run_once(mats)
    run_once(mats ^ 1)
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        run_once(mats ^ (i % 2))
    dt = time.perf_counter() - t0

    bit_ops = args.batch * n * m * n  # per reduction
    print(json.dumps({
        "metric": "gf2_rref_batched",
        "batch": args.batch,
        "shape": [m, n],
        "value": round(reps * bit_ops / dt / 1e9, 2),
        "unit": "Gbit-ops/s/chip",
        "reductions_per_sec": round(reps * args.batch / dt),
    }))


if __name__ == "__main__":
    main()
