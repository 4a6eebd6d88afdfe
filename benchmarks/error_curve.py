"""Logical-error-rate curve CLI (BASELINE config 3).

Sweeps the physical depolarizing rate and prints one JSON line per point;
with --checkpoint the sweep is resumable. Runs mesh-parallel when more than
one device is visible.

Usage:
  python benchmarks/error_curve.py --code steane --samples 1048576 \
      --ps 0.001 0.003 0.01 0.03 0.1 [--checkpoint curve.jsonl]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import jax

from qcss_tpu.codes import families
from qcss_tpu.decode import error_rate_curve

CODES = {
    "steane": lambda: families.steane(),
    "shor": lambda: families.shor(),
    "rm15": lambda: families.reed_muller_15(),
    "surface3": lambda: families.rotated_surface(3, max_table_weight=2, t=None),
    "surface5": lambda: families.rotated_surface(5, max_table_weight=3, t=None),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", choices=sorted(CODES), default="steane")
    ap.add_argument("--ps", type=float, nargs="+",
                    default=[0.001, 0.003, 0.01, 0.03, 0.1])
    ap.add_argument("--samples", type=int, default=1 << 20)
    ap.add_argument("--batch", type=int, default=1 << 18)
    ap.add_argument("--checkpoint", default=None)
    args = ap.parse_args()

    mesh = None
    if len(jax.devices()) > 1:
        from qcss_tpu.parallel import make_mesh

        mesh = make_mesh()

    points = error_rate_curve(
        CODES[args.code](), args.ps,
        samples_per_point=args.samples, batch=args.batch,
        checkpoint_path=args.checkpoint, mesh=mesh,
    )
    for pt in points:
        print(json.dumps({"code": args.code, **pt}))


if __name__ == "__main__":
    main()
