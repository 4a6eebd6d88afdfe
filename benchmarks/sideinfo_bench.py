"""Per-shot side-information decoding benchmark: soft readout, heralded
erasure, leakage heralds, biased-noise DEMs.

Reproduces the BASELINE.md rows for the side-information stack — every
experiment decodes the SAME shots with and without the side channel (or
with the exact vs mis-specified model), so each JSON line prices one
information source:

  {"bench": "soft_phenomenological", "d": 5, "fail_soft": .., "fail_hard": ..}
  {"bench": "soft_device_fused", "d": 5, "shots_per_sec": .., ...}
  {"bench": "erasure", ...}
  {"bench": "leakage", "fail_heralded": .., "fail_calibrated": ..,
   "fail_blind": ..}
  {"bench": "leakage_circuit", ...}
  {"bench": "biased_dem", "fail_biased": .., "fail_uniform": ..}

No reference analogue for any row: LUT decoding consumes classical bits
only (reference: css_code.py:649-685).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from qcss_tpu.codes import families  # noqa: E402
from qcss_tpu.sim.noise import NoiseModel  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=5)
    ap.add_argument("--samples", type=int, default=1 << 15)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--bench", default="all",
                    choices=["all", "soft", "soft-device", "erasure",
                             "leakage", "leakage-circuit", "biased"])
    args = ap.parse_args()
    code = families.rotated_surface(args.d)
    run = (lambda name: args.bench in ("all", name))

    if run("soft"):
        from qcss_tpu.experiments import soft

        kw = dict(rounds=args.d, samples=args.samples,
                  batch=min(args.samples, 1 << 13), seed=args.seed)
        rs = soft.soft_phenomenological_error_rate(
            code, 3e-3, 0.7, soft=True, **kw)
        rh = soft.soft_phenomenological_error_rate(
            code, 3e-3, 0.7, soft=False, **kw)
        print(json.dumps({
            "bench": "soft_phenomenological", "d": args.d,
            "p": 3e-3, "sigma": 0.7, "q_eff": rs["q_eff"],
            "samples": rs["samples"], "fail_soft": rs["logical_fail"],
            "fail_hard": rh["logical_fail"]}), flush=True)

    if run("soft-device"):
        from qcss_tpu.experiments import soft

        out = soft.soft_device_memory_rate(
            code, 3e-3, 0.7, rounds=args.d,
            batch=min(args.samples, 1 << 13), reps=4, seed=args.seed)
        out["bench"] = "soft_device_fused"
        out["d"] = args.d
        print(json.dumps(out), flush=True)

    if run("erasure"):
        from qcss_tpu.experiments.erasure import (
            erasure_phenomenological_error_rate)

        kw = dict(rounds=args.d, samples=args.samples,
                  batch=min(args.samples, 1 << 13), seed=args.seed)
        rh = erasure_phenomenological_error_rate(
            code, 1e-3, 0.01, heralded=True, **kw)
        rb = erasure_phenomenological_error_rate(
            code, 1e-3, 0.01, heralded=False, **kw)
        print(json.dumps({
            "bench": "erasure", "d": args.d, "p": 1e-3,
            "p_erase": 0.01, "samples": rh["samples"],
            "fail_heralded": rh["logical_fail"],
            "fail_blind": rb["logical_fail"]}), flush=True)

    if run("leakage"):
        from qcss_tpu.experiments import leakage

        kw = dict(rounds=2 * args.d, samples=args.samples,
                  batch=min(args.samples, 1 << 13), seed=args.seed)
        rh = leakage.leakage_memory_experiment(
            code, 1e-3, 5e-3, heralded=True, **kw)
        rc = leakage.leakage_memory_experiment(
            code, 1e-3, 5e-3, heralded=False, calibrated=True, **kw)
        rb = leakage.leakage_memory_experiment(
            code, 1e-3, 5e-3, heralded=False, **kw)
        print(json.dumps({
            "bench": "leakage", "d": args.d, "p": 1e-3, "p_leak": 5e-3,
            "samples": rh["samples"],
            "leak_fraction": rh["leak_fraction"],
            "fail_heralded": rh["logical_fail"],
            "fail_calibrated": rc["logical_fail"],
            "fail_blind": rb["logical_fail"]}), flush=True)

    if run("leakage-circuit"):
        from qcss_tpu.experiments import leakage

        nm = NoiseModel(p_gate2=1e-3, p_meas=2e-3, p_reset=1e-3)
        kw = dict(rounds=2 * args.d, noise=nm, p_leak=4e-3,
                  batch=min(args.samples, 1 << 13), seed=args.seed)
        rh = leakage.leakage_circuit_memory(code, heralded=True, **kw)
        rb = leakage.leakage_circuit_memory(code, heralded=False, **kw)
        print(json.dumps({
            "bench": "leakage_circuit", "d": args.d, "p_leak": 4e-3,
            "samples": rh["samples"],
            "fail_heralded": rh["word_fail"],
            "fail_calibrated_blind": rb["word_fail"]}), flush=True)

    if run("biased"):
        import dataclasses

        from qcss_tpu.experiments.memory_xz import xz_memory_experiment

        biased = NoiseModel(p_gate2=4e-3, pauli2=(2.5e-4, 2.5e-4, 3.5e-3),
                            p_meas=6e-3, p_reset=2e-3)
        out_b = xz_memory_experiment(
            code, rounds=args.d, noise=biased,
            batch=min(args.samples, 1 << 13), seed=args.seed)
        print(json.dumps({
            "bench": "biased_dem", "d": args.d,
            "samples": out_b["samples"],
            "word_fail_biased_model": out_b["word_fail"],
            "word_fail_corr": out_b["word_fail_corr"]}), flush=True)


if __name__ == "__main__":
    main()
