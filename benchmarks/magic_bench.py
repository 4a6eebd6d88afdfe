"""Magic-state distillation benchmark (round 3 — beyond reference).

The reference's universal-gate path is an explicit stub (`_apply_universal`
returns None, reference: css_code.py:433-434): it supports NO non-Clifford
gate and hence no universal computation. This harness measures the
framework's universality layer (`ftqc/magic.py`):

  * exact one-level 15-to-1 map and its cascade (coset weight enumeration,
    2^{r_2} exact — the 35 p^3 law and raw-state factory costs),
  * batched device Monte-Carlo throughput of the protocol-level map,
  * circuit-level distillation on the Pauli-frame engine (noisy Cliffords:
    encoded |+̄> prep + injected twirled T inputs + real X extraction) —
    the Clifford-noise floor a factory designer needs.

Prints one JSON line per measurement.
"""

import argparse
import json
import sys
import time

import jax

sys.path.insert(0, ".")

from qcss_tpu.ftqc import magic  # noqa: E402
from qcss_tpu.sim.noise import NoiseModel  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p-in", type=float, default=1e-2)
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--mc-batch", type=int, default=1 << 24)
    ap.add_argument("--circuit-batch", type=int, default=1 << 20)
    ap.add_argument("--p-clifford", type=float, default=1e-4)
    ap.add_argument("--extractions", type=int, default=1)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    for lv in magic.distill_cascade(args.p_in, args.levels):
        print(json.dumps({"tier": "exact", **{k: float(v) for k, v in lv.items()}}),
              flush=True)

    # Protocol-level Monte-Carlo throughput (warm up, then host-fence reps).
    magic.distill_mc(args.p_in, args.mc_batch, seed=0)
    t0 = time.perf_counter()
    for rep in range(args.reps):
        mc = magic.distill_mc(args.p_in, args.mc_batch, seed=rep + 1)
    dt = (time.perf_counter() - t0) / args.reps
    print(json.dumps({"tier": "mc", **mc, "sec": dt,
                      "samples_per_sec": args.mc_batch / dt}), flush=True)

    noise = NoiseModel(p_gate1=args.p_clifford, p_gate2=args.p_clifford,
                       p_meas=args.p_clifford, p_reset=args.p_clifford)
    magic.distill_circuit(noise, args.p_in, args.circuit_batch,
                          extractions=args.extractions, seed=0)
    t0 = time.perf_counter()
    for rep in range(args.reps):
        cc = magic.distill_circuit(noise, args.p_in, args.circuit_batch,
                                   extractions=args.extractions, seed=rep + 1)
    dt = (time.perf_counter() - t0) / args.reps
    exact = magic.distill_exact(args.p_in)
    print(json.dumps({"tier": "circuit", "p_clifford": args.p_clifford,
                      **cc, "sec": dt,
                      "samples_per_sec": args.circuit_batch / dt,
                      "floor_over_exact": cc["p_out"] / exact["p_out"]}),
          flush=True)

    # End-to-end factory: measured injection eps on the Steane code feeds
    # the exact cascade (physical T error -> final magic-state fidelity).
    from qcss_tpu.codes import families
    from qcss_tpu.experiments.injection import factory_report

    rep = factory_report(families.steane(), noise, args.p_clifford * 10,
                         levels=args.levels, batch=args.circuit_batch,
                         seed=7)
    print(json.dumps({"tier": "factory", "p_clifford": args.p_clifford,
                      "p_t": args.p_clifford * 10,
                      "inject_eps": rep["injection"]["eps"],
                      "inject_accept": rep["injection"]["p_accept"],
                      "p_out": rep["p_out"],
                      "injections_per_state": rep["injections_per_state"]}),
          flush=True)


if __name__ == "__main__":
    main()
