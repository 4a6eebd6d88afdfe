"""Flag EC vs Steane EC (round 3: ec_mode='flag').

Steane EC burns two freshly verified n-qubit encoded ancilla blocks per
extraction (the reference's only protocol — reference: css_code.py:436-470);
flag EC measures each stabilizer with a bare syndrome qubit + flag qubit
pair (Chao-Reichardt / Chamberland-Beverland), so an EC round costs 2
ancilla qubits instead of 2n — at the price of sequential data coupling
(deeper circuits, more idle exposure) and adaptive re-extraction.

This harness runs the same program under both modes at identical physics
and prints one JSON line per configuration: logical failure, throughput,
and the ancilla-qubit budget.
"""

import argparse
import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from qcss_tpu.circuits import Program  # noqa: E402
from qcss_tpu.codes import families  # noqa: E402
from qcss_tpu.ftqc import rewrite_program  # noqa: E402
from qcss_tpu.sim.noise import NoiseModel  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default="steane",
                    choices=["steane", "surface3", "color3"])
    ap.add_argument("--p", type=float, nargs="+", default=[1e-3, 3e-4])
    ap.add_argument("--p-idle-frac", type=float, default=0.0,
                    help="p_idle = frac * p (0 = no idle locations)")
    ap.add_argument("--shots", type=int, default=1 << 15)
    ap.add_argument("--chunk", type=int, default=1 << 13)
    args = ap.parse_args()

    if args.code == "steane":
        code = families.steane()
    elif args.code == "surface3":
        code = families.rotated_surface(3, max_table_weight=1)
    else:
        code = families.triangular_color(3)

    prog = Program()
    ro = prog.declare("ro", 1)
    prog.x(0)
    prog.measure(0, ro[0])

    for p in args.p:
        noise = NoiseModel(p_gate1=p, p_gate2=p, p_meas=p, p_reset=p,
                           p_idle=args.p_idle_frac * p)
        for mode in ("steane", "flag"):
            enc = rewrite_program(prog, code, noise=noise, tableau="frames",
                                  ec_mode=mode)
            enc.run(args.chunk, key=jax.random.key(99))
            enc.run(args.chunk, key=jax.random.key(98))
            fails = 0
            t0 = time.perf_counter()
            for i in range(args.shots // args.chunk):
                res = enc.run(args.chunk, key=jax.random.key(500 + i))
                fails += int((np.asarray(res["ro"][:, 0]) != 1).sum())
            dt = time.perf_counter() - t0
            shots = (args.shots // args.chunk) * args.chunk
            print(json.dumps({
                "bench": "flag_vs_steane_ec",
                "code": args.code,
                "ec_mode": mode,
                "p": p,
                "p_idle": args.p_idle_frac * p,
                "anc_qubits_per_ec": 2 if mode == "flag" else 2 * code.n,
                "shots": shots,
                "fails": fails,
                "fail_rate": fails / shots,
                "shots_per_sec": round(shots / dt),
            }), flush=True)


if __name__ == "__main__":
    main()
