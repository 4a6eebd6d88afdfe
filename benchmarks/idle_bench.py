"""Idle-noise ancilla-schedule comparison (round 3, VERDICT task 2/3).

The reference warns that its shared EC ancillas "limit parallelism, which
significantly reduces fault tolerance" (reference: ftqc.py:156-160) but
cannot measure the cost — its noise model has no idle locations. This
harness measures it: the same multi-block program under idle noise, run
with

  * ancillas='shared'                      (the reference's layout)
  * ancillas='dedicated'                   (own pair per block, EC still
                                            serialized block-by-block)
  * ancillas='dedicated' ec_schedule='parallel'
                                           (all blocks' EC rounds at once)

Prints one JSON line per configuration. With p_idle = 0 all three agree
statistically (dedicated ancillas are freshly verified per use); with
idle noise on, waiting blocks decohere through their neighbors' EC and
the serialized schedules fall behind.
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
    ap.add_argument("--p-gate2", type=float, default=3e-4)
    ap.add_argument("--p-idle", type=float, default=3e-4)
    ap.add_argument("--blocks", type=int, default=2)
    ap.add_argument("--shots", type=int, default=1 << 15)
    ap.add_argument("--chunk", type=int, default=1 << 13)
    ap.add_argument("--decoherence", action="store_true",
                    help="use Pauli-twirled T1/T2 decoherence "
                         "(--t1/--t2/--ro/--idle-time) instead of flat "
                         "p_gate2/p_idle rates")
    ap.add_argument("--t1", type=float, default=100e-6)
    ap.add_argument("--t2", type=float, default=100e-6)
    ap.add_argument("--ro", type=float, default=0.995)
    ap.add_argument("--idle-time", type=float, default=150e-9)
    args = ap.parse_args()

    code = families.steane()
    prog = Program()
    ro = prog.declare("ro", args.blocks)
    for b in range(args.blocks):
        prog.x(b)
    for b in range(args.blocks):
        prog.measure(b, ro[b])
    if args.decoherence:
        noise = NoiseModel.from_decoherence(
            args.t1, args.t2, ro_fidelity=args.ro,
            idle_time=args.idle_time)
    else:
        noise = NoiseModel(p_gate2=args.p_gate2, p_idle=args.p_idle)

    configs = [
        ("shared", "serial"),
        ("dedicated", "serial"),
        ("dedicated", "parallel"),
    ]
    for ancillas, sched in configs:
        enc = rewrite_program(prog, code, noise=noise, tableau="frames",
                              ancillas=ancillas, ec_schedule=sched)
        enc.run(args.chunk, key=jax.random.key(99))
        enc.run(args.chunk, key=jax.random.key(98))
        fails = 0
        t0 = time.perf_counter()
        for i in range(args.shots // args.chunk):
            res = enc.run(args.chunk, key=jax.random.key(500 + i))
            fails += int(
                (np.asarray(res["ro"]) != 1).any(axis=1).sum())
        dt = time.perf_counter() - t0
        shots = (args.shots // args.chunk) * args.chunk
        print(json.dumps({
            "bench": ("idle_schedule_decoherence" if args.decoherence
                      else "idle_schedule"),
            "ancillas": ancillas,
            "ec_schedule": sched,
            "blocks": args.blocks,
            "p_gate2": noise.p_gate2 if args.decoherence else args.p_gate2,
            "p_idle": noise.p_idle if args.decoherence else args.p_idle,
            "shots": shots,
            "fails": fails,
            "fail_rate": fails / shots,
            "shots_per_sec": round(shots / dt),
        }), flush=True)


if __name__ == "__main__":
    main()
