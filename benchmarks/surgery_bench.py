"""Lattice-surgery benchmark: merge, cycle, logical CNOT, and T gadget.

Sweeps distance (and optionally p) for the surgery experiments
(`experiments.surgery`, `experiments.surgery_t`) and prints one JSON
line per point — failure rates of the joint measurement and the
preserved/output logicals, plus model sizes and wall time. The
reference has no multi-patch machinery of any kind (its scope is one
code block, reference: ftqc.py:42-120).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from qcss_tpu.experiments.surgery import (  # noqa: E402
    surgery_cnot_memory,
    xx_merge_memory,
    xx_merge_split_memory,
)
from qcss_tpu.experiments.patches import parity_chain_memory  # noqa: E402
from qcss_tpu.experiments.surgery_t import t_gadget_memory  # noqa: E402

def _compiled_cnot(d, p, q=None, *, batch=1 << 13, seed=0, weighted=False):
    from qcss_tpu.experiments.logical import LogicalProgram

    return LogicalProgram(d, 2).cnot(0, 1).run(
        p, q, batch=batch, seed=seed, weighted=weighted)


def _compiled_cnot_device(d, p, q=None, *, batch=1 << 13, seed=0,
                          weighted=False):
    """The fused on-device form: sample + UF decode + count in ONE
    compiled program, 4 timed reps after a warm-up rep (host-fenced)."""
    from qcss_tpu.experiments.logical import LogicalProgram

    prog = LogicalProgram(d, 2).cnot(0, 1)
    prog.run(p, q, batch=batch, seed=seed, weighted=weighted,
             decoder="device-uf", reps=1)          # compile + warm
    t0 = time.perf_counter()
    out = prog.run(p, q, batch=batch, seed=seed + 1, weighted=weighted,
                   decoder="device-uf", reps=4)
    dt = time.perf_counter() - t0
    out["shots_per_sec"] = round(out["samples"] / dt)
    return out


def _compiled_program(d, p, q=None, *, batch=1 << 13, seed=0,
                      weighted=False):
    """A 3-qubit logical program: CNOT(0,1); T(1); CNOT(1,2) — every op
    the compiler supports, routed over one grid."""
    from qcss_tpu.experiments.logical import LogicalProgram

    return LogicalProgram(d, 3).cnot(0, 1).t(1).cnot(1, 2).run(
        p, q, batch=batch, seed=seed, weighted=weighted)


def _circuit_cnot(d, p, q=None, *, batch=1 << 12, seed=0,
                  weighted=False):
    """Compiled CNOT at CIRCUIT-LEVEL noise: real two-sector extraction
    circuits, BP(+OSD) on the circuit fault Tanner graph (q ignored —
    uniform p on gate/meas/reset locations)."""
    from qcss_tpu.experiments.logical import LogicalProgram
    from qcss_tpu.sim.noise import NoiseModel

    noise = NoiseModel(p_gate1=p, p_gate2=p, p_meas=p, p_reset=p)
    return LogicalProgram(d, 2).cnot(0, 1).run_circuit(
        noise, batch=batch, seed=seed)


def _circuit_program(d, p, q=None, *, batch=1 << 12, seed=0,
                     weighted=False):
    """CNOT(0,1); T(1); CNOT(1,2) at circuit-level noise."""
    from qcss_tpu.experiments.logical import LogicalProgram
    from qcss_tpu.sim.noise import NoiseModel

    noise = NoiseModel(p_gate1=p, p_gate2=p, p_meas=p, p_reset=p)
    return LogicalProgram(d, 3).cnot(0, 1).t(1).cnot(1, 2).run_circuit(
        noise, batch=batch, seed=seed)


EXPERIMENTS = {
    "merge": xx_merge_memory,
    "cycle": xx_merge_split_memory,
    "cnot": surgery_cnot_memory,
    "tgadget": t_gadget_memory,
    "chain": parity_chain_memory,
    "compiled-cnot": _compiled_cnot,
    "compiled-cnot-device": _compiled_cnot_device,
    "compiled-program": _compiled_program,
    "circuit-cnot": _circuit_cnot,
    "circuit-program": _circuit_program,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--experiments", default="merge,cycle,cnot")
    ap.add_argument("--distances", default="3,5,7")
    ap.add_argument("--p", type=float, default=3e-3)
    ap.add_argument("--q", type=float, default=None)
    ap.add_argument("--batch", type=int, default=1 << 15)
    ap.add_argument("--weighted", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    for name in args.experiments.split(","):
        fn = EXPERIMENTS[name]
        for d in (int(x) for x in args.distances.split(",")):
            t0 = time.perf_counter()
            out = fn(d, args.p, args.q, batch=args.batch, seed=args.seed,
                     weighted=args.weighted)
            out.update({"bench": f"surgery_{name}",
                        "wall_sec": round(time.perf_counter() - t0, 2)})
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
