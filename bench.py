"""Headline benchmark: batched Monte-Carlo syndrome decode throughput.

Runs the fused sample → syndrome-extract → LUT-decode → logical-check
pipeline for the Steane [[7,1,3]] code on the attached TPU chip and prints
ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the BASELINE.md north-star target of 1e6 noise samples decoded
per second per chip (the reference itself publishes no numbers; its
fidelity harness pushes 1e5 QVM shots through an external simulator process
and prints wall time — reference: test/test_fidelity.py:38-46).
"""

import json
import time

import jax

from qcss_tpu.codes import families
from qcss_tpu.decode.montecarlo import mc_decode_rounds

BASELINE_SAMPLES_PER_SEC = 1.0e6  # BASELINE.md target for v5e
BATCH = 1 << 22
ROUNDS = 64
P_PHYS = 0.01


def main():
    code = families.steane()
    key = jax.random.key(0)

    def run_once(seed: int) -> int:
        out = mc_decode_rounds(code, jax.random.key(seed), BATCH, ROUNDS, P_PHYS)
        # Materialize on host: on the axon tunnel backend block_until_ready
        # does not reliably synchronize, so int() is the only honest fence.
        return int(out["word_fail"])

    # Warm-up / compile (two calls: the first post-compile execution can
    # return stale values near-instantly on this backend).
    run_once(100)
    run_once(101)

    reps = 3
    start = time.perf_counter()
    total_fails = sum(run_once(i + 1) for i in range(reps))
    elapsed = time.perf_counter() - start
    assert total_fails > 0

    samples_per_sec = reps * ROUNDS * BATCH / elapsed
    print(json.dumps({
        "metric": "steane_mc_decode_throughput",
        "value": round(samples_per_sec),
        "unit": "samples/sec/chip",
        "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
