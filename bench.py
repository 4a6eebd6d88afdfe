"""Headline benchmark: the framework's driver-captured frontier.

Prints ONE JSON line. The headline metric stays the round-1 fused
Steane Monte-Carlo decode (continuity across rounds: BENCH_r0{1,2,3}
all record it; baseline = the BASELINE.md north-star of 1e6 decoded
samples/s/chip — the reference publishes no numbers, its fidelity
harness pushes 1e5 QVM shots through an external simulator process and
prints wall time, reference: test/test_fidelity.py:38-46). The round-4
frontier rides along in "extras":

  d11_fused_sparse_shots_per_sec — surface d=11 R=11 circuit-level DEM
      sample + defect-granular UF decode fused in one device program
      (decode/device_sparse.py, hybrid: the dense kernel rescues the
      rare >d_max-defect shot), operating noise. Host single-core
      anchor: 88.8k/s (BASELINE.md).
  d11_stream_round_shots_per_sec — unbounded-round streaming memory,
      sample + sliding-window UF decode on device, steady state.
  compiled_cnot_sparse_shots_per_sec — the compiled logical CNOT
      (surgery schedule) end-to-end on the sparse device pipeline.

Every extra is best-effort: a failure records the exception string
instead of killing the headline.

TPU timing discipline (CLAUDE.md): host-fence every rep via int(),
double warm-up, one TPU process at a time.
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


def bench_steane() -> float:
    code = families.steane()

    def run_once(seed: int) -> int:
        out = mc_decode_rounds(code, jax.random.key(seed), BATCH, ROUNDS,
                               P_PHYS)
        # Materialize on host: on the axon tunnel backend
        # block_until_ready does not reliably synchronize, so int() is
        # the only honest fence.
        return int(out["word_fail"])

    run_once(100)
    run_once(101)
    reps = 3
    start = time.perf_counter()
    total_fails = sum(run_once(i + 1) for i in range(reps))
    elapsed = time.perf_counter() - start
    assert total_fails > 0
    return reps * ROUNDS * BATCH / elapsed


def bench_d11_fused_sparse(decoder: str = "sparse") -> float:
    """Fused sample + sparse-UF decode, d=11 R=11 DEM at operating noise.

    decoder='sparse' is the BASELINE.md row's configuration (pure
    defect-granular path; shots s.t. defects > d_max report
    non-converged and would abort — none do at this noise in the
    benchmark keys). decoder='hybrid' additionally runs the dense
    rescue kernel under `lax.cond` whenever some shot overflows —
    round-4's BENCH vs BASELINE gap (98k vs 119k) traced to exactly
    that: the rescue fires on a minority of rep-batches and those
    trials measure 100-140k instead of ~168k, so the hybrid number is
    bimodal. Both are reported; the median of 3 timed trials makes
    each stable."""
    import jax.numpy as jnp

    from benchmarks.device_uf_bench import build_pipeline
    from qcss_tpu.codes.families import rotated_surface
    from qcss_tpu.sim.noise import NoiseModel

    B = 1 << 14
    code = rotated_surface(11)
    noise = NoiseModel(p_gate2=2e-3, p_meas=1e-2)
    _, _, fused_j, _ = build_pipeline(code, 11, noise, "dem",
                                      decoder=decoder, d_max=48)
    REPS = 4

    @jax.jit
    def run_reps(key0):
        # reps fused ON DEVICE: per-rep int() fences over the tunnel
        # cost ~0.2 s each and halved the measured rate
        def body(r, acc):
            f, conv = fused_j(jax.random.fold_in(key0, r), B, 11)
            return acc[0] + f, acc[1] & conv
        return jax.lax.fori_loop(
            0, REPS, body, (jnp.int32(0), jnp.bool_(True)))

    f, conv = run_reps(jax.random.key(0))
    int(f)
    f, conv = run_reps(jax.random.key(2))
    int(f)
    rates = []
    for trial in range(3):
        t0 = time.perf_counter()
        f, conv = run_reps(jax.random.key(10 + trial))
        int(f)
        rates.append(REPS * B / (time.perf_counter() - t0))
    # pure-sparse may report conv=False on a rare >d_max-defect shot
    # (the hybrid row is the accuracy-complete config); the throughput
    # number is valid either way
    return sorted(rates)[1]


def bench_d11_fused_hybrid() -> float:
    return bench_d11_fused_sparse(decoder="hybrid")


def bench_d11_stream() -> float:
    """Streaming memory steady-state round-shots/s at d=11."""
    from qcss_tpu.codes.families import rotated_surface
    from qcss_tpu.decode.device_streaming import stream_memory_rate

    code = rotated_surface(11)
    B, R = 1 << 13, 800
    # warm: compiles the sampling chunk, mid-window and final-window paths
    stream_memory_rate(code.raw_parity_check_c2, code.z_operator_matrix(),
                       0.004, 0.004, rounds=16, batch=B)
    t0 = time.perf_counter()
    stream_memory_rate(code.raw_parity_check_c2, code.z_operator_matrix(),
                       0.004, 0.004, rounds=R, batch=B, seed=1)
    return R * B / (time.perf_counter() - t0)


def bench_compiled_cnot_sparse() -> float:
    """Compiled logical CNOT, fused device pipeline, sparse decoder."""
    from qcss_tpu.experiments.logical import LogicalProgram

    B = 1 << 15
    prog = LogicalProgram(3, 2).cnot(0, 1)
    # warm with the SAME reps (the fused runner is static in reps)
    prog.run(2e-3, batch=B, seed=0, decoder="device-uf-sparse", reps=4)
    t0 = time.perf_counter()
    out = prog.run(2e-3, batch=B, seed=1, decoder="device-uf-sparse",
                   reps=4)
    return out["samples"] / (time.perf_counter() - t0)


def main():
    extras = {}
    for name, fn in (
        ("d11_fused_sparse_shots_per_sec", bench_d11_fused_sparse),
        ("d11_fused_hybrid_shots_per_sec", bench_d11_fused_hybrid),
        ("d11_stream_round_shots_per_sec", bench_d11_stream),
        ("compiled_cnot_sparse_shots_per_sec", bench_compiled_cnot_sparse),
    ):
        try:
            extras[name] = round(fn())
        except Exception as e:  # pragma: no cover - best-effort extras
            extras[name] = f"error: {type(e).__name__}: {e}"

    samples_per_sec = bench_steane()
    print(json.dumps({
        "metric": "steane_mc_decode_throughput",
        "value": round(samples_per_sec),
        "unit": "samples/sec/chip",
        "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 3),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
