"""Circuit-level qLDPC memory experiment: BB / hypergraph-product codes
under full extraction-circuit noise, decoded with circuit-level BP(+OSD).

The schedule and frame sampling are `experiments.memory_xz`'s (both check
sectors extracted every round), run over the code's FULL redundant check
sets — what hardware actually measures, and free information for BP. The
decoder is `decode.bp_dem.circuit_bp_decoder`: every fault mechanism of
the extraction circuit (two-qubit depolarizing on each CNOT, measurement
and reset flips) is an exact Tanner variable with its propagated detector
signature — ancilla hooks that fan into several data qubits stay intact
instead of being decomposed into matching edges.

All k logical qubits are scored (word failure = any of the 2k observables
wrong). No reference analogue: the reference is k=1-only and decodes one
noisy extraction with a LUT (reference: css_code.py:334-339, 649-685)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from qcss_tpu.decode.bp_dem import circuit_bp_decoder
from qcss_tpu.decode.spacetime import detector_history
from qcss_tpu.experiments.memory import x_extraction_circuit, z_extraction_circuit
from qcss_tpu.experiments.memory_xz import _sample_two_sector
from qcss_tpu.sim import frame as fr
from qcss_tpu.sim import noise as noise_mod


def qldpc_memory_experiment(code, *, rounds: int,
                            noise: noise_mod.NoiseModel,
                            batch: int = 1 << 12, seed: int = 0,
                            iters: int = 64, alpha: float = 0.8,
                            osd: bool = True,
                            sectors: str = "both") -> dict[str, float]:
    """Run the two-sector circuit-level memory and decode each sector
    with circuit-level BP. `sectors='z'` decodes X errors only (faster;
    the Z-basis memory), `'both'` adds Z errors and word failure."""
    hz = np.asarray(getattr(code, "redundant_parity_check_c2",
                            code.raw_parity_check_c2), np.uint8) & 1
    hx = np.asarray(getattr(code, "redundant_parity_check_c1",
                            code.raw_parity_check_c1), np.uint8) & 1
    rz, rx = hz.shape[0], hx.shape[0]
    lz = np.asarray(code.z_operator_matrix(), np.uint8) & 1
    lx = np.asarray(code.x_operator_matrix(), np.uint8) & 1
    n = code.n

    z_arrays = tuple(map(jnp.asarray, z_extraction_circuit(
        code, checks=hz).to_arrays()))
    x_arrays = tuple(map(jnp.asarray, x_extraction_circuit(
        code, anc_offset=n + rz, checks=hx).to_arrays()))
    nq = n + rz + rx
    z_comp = fr.maybe_compile(z_arrays, nq)
    x_comp = fr.maybe_compile(x_arrays, nq)

    fn = jax.jit(
        partial(_sample_two_sector, code=code, noise=noise,
                z_arrays=z_arrays, x_arrays=x_arrays,
                z_comp=z_comp, x_comp=x_comp, rz=rz, rx=rx),
        static_argnames=("batch", "rounds"),
    )
    syns_z, syns_x, x_err, z_err = fn(jax.random.key(seed), batch, rounds)
    syns_z, syns_x = np.asarray(syns_z), np.asarray(syns_x)
    x_err, z_err = np.asarray(x_err), np.asarray(z_err)

    final_z = ((x_err.astype(np.int64) @ hz.T) & 1).astype(np.uint8)
    dets_z = detector_history(syns_z, final_z)

    dec_z = circuit_bp_decoder(code, rounds, noise, sector="z",
                               iters=iters, alpha=alpha, osd=osd,
                               hz=hz, hx=hx)
    flips_x, conv_z = dec_z.decode_obs(dets_z.reshape(batch, -1))
    par_x = (x_err.astype(np.int64) @ lz.T.astype(np.int64)) & 1
    xf = (flips_x ^ par_x).any(axis=1)
    out = {
        "x_fail": float(xf.mean()),
        "bp_converged_z": float(np.asarray(conv_z).mean()),
        "samples": batch,
        "rounds": rounds,
        "faults_z": dec_z.n,
    }
    if sectors == "both":
        final_x = ((z_err.astype(np.int64) @ hx.T) & 1).astype(np.uint8)
        dets_x = detector_history(syns_x, final_x)
        dec_x = circuit_bp_decoder(code, rounds, noise, sector="x",
                                   iters=iters, alpha=alpha, osd=osd,
                                   hz=hz, hx=hx)
        flips_z, conv_x = dec_x.decode_obs(dets_x.reshape(batch, -1))
        par_z = (z_err.astype(np.int64) @ lx.T.astype(np.int64)) & 1
        zf = (flips_z ^ par_z).any(axis=1)
        out.update({
            "z_fail": float(zf.mean()),
            "word_fail": float((xf | zf).mean()),
            "bp_converged_x": float(np.asarray(conv_x).mean()),
        })
    return out
