"""Circuit-level quantum-memory experiment (logical Z memory).

The standard QEC benchmark the reference has no analogue of: hold a logical
|0̄⟩ for R rounds, each round running the *actual* syndrome-extraction
circuit (one ancilla per Z-type check, transversal CNOTs data→ancilla,
ancilla measurement + reset) under circuit-level Pauli noise, then read the
data out and decode.

Five decoders, weakest to strongest:

* ``'vote'`` — temporal majority per syndrome bit, one LUT decode. Sound
  only while at most one data error occurs across the whole experiment.
* ``'difference'`` — per-round detection events decoded independently,
  corrections XORed. Handles accumulating data errors but mis-pairs a data
  error coinciding with a measurement error.
* ``'stlut'`` — minimum-weight decode over the full SPACETIME fault set
  (`decode.spacetime`), evaluated on device as one gather. The proper
  detector-history decoder for small codes (incl. non-matchable ones like
  Steane) while (R+1)·r detector bits stay LUT-sized.
* ``'uf'`` — union-find on the 3D phenomenological spacetime graph
  (`decode.uf.spacetime_graph`), host-native; matchable codes (surface,
  toric, repetition) at any distance and round count.
* ``'dem'`` — union-find on the CIRCUIT-LEVEL detector error model
  (`decode.dem`): exact single-fault enumeration of the extraction
  circuit, with diagonal (hook) edges and -log-likelihood weights.
  Dominates 'uf' on the real circuit (13x at d=3, p_gate2=2e-3,
  p_meas=1e-2).
* ``'mwpm'`` / ``'dem-mwpm'`` — exact minimum-weight perfect matching
  (`decode.mwpm`, blossom) on the phenomenological / DEM graph: the
  accuracy ceiling of matching-based decoding, at host-Python speed.

Only X-type data errors matter for a Z-basis memory (Z errors commute with
the readout), so only the Z-check sector is extracted. The X-basis mirror
(hold |+̄⟩, extract X checks via H-sandwich ancillas, decode Z errors,
read out X̄ after a noiseless transversal H) is `memory_experiment(
basis='x')` — both engines, all seven decoders.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from qcss_tpu.circuits.ir import Circuit
from qcss_tpu.decode.lut import decode_corrections
from qcss_tpu.decode.multiround import vote_syndromes
from qcss_tpu.decode.spacetime import detector_history, spacetime_correction_lut
from qcss_tpu.ops import gf2_jax
from qcss_tpu.sim import noise as noise_mod
from qcss_tpu.sim import tableau as tb


def z_extraction_circuit(code, data_offset: int = 0, anc_offset: int | None = None,
                         checks: np.ndarray | None = None) -> Circuit:
    """One round of Z-check syndrome extraction: CNOT(data_j -> anc_i) for
    every 1 in row i of the Z-check matrix (ancilla i measures stabilizer
    Z-row i when read in the Z basis after the CNOT fan-in).

    ``checks`` defaults to the standard-form matrix (LUT decoders key on
    it); the union-find path passes ``code.raw_parity_check_c2`` because
    matching needs the local, pre-row-reduction stabilizers."""
    checks = code.parity_check_c2 if checks is None else np.asarray(checks)
    n = code.n
    anc_offset = n if anc_offset is None else anc_offset
    circ = Circuit()
    for i in range(checks.shape[0]):
        for j in np.nonzero(checks[i])[0]:
            circ.cnot(data_offset + int(j), anc_offset + i)
    return circ


def x_extraction_circuit(code, data_offset: int = 0, anc_offset: int | None = None,
                         checks: np.ndarray | None = None) -> Circuit:
    """One round of X-check syndrome extraction, the mirror of
    `z_extraction_circuit`: H(anc_i); CNOT(anc_i -> data_j) fan-out;
    H(anc_i) — ancilla i then Z-measures stabilizer X-row i. The CNOT
    order matches `decode.dem.extraction_gate_list` (Z errors on data
    propagate target→control into the ancilla with the same incidence and
    timing structure as X errors do in the Z-sector circuit, so the DEM
    enumeration applies unchanged)."""
    checks = code.parity_check_c1 if checks is None else np.asarray(checks)
    n = code.n
    anc_offset = n if anc_offset is None else anc_offset
    circ = Circuit()
    for i in range(checks.shape[0]):
        circ.h(anc_offset + i)
    for i in range(checks.shape[0]):
        for j in np.nonzero(checks[i])[0]:
            circ.cnot(anc_offset + i, data_offset + int(j))
    for i in range(checks.shape[0]):
        circ.h(anc_offset + i)
    return circ


def _memory_circuit_frames(key, batch, rounds, code, noise, extract_arrays,
                           n_anc, final_arrays=None, extract_comp=None):
    """Pauli-frame fast path (`sim.frame`): the noiseless reference of this
    circuit is deterministic (every ancilla measures a stabilizer of the
    prepared eigenstate → outcome 0; the final data word is pinned to the
    zero codeword, indistinguishable by any syndrome/logical statistic),
    so only per-sample fault frames propagate — >100x the tableau engine.
    Same per-round key split as `_memory_circuit`; the collapse subkey is
    unused (deterministic reference has no measurement randomness)."""
    from qcss_tpu.sim import frame as fr

    n = code.n
    anc = jnp.arange(n, n + n_anc, dtype=jnp.int32)
    data = jnp.arange(n, dtype=jnp.int32)
    f = fr.zero_frames(batch, n + n_anc)

    def round_body(carry, k):
        f = carry
        k1, _k2, k3, k4 = jax.random.split(k, 4)
        if extract_comp is not None:
            # matrix form: bit-identical to the scan on the same key
            f = fr.run_compiled_noisy(f, extract_comp, noise, k1)
        else:
            f = fr.run_arrays_noisy(f, *extract_arrays, noise, k1)
        f, syn = fr.measure_deviations(f, anc, k3, noise.p_meas)
        f = fr.reset_qubits(f, anc, k4, noise.p_reset)
        return f, syn

    keys = jax.random.split(key, rounds + 1)
    f, syns = jax.lax.scan(round_body, f, keys[:rounds])  # [R, B, n_anc]
    if final_arrays is not None:
        # noiseless basis rotation before the perfect readout
        # (transversal H for an X-basis memory)
        f = fr.propagate_arrays(f, *final_arrays)
    _, word = fr.measure_deviations(f, data)
    return syns, word


def _memory_circuit(key, batch, rounds, code, noise, prep_arrays,
                    extract_arrays, n_anc, final_arrays=None):
    """The physics: noiseless eigenstate prep, R noisy extraction rounds,
    perfect final readout (preceded by a noiseless basis rotation when
    ``final_arrays`` is given). Returns (syns [R, B, n_anc], word [B, n])."""
    n = code.n
    n_qubits = n + n_anc
    anc = jnp.arange(n, n + n_anc, dtype=jnp.int32)
    data = jnp.arange(n, dtype=jnp.int32)

    t = tb.zero_state(batch, n_qubits)
    # Noiseless logical |0̄⟩ preparation (the experiment measures memory
    # fidelity, not preparation fidelity).
    t = tb.run_circuit_scanned(t, *prep_arrays)

    def round_body(carry, k):
        t = carry
        # Four independent subkeys (circuit noise / measurement / readout
        # flips / ancilla reset) — re-splitting one of them would alias
        # threefry streams between consumers.
        k1, k2, k3, k4 = jax.random.split(k, 4)
        t = noise_mod.run_arrays_noisy(t, *extract_arrays, noise, k1)
        t, syn = tb.measure_many(t, anc, k2)
        if noise.p_meas:
            syn = noise_mod.flip_bits(syn, noise.p_meas, k3)
        t = tb.reset_many(t, anc, k4)
        if noise.p_reset:
            # Same bernoulli draw (key, shape) as the frame path's
            # `reset_qubits(..., p_reset)` — engine bit-identity. k4 also
            # fed reset_many's collapse draws, but every measurement in
            # this circuit is deterministic, so that stream is unused.
            xf = jax.random.bernoulli(
                k4, noise.p_reset, (batch, n_anc)).astype(jnp.uint8)
            x_full = jnp.zeros((batch, n_qubits), jnp.uint8).at[:, anc].set(xf)
            t = tb.apply_pauli_frame(
                t, x_full, jnp.zeros((batch, n_qubits), jnp.uint8))
        return t, syn

    keys = jax.random.split(key, rounds + 1)
    t, syns = jax.lax.scan(round_body, t, keys[:rounds])  # [R, B, n_anc]

    # Perfect readout round (with noiseless basis rotation if requested).
    if final_arrays is not None:
        t = tb.run_circuit_scanned(t, *final_arrays)
    t, word = tb.measure_many(t, data, keys[rounds])  # [B, n]
    return syns, word


def _decode_vote(syns, word, lut, h_std):
    """Temporal-majority decoding: vote each syndrome bit across rounds,
    one LUT decode. Sound for at most one data error over the experiment."""
    voted = vote_syndromes(syns)
    return decode_corrections(voted, lut)


def _decode_difference(syns, word, lut, h_std):
    """Difference-syndrome decoding: decode each round's NEW detection
    events (syn[r] ^ syn[r-1]) independently and XOR the corrections.

    A data error arising in round r appears in exactly one difference and
    is corrected once; a measurement error at round r flips differences r
    and r+1, so its two (identical, deterministic-LUT) corrections cancel
    under XOR. The final readout supplies the exact end syndrome, closing
    the last difference window. The phenomenological scheme the temporal
    vote approximates only for static errors; dominated by 'stlut'/'uf'.
    """
    rounds = syns.shape[0]
    prev = jnp.zeros_like(syns[0])
    corr = jnp.zeros((word.shape[0], word.shape[1]), jnp.uint8)
    for r in range(rounds):  # static unroll; rounds is small
        diff = syns[r] ^ prev
        corr = corr ^ decode_corrections(diff, lut)
        prev = syns[r]
    final_syn = gf2_jax.syndromes_dense(word, h_std)
    corr = corr ^ decode_corrections(final_syn ^ prev, lut)
    return corr


_DEVICE_DECODERS = ("vote", "difference", "stlut")
_FUSED_DECODERS = ("device-uf", "device-dem")
_DECODERS = _DEVICE_DECODERS + ("uf", "dem", "mwpm", "dem-mwpm") + _FUSED_DECODERS


def _count_failures(word, corr, code, basis: str = "z"):
    """Shared logical/residual accounting; works on jax or numpy arrays.
    For basis='x' the readout word is the post-H (X-basis) data word, so
    the observable is X̄ and the residual check matrix is the C1 sector."""
    dev = code.device
    corrected = word ^ corr
    log_row = dev.logical_z[0] if basis == "z" else dev.logical_x[0]
    raw = (code.raw_parity_check_c2 if basis == "z"
           else code.raw_parity_check_c1)
    h_std = dev.h2 if basis == "z" else dev.h1
    if isinstance(word, np.ndarray):
        log_row = np.asarray(log_row)
    outcome = (corrected.astype("int32") * log_row.astype("int32")).sum(axis=-1) & 1
    if isinstance(word, np.ndarray):
        resid = (corrected.astype(np.int64) @ np.asarray(raw).T.astype(np.int64)) & 1
        return {
            "logical_fail": int(outcome.sum()),
            "residual_syndrome": int((resid == 1).any(axis=-1).sum()),
        }
    resid = gf2_jax.syndromes_dense(corrected, h_std)
    return {
        "logical_fail": jnp.sum(outcome.astype(jnp.int32), dtype=jnp.int32),
        "residual_syndrome": jnp.sum(jnp.any(resid == 1, axis=-1), dtype=jnp.int32),
    }


def _memory_fused_device(key, batch, rounds, code, noise, extract_arrays,
                         n_anc, decode_fn, log_row, raw_j, engine="frames",
                         prep_arrays=None, final_arrays=None,
                         extract_comp=None):
    """Sample AND decode in one compiled device program (decoder='device-*'):
    circuit sampling, detector assembly, batched union-find
    (`decode.device_uf`), and failure counting all fuse into a single jit
    — only two scalars cross the host boundary. This is the architectural
    inversion the reference performs with Quil classical instructions
    executed inside the QVM (reference: css_code.py:649-685), completed
    for matching decoders on the accelerator."""
    if engine == "frames":
        syns, word = _memory_circuit_frames(
            key, batch, rounds, code, noise, extract_arrays, n_anc=n_anc,
            final_arrays=final_arrays, extract_comp=extract_comp)
    else:
        syns, word = _memory_circuit(
            key, batch, rounds, code, noise, prep_arrays, extract_arrays,
            n_anc=n_anc, final_arrays=final_arrays)
    final_syn = gf2_jax.syndromes_dense(word, raw_j)
    dets = detector_history(syns, final_syn)
    obs, conv = decode_fn(dets)
    outcome = (word.astype(jnp.int32) * log_row.astype(jnp.int32)
               ).sum(axis=-1) & 1
    fails = (outcome ^ (obs & 1)).astype(jnp.int32)
    return jnp.sum(fails), jnp.all(conv)


def _memory_body(key, batch, rounds, code, noise, prep_arrays, extract_arrays,
                 decoder="vote", stlut=None, engine="tableau", basis="z",
                 final_arrays=None, extract_comp=None):
    dev = code.device
    lut = dev.lut_c2 if basis == "z" else dev.lut_c1
    h_std = dev.h2 if basis == "z" else dev.h1
    n_anc = (code.parity_check_c2 if basis == "z"
             else code.parity_check_c1).shape[0]
    if engine == "frames":
        syns, word = _memory_circuit_frames(
            key, batch, rounds, code, noise, extract_arrays, n_anc=n_anc,
            final_arrays=final_arrays, extract_comp=extract_comp)
    else:
        syns, word = _memory_circuit(
            key, batch, rounds, code, noise, prep_arrays, extract_arrays,
            n_anc=n_anc, final_arrays=final_arrays,
        )
    if decoder == "stlut":
        final_syn = gf2_jax.syndromes_dense(word, h_std)
        dets = detector_history(syns, final_syn)
        corr = jnp.take(stlut, gf2_jax.bits_to_index(dets), axis=0)
    else:
        corr = {"vote": _decode_vote, "difference": _decode_difference}[decoder](
            syns, word, lut, h_std
        )
    return _count_failures(word, corr, code, basis)


def memory_experiment(code, *, rounds: int, noise: noise_mod.NoiseModel,
                      basis: str = "z",
                      batch: int = 1 << 12, seed: int = 0,
                      decoder: str = "vote",
                      stlut_max_weight: int = 4,
                      n_threads: int | None = None,
                      engine: str = "tableau") -> dict[str, float]:
    """Run the logical memory experiment in the given basis.

    basis='z': hold |0̄⟩, extract Z checks, decode X data errors (the
    default; `z_memory_experiment` is the compatibility alias).
    basis='x': the mirror — hold |+̄⟩, extract X checks via
    H-sandwich ancillas (`x_extraction_circuit`), decode Z data errors,
    read out X̄ after a noiseless transversal H.

    Measured (Steane, p_gate2=1e-3, p_meas=1e-2, 3 rounds, 2^14 shots):
    vote 0.59%, difference 0.94%, stlut dominates both (see
    tests/test_memory_experiment.py and benchmarks/memory_bench.py).
    For surface codes at scale use decoder='uf' (any distance/rounds).

    ``engine='frames'`` samples via Pauli-frame propagation (`sim.frame`)
    instead of the batched tableau — statistically identical (the circuit
    has a deterministic noiseless reference; single-fault equivalence is
    tested against the DEM enumeration) and >100x faster, enabling
    10^6+-shot points.
    """
    if noise.p_idle:
        raise ValueError(
            "memory_experiment does not model idle noise (p_idle would be "
            "silently ignored); use the two-sector pipelines "
            "(experiments.memory_xz / memory_qldpc), which sample AND "
            "decode per-round data idle")
    if decoder not in _DECODERS:
        raise ValueError(f"unknown decoder {decoder!r}")
    if engine not in ("tableau", "frames"):
        raise ValueError(f"unknown engine {engine!r}")
    if basis not in ("z", "x"):
        raise ValueError(f"unknown basis {basis!r}")
    if decoder == "vote" and rounds % 2 == 0:
        raise ValueError("rounds must be odd for the temporal vote")
    # Materialize the cached device arrays OUTSIDE any jit trace — building
    # them inside a trace turns the cached constants into tracers.
    dev = code.device
    lut = dev.lut_c2 if basis == "z" else dev.lut_c1
    raw = (code.raw_parity_check_c2 if basis == "z"
           else code.raw_parity_check_c1)
    std_checks = code.parity_check_c2 if basis == "z" else code.parity_check_c1
    logicals = (code.z_operator_matrix() if basis == "z"
                else code.x_operator_matrix())
    prep_circ = (code.noisy_encode_zero if basis == "z"
                 else code.noisy_encode_plus)
    ext_fn = z_extraction_circuit if basis == "z" else x_extraction_circuit
    if basis == "x":
        fin = Circuit()
        for q in range(code.n):
            fin.h(q)
        final_arrays = tuple(map(jnp.asarray, fin.to_arrays()))
    else:
        final_arrays = None
    if decoder in ("vote", "difference") and lut is None:
        raise ValueError("code has no LUT for this sector; pass max_table_weight")
    prep_arrays = (
        None if engine == "frames"
        else tuple(map(jnp.asarray, prep_circ().to_arrays()))
    )

    if decoder in _FUSED_DECODERS:
        from qcss_tpu.decode.device_uf import make_obs_decoder
        from qcss_tpu.decode.uf import spacetime_graph

        extract_arrays = tuple(map(jnp.asarray, ext_fn(
            code, checks=raw).to_arrays()))
        if decoder == "device-dem":
            from qcss_tpu.decode.dem import (
                circuit_level_graph,
                extraction_gate_list,
            )

            graph = circuit_level_graph(
                raw, extraction_gate_list(code, raw), rounds,
                p_gate2=noise.p_gate2, p_meas=noise.p_meas,
                p_reset=noise.p_reset, logicals=logicals,
                rate2=noise.pauli2,
            )
        else:
            graph = spacetime_graph(raw, logicals, rounds)
        decode_fn = make_obs_decoder(graph)
        extract_comp = None
        if engine == "frames":
            from qcss_tpu.sim import frame as fr

            extract_comp = fr.maybe_compile(
                extract_arrays, code.n + raw.shape[0])
        fn = jax.jit(
            partial(_memory_fused_device, code=code, noise=noise,
                    extract_arrays=extract_arrays, n_anc=raw.shape[0],
                    decode_fn=decode_fn,
                    log_row=jnp.asarray(logicals[0], jnp.int32),
                    raw_j=jnp.asarray(raw, jnp.uint8), engine=engine,
                    prep_arrays=prep_arrays, final_arrays=final_arrays,
                    extract_comp=extract_comp),
            static_argnames=("batch", "rounds"),
        )
        fails, conv = fn(jax.random.key(seed), batch, rounds)
        if not bool(conv):
            raise RuntimeError("device union-find hit its growth cap")
        counts = {"logical_fail": int(fails),
                  "residual_syndrome": float("nan")}
    elif decoder in ("uf", "dem", "mwpm", "dem-mwpm"):
        from qcss_tpu.decode.mwpm import MWPMDecoder
        from qcss_tpu.decode.uf import UFDecoder, spacetime_graph

        extract_arrays = tuple(map(jnp.asarray, ext_fn(
            code, checks=raw).to_arrays()))
        if engine == "frames":
            from qcss_tpu.sim import frame as fr

            extract_comp = fr.maybe_compile(
                extract_arrays, code.n + raw.shape[0])
            circuit_fn = jax.jit(
                partial(_memory_circuit_frames, code=code, noise=noise,
                        extract_arrays=extract_arrays, n_anc=raw.shape[0],
                        final_arrays=final_arrays, extract_comp=extract_comp),
                static_argnames=("batch", "rounds"),
            )
        else:
            circuit_fn = jax.jit(
                partial(_memory_circuit, code=code, noise=noise,
                        prep_arrays=prep_arrays, extract_arrays=extract_arrays,
                        n_anc=raw.shape[0], final_arrays=final_arrays),
                static_argnames=("batch", "rounds"),
            )
        syns, word = circuit_fn(jax.random.key(seed), batch, rounds)
        syns, word = np.asarray(syns), np.asarray(word)
        final_syn = (word.astype(np.int64) @ raw.T.astype(np.int64)) & 1
        dets = detector_history(syns, final_syn.astype(np.uint8))
        if decoder.startswith("dem"):
            # circuit-level fault enumeration: diagonal/hook edges with
            # -log-likelihood weights from the actual extraction circuit
            from qcss_tpu.decode.dem import (
                circuit_level_graph,
                extraction_gate_list,
            )

            graph = circuit_level_graph(
                raw, extraction_gate_list(code, raw), rounds,
                p_gate2=noise.p_gate2, p_meas=noise.p_meas,
                p_reset=noise.p_reset, logicals=logicals,
                rate2=noise.pauli2,
            )
        else:
            graph = spacetime_graph(raw, logicals, rounds)
        if decoder.endswith("mwpm"):
            corr, _ = MWPMDecoder(graph).decode_batch(dets)
        else:
            corr, _ = UFDecoder(graph).decode_batch(dets, n_threads=n_threads)
        counts = _count_failures(word, corr, code, basis)
    else:
        stlut = None
        if decoder == "stlut":
            stlut = jnp.asarray(spacetime_correction_lut(
                std_checks, rounds, stlut_max_weight))
        extract_arrays = tuple(map(jnp.asarray, ext_fn(code).to_arrays()))
        extract_comp = None
        if engine == "frames":
            from qcss_tpu.sim import frame as fr

            extract_comp = fr.maybe_compile(
                extract_arrays, code.n + std_checks.shape[0])
        fn = jax.jit(
            partial(_memory_body, code=code, noise=noise,
                    prep_arrays=prep_arrays, extract_arrays=extract_arrays,
                    decoder=decoder, stlut=stlut, engine=engine, basis=basis,
                    final_arrays=final_arrays, extract_comp=extract_comp),
            static_argnames=("batch", "rounds"),
        )
        counts = fn(jax.random.key(seed), batch, rounds)
    resid = counts["residual_syndrome"]
    return {
        "logical_fail": int(counts["logical_fail"]) / batch,
        # observable-only device decoders never materialize corrections,
        # so no residual-syndrome accounting exists for them
        "residual_syndrome": (
            float("nan") if resid != resid else int(resid) / batch),
        "rounds": rounds,
        "samples": batch,
        "decoder": decoder,
        "basis": basis,
    }


def z_memory_experiment(code, **kwargs) -> dict[str, float]:
    """Back-compat alias: `memory_experiment(basis='z')`."""
    return memory_experiment(code, basis="z", **kwargs)


def x_memory_experiment(code, **kwargs) -> dict[str, float]:
    """The |+̄⟩ (X-basis) memory: `memory_experiment(basis='x')`."""
    return memory_experiment(code, basis="x", **kwargs)
