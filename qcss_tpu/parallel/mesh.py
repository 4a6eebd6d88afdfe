"""Device-mesh utilities and the sharded Monte-Carlo pipeline.

Design: the Monte-Carlo sample axis is embarrassingly parallel, so the mesh
has a single ``data`` axis; each device derives an independent PRNG stream
by folding in its mesh coordinate, runs the fused
sample → syndrome-extract → decode → logical-check pipeline on its local
shard, and the scalar failure counts ride one `psum` over ICI. Code arrays
(parity checks, LUTs, logical rows) are small and replicated.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from qcss_tpu.decode.montecarlo import decode_failures, sample_depolarizing


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """A 1-D mesh over the first ``n_devices`` local devices.

    Raises if fewer than ``n_devices`` devices exist — silently returning a
    smaller mesh once produced sharded programs that ran un-parallelized
    (and an assertion failure downstream); see tests/conftest.py for how to
    provision virtual CPU devices.
    """
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} device(s) exist; provision virtual CPU "
                "devices (jax_num_cpu_devices) or request fewer"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


# Compiled sharded-step cache: a fresh shard_map + jit per call would
# retrace and recompile every round of a sweep.
_MC_STEP_CACHE: dict = {}


def _mc_step_fn(mesh: Mesh, local_batch: int):
    key_ = (mesh, local_batch)
    fn = _MC_STEP_CACHE.get(key_)
    if fn is not None:
        return fn
    axis = mesh.axis_names[0]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(),) * 10,
        out_specs=P(),
    )
    def step(key, p, h1, h2, lut1, lut2, lx, lz, flip2, flip1):
        my_key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        x_err, z_err = sample_depolarizing(my_key, local_batch, h1.shape[1], p)
        fails = decode_failures(
            x_err, z_err, h1, h2, lut1, lut2, lx, lz, flip2, flip1
        )
        return {
            k: jax.lax.psum(jnp.sum(v, dtype=jnp.int32), axis)
            for k, v in fails.items()
        }

    fn = jax.jit(step)
    _MC_STEP_CACHE[key_] = fn
    return fn


def sharded_mc_step(code, mesh: Mesh, key: jax.Array, batch: int, p):
    """One Monte-Carlo round sharded over the mesh's ``data`` axis.

    ``batch`` is the *global* sample count; it must divide evenly by the
    mesh size. Returns global failure counts (already psummed, replicated).
    """
    dev = code.device
    n_dev = mesh.devices.size
    if batch % n_dev:
        raise ValueError(f"batch {batch} not divisible by mesh size {n_dev}")
    fn = _mc_step_fn(mesh, batch // n_dev)
    return fn(key, jnp.float32(p), dev.h1, dev.h2, dev.lut_c1, dev.lut_c2,
              dev.logical_x, dev.logical_z,
              dev.flip_z_of_lut_c2, dev.flip_x_of_lut_c1)


def sharded_ftqc_run(encoded, mesh: Mesh, batch: int, key: jax.Array) -> dict:
    """Run an FT-encoded program with the shot axis sharded over the mesh.

    Each device executes its local shard of shots end-to-end (tableau
    evolution, EC, majority votes) with an independent PRNG stream; results
    are concatenated along the batch axis. The repeat-until-success
    preparation loops run per-device (no collectives inside), so devices
    may take different trip counts — legal SPMD.
    """
    n_dev = mesh.devices.size
    if batch % n_dev:
        raise ValueError(f"batch {batch} not divisible by mesh size {n_dev}")
    local = batch // n_dev
    axis = mesh.axis_names[0]

    cache = getattr(encoded, "_sharded_cache", None)
    if cache is None:
        cache = {}
        encoded._sharded_cache = cache
    fn = cache.get((mesh, local))
    if fn is None:
        if getattr(encoded, "engine", "unrolled") == "scheduled":
            # Host-side lowering (and, for the frames engine, the
            # reference-outcome recording) must happen OUTSIDE the
            # shard_map trace — reference_outcomes pulls concrete votes.
            encoded._prepare_scheduled()
            body = encoded._execute_scheduled
        else:
            body = encoded._execute

        # check_vma=False: the executor's initial (replicated) tableau enters
        # a lax.scan whose carry becomes device-varying after the first keyed
        # op; the varying-axis type check rejects that mix even though the
        # program is valid SPMD.
        @partial(shard_map, mesh=mesh, in_specs=(P(),), out_specs=P(axis),
                 check_vma=False)
        def step(key):
            my_key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            return body(my_key, local)

        fn = jax.jit(step)
        cache[(mesh, local)] = fn
    return fn(key)


class ShardedFrameMemory:
    """Mesh-parallel memory-experiment sampling on the Pauli-frame fast
    path (`sim.frame` via `experiments.memory._memory_circuit_frames`).

    Each device samples its local shard of shots (independent folded PRNG
    stream) and keeps detector histories device-resident until the host
    decode gathers them; no collectives are needed beyond the output
    layout (the sample axis is embarrassingly parallel, exactly like
    `sharded_mc_step`). Compiled steps are cached per (mesh, local batch,
    rounds) on the instance.
    """

    def __init__(self, code, noise, mesh: Mesh):
        from qcss_tpu.experiments.memory import z_extraction_circuit

        self.code = code
        self.noise = noise
        self.mesh = mesh
        self.h2_raw = np.asarray(code.raw_parity_check_c2)
        self._extract = tuple(map(jnp.asarray, z_extraction_circuit(
            code, checks=self.h2_raw).to_arrays()))
        from qcss_tpu.sim import frame as fr

        self._extract_comp = fr.maybe_compile(
            self._extract, code.n + self.h2_raw.shape[0])
        self._cache: dict = {}

    def sample(self, key: jax.Array, batch: int, rounds: int):
        """Global-batch sample: returns (syns [R, batch, r], word
        [batch, n]) with the batch axis sharded over the mesh."""
        from qcss_tpu.experiments.memory import _memory_circuit_frames

        mesh = self.mesh
        n_dev = mesh.devices.size
        if batch % n_dev:
            raise ValueError(
                f"batch {batch} not divisible by mesh size {n_dev}")
        local = batch // n_dev
        axis = mesh.axis_names[0]
        fn = self._cache.get((local, rounds))
        if fn is None:
            code, noise = self.code, self.noise
            n_anc = self.h2_raw.shape[0]
            extract = self._extract
            comp = self._extract_comp

            # check_vma=False for the same reason as sharded_ftqc_run: the
            # replicated zero-frame carry turns device-varying after the
            # first folded-key injection inside the scan.
            @partial(shard_map, mesh=mesh, in_specs=(P(),),
                     out_specs=(P(None, axis), P(axis)), check_vma=False)
            def step(k):
                my_key = jax.random.fold_in(k, jax.lax.axis_index(axis))
                return _memory_circuit_frames(
                    my_key, local, rounds, code, noise, extract, n_anc,
                    extract_comp=comp)

            fn = jax.jit(step)
            self._cache[(local, rounds)] = fn
        return fn(key)

    def error_rate(self, *, rounds: int, batch: int, seed: int = 0,
                   decoder: str = "uf",
                   n_threads: int | None = None) -> dict[str, float]:
        """Sample over the mesh, decode on the host (union-find on the
        phenomenological spacetime graph, or the circuit-level DEM)."""
        from qcss_tpu.decode.spacetime import detector_history
        from qcss_tpu.decode.uf import UFDecoder, spacetime_graph
        from qcss_tpu.experiments.memory import _count_failures

        syns, word = self.sample(jax.random.key(seed), batch, rounds)
        syns, word = np.asarray(syns), np.asarray(word)
        final_syn = (
            (word.astype(np.int64) @ self.h2_raw.T.astype(np.int64)) & 1
        ).astype(np.uint8)
        dets = detector_history(syns, final_syn)
        if decoder == "dem":
            from qcss_tpu.decode.dem import (
                circuit_level_graph,
                extraction_gate_list,
            )

            graph = circuit_level_graph(
                self.h2_raw, extraction_gate_list(self.code, self.h2_raw),
                rounds, p_gate2=self.noise.p_gate2,
                p_meas=self.noise.p_meas, p_reset=self.noise.p_reset,
                logicals=self.code.z_operator_matrix(),
                rate2=self.noise.pauli2,
            )
        else:
            graph = spacetime_graph(
                self.h2_raw, self.code.z_operator_matrix(), rounds)
        corr, _ = UFDecoder(graph).decode_batch(dets, n_threads=n_threads)
        counts = _count_failures(word, corr, self.code)
        return {
            "logical_fail": int(counts["logical_fail"]) / batch,
            "residual_syndrome": int(counts["residual_syndrome"]) / batch,
            "rounds": rounds,
            "samples": batch,
            "decoder": decoder,
        }


    def fused_error_rate(self, *, rounds: int, batch: int, seed: int = 0,
                         graph_kind: str = "dem",
                         decoder: str = "dense",
                         d_max: int = 48) -> dict[str, float]:
        """Round-3 form: sample AND union-find-decode on every device
        (`decode.device_uf` inside the shard_map), with one `psum` of the
        failure counts as the only collective — the fully inverted
        pipeline at mesh scale (no detector history ever leaves the
        devices).

        decoder='sparse' / 'hybrid' (round 5) rides the defect-granular
        sparse kernel (`decode.device_sparse`) inside the shard_map —
        the round-4 flagship decoder at mesh scale ('hybrid' composes
        the dense kernel for the rare >d_max-defect shot and is the
        production choice at operating noise)."""
        from qcss_tpu.decode.device_uf import make_obs_decoder
        from qcss_tpu.decode.uf import spacetime_graph
        from qcss_tpu.experiments.memory import _memory_fused_device

        mesh = self.mesh
        n_dev = mesh.devices.size
        if batch % n_dev:
            raise ValueError(
                f"batch {batch} not divisible by mesh size {n_dev}")
        local = batch // n_dev
        axis = mesh.axis_names[0]
        ck = ("fused", local, rounds, graph_kind, decoder, d_max)
        fn = self._cache.get(ck)
        if fn is None:
            logicals = self.code.z_operator_matrix()
            if graph_kind == "dem":
                from qcss_tpu.decode.dem import (
                    circuit_level_graph,
                    extraction_gate_list,
                )

                graph = circuit_level_graph(
                    self.h2_raw,
                    extraction_gate_list(self.code, self.h2_raw), rounds,
                    p_gate2=self.noise.p_gate2, p_meas=self.noise.p_meas,
                    p_reset=self.noise.p_reset, logicals=logicals,
                    rate2=self.noise.pauli2)
            else:
                graph = spacetime_graph(self.h2_raw, logicals, rounds)
            if decoder == "dense":
                decode_fn = make_obs_decoder(graph)
            elif decoder == "sparse":
                from qcss_tpu.decode.device_sparse import (
                    make_sparse_obs_decoder,
                )

                decode_fn = make_sparse_obs_decoder(graph, d_max=d_max)
                if decode_fn is None:
                    raise ValueError("graph refuses the sparse path")
            elif decoder == "hybrid":
                from qcss_tpu.decode.device_sparse import (
                    make_hybrid_obs_decoder,
                )

                decode_fn = make_hybrid_obs_decoder(graph, d_max=d_max)
            else:
                raise ValueError(
                    "decoder must be 'dense', 'sparse' or 'hybrid'")
            code, noise = self.code, self.noise
            n_anc = self.h2_raw.shape[0]
            extract = self._extract
            comp = self._extract_comp
            log_row = jnp.asarray(logicals[0], jnp.int32)
            raw_j = jnp.asarray(self.h2_raw, jnp.uint8)

            @partial(shard_map, mesh=mesh, in_specs=(P(),),
                     out_specs=(P(), P()), check_vma=False)
            def step(k):
                my_key = jax.random.fold_in(k, jax.lax.axis_index(axis))
                fails, conv = _memory_fused_device(
                    my_key, local, rounds, code=code, noise=noise,
                    extract_arrays=extract, n_anc=n_anc,
                    decode_fn=decode_fn, log_row=log_row, raw_j=raw_j,
                    engine="frames", extract_comp=comp)
                return (
                    jax.lax.psum(fails, axis),
                    jax.lax.psum(1 - conv.astype(jnp.int32), axis),
                )

            fn = jax.jit(step)
            self._cache[ck] = fn
        fails, bad = fn(jax.random.key(seed))
        if int(bad):
            raise RuntimeError("device union-find hit its growth cap")
        return {
            "logical_fail": int(fails) / batch,
            "rounds": rounds,
            "samples": batch,
            "decoder": f"device-{graph_kind}",
        }


_BP_MEMORY_CACHE: dict = {}


def sharded_bp_memory(code, mesh: Mesh, *, rounds: int, p: float, q: float,
                      batch: int, seed: int = 0, iters: int = 32,
                      alpha: float = 0.8) -> dict[str, float]:
    """Mesh-parallel phenomenological qLDPC memory, fully fused on device.

    The qLDPC counterpart of `ShardedFrameMemory.fused_error_rate`: each
    device samples its shard of the detector stream
    (`streaming.sample_phenomenological_stream`, a `lax.scan` over rounds)
    and decodes the whole history with spacetime belief propagation
    (`decode.bp.BPDecoder`) *inside* the `shard_map`; observable flips are
    scored on device against the true logical parities and only the psummed
    failure / non-converged counts cross the host boundary. BP here is the
    device-only kernel (no host OSD tail — non-converged shots score their
    final hard decision), so the whole pipeline is one XLA program; the
    reported ``bp_unconverged`` fraction bounds how much an OSD pass could
    still recover.

    The sample axis is embarrassingly parallel (the reference's only
    batching is the QVM numshots loop, reference: test/test_fidelity.py:67);
    check/Tanner tables are small and replicated.
    """
    from qcss_tpu.decode.bp import BPDecoder, spacetime_tanner
    from qcss_tpu.decode.streaming import sample_phenomenological_stream

    n_dev = mesh.devices.size
    if batch % n_dev:
        raise ValueError(f"batch {batch} not divisible by mesh size {n_dev}")
    local = batch // n_dev
    axis = mesh.axis_names[0]

    h2 = getattr(code, "redundant_parity_check_c2", None)
    if h2 is None:
        h2 = code.raw_parity_check_c2
    h2 = np.asarray(h2, np.uint8)
    lz = np.asarray(code.z_operator_matrix(), np.uint8)
    ck = (id(code), mesh, local, rounds, float(p), float(q), iters,
          float(alpha))
    fn = _BP_MEMORY_CACHE.get(ck)
    if fn is None:
        tan, priors, obs, _ = spacetime_tanner(h2, rounds, p, q, logicals=lz)
        dec = BPDecoder(tan, priors, logicals=obs, iters=iters, alpha=alpha,
                        osd=False)
        obs_t = jnp.asarray(obs.T, jnp.int32)
        h2_j = jnp.asarray(h2)
        lz_j = jnp.asarray(lz)

        # check_vma=False: the stream sampler's zero carries turn
        # device-varying after the first folded-key draw (same pattern as
        # sharded_ftqc_run).
        @partial(shard_map, mesh=mesh, in_specs=(P(),), out_specs=(P(), P()),
                 check_vma=False)
        def step(k):
            my_key = jax.random.fold_in(k, jax.lax.axis_index(axis))
            dets, par = sample_phenomenological_stream(
                my_key, p, q, local, rounds, h2_j, lz_j)
            syn = dets.reshape(local, -1).astype(jnp.uint8)
            e_hat, conv, _ = dec._bp_run(syn)
            flips = (e_hat.astype(jnp.int32) @ obs_t) & 1
            fail = (flips ^ par.astype(jnp.int32)).any(axis=1)
            return (
                jax.lax.psum(jnp.sum(fail.astype(jnp.int32)), axis),
                jax.lax.psum(jnp.sum(1 - conv.astype(jnp.int32)), axis),
            )

        fn = jax.jit(step)
        _BP_MEMORY_CACHE[ck] = fn
    fails, unconv = fn(jax.random.key(seed))
    return {
        "x_fail": int(fails) / batch,
        "bp_unconverged": int(unconv) / batch,
        "rounds": rounds,
        "samples": batch,
        "decoder": "device-bp",
    }


_SOFT_MEMORY_CACHE: dict = {}


def sharded_soft_memory(code, mesh: Mesh, *, rounds: int, p: float,
                        sigma: float, batch: int, seed: int = 0,
                        resolution: int = 8) -> dict[str, float]:
    """Mesh-parallel ANALOG-READOUT memory, fully fused on device (the
    tenth validated multi-chip pipeline): every device samples its shard
    of the phenomenological stream with Gaussian readout amplitudes
    (`experiments.soft._sample_soft_stream`), converts amplitudes to
    per-shot posterior-LLR time-edge weights, union-find-decodes with
    the device kernel's ``shot_weights`` input, and scores failures —
    one `psum` of counts is the only collective; the amplitudes (the
    large per-shot side-information array) never leave any device."""
    from qcss_tpu.decode import device_uf
    from qcss_tpu.decode.uf import graph_from_checks, spacetime_graph
    from qcss_tpu.experiments import soft

    n_dev = mesh.devices.size
    if batch % n_dev:
        raise ValueError(f"batch {batch} not divisible by mesh size {n_dev}")
    local = batch // n_dev
    axis = mesh.axis_names[0]
    ck = (id(code), mesh, local, rounds, float(p), float(sigma), resolution)
    fn = _SOFT_MEMORY_CACHE.get(ck)
    if fn is None:
        h = code.raw_parity_check_c2
        lz = np.asarray(code.z_operator_matrix(), np.uint8) & 1
        q_eff = max(soft.flip_prob(sigma), 1e-9)
        p_eff = max(p, 1e-9)
        graph = spacetime_graph(h, lz, rounds, p_space=p_eff,
                                p_time=q_eff)
        n_space = graph_from_checks(h, lz).num_edges * (rounds + 1)
        base_ln = float(np.log(max(p_eff, q_eff)))
        w_space = soft._llr_weights(np.full(n_space, p_eff), base_ln,
                                    resolution=resolution)
        dg = device_uf.build_device_graph(graph, stencil=False)
        w_space_j = jnp.asarray(w_space, jnp.int32)
        h_j = jnp.asarray(np.asarray(h, np.uint8))
        lz_j = jnp.asarray(lz)
        pow2 = jnp.asarray(1 << np.arange(lz.shape[0]), jnp.int32)
        sig2 = float(sigma) * float(sigma)

        @partial(shard_map, mesh=mesh, in_specs=(P(),),
                 out_specs=(P(), P()), check_vma=False)
        def step(k):
            my_key = jax.random.fold_in(k, jax.lax.axis_index(axis))
            dets, par, amp = soft._sample_soft_stream(
                my_key, jnp.float32(p), jnp.float32(sigma), local,
                rounds, code.n, h_j, lz_j)
            pf = jnp.clip(
                jax.nn.sigmoid(-2.0 * amp.reshape(local, -1) / sig2),
                1e-9, 0.499)
            wt_t = jnp.clip(
                jnp.rint(resolution * jnp.log(pf) / base_ln),
                1, 250).astype(jnp.int32)
            sw = jnp.concatenate(
                [jnp.broadcast_to(w_space_j[None, :], (local, n_space)),
                 wt_t], axis=1)
            labels, conv = device_uf.decode_labels(dg, dets,
                                                   shot_weights=sw)
            par_bits = jnp.sum(par.astype(jnp.int32) * pow2[None, :],
                               axis=1)
            fail = labels[0] != par_bits
            return (jax.lax.psum(jnp.sum(fail.astype(jnp.int32)), axis),
                    jax.lax.psum(jnp.sum(1 - conv.astype(jnp.int32)),
                                 axis))

        fn = jax.jit(step)
        _SOFT_MEMORY_CACHE[ck] = fn
    fails, unconv = fn(jax.random.key(seed))
    if int(unconv):
        raise RuntimeError(
            f"device UF growth cap hit on {int(unconv)} decodes")
    return {
        "logical_fail": int(fails) / batch,
        "rounds": rounds,
        "samples": batch,
        "p": p,
        "sigma": sigma,
        "decoder": "device-uf-soft",
    }


def sharded_qldpc_circuit_memory(code, mesh: Mesh, *, rounds: int, noise,
                                 batch: int, seed: int = 0, iters: int = 48,
                                 alpha: float = 0.8) -> dict[str, float]:
    """Mesh-parallel CIRCUIT-LEVEL qLDPC memory, fully fused on device.

    The circuit-noise counterpart of `sharded_bp_memory`: every device
    frame-samples its shard of the two-sector extraction schedule
    (`experiments.memory_xz._sample_two_sector` — the real circuits, real
    per-location noise), assembles the z-sector detector history, and
    decodes it with BP over the exact detector-fault Tanner graph
    (`decode.bp_dem.build_circuit_tanner`) *inside* the `shard_map`; one
    `psum` of failure / non-converged counts crosses the host boundary.
    Device-only BP (no OSD tail): ``bp_unconverged`` bounds what a host
    OSD pass could still recover."""
    from functools import partial as _partial

    from qcss_tpu.decode.bp import BPDecoder
    from qcss_tpu.decode.bp_dem import build_circuit_tanner
    from qcss_tpu.decode.spacetime import detector_history
    from qcss_tpu.experiments.memory import (
        x_extraction_circuit,
        z_extraction_circuit,
    )
    from qcss_tpu.experiments.memory_xz import _sample_two_sector
    from qcss_tpu.sim import frame as fr

    n_dev = mesh.devices.size
    if batch % n_dev:
        raise ValueError(f"batch {batch} not divisible by mesh size {n_dev}")
    local = batch // n_dev
    axis = mesh.axis_names[0]

    hz = np.asarray(getattr(code, "redundant_parity_check_c2",
                            code.raw_parity_check_c2), np.uint8) & 1
    hx = np.asarray(getattr(code, "redundant_parity_check_c1",
                            code.raw_parity_check_c1), np.uint8) & 1
    lz = np.asarray(code.z_operator_matrix(), np.uint8) & 1
    # key on the noise VALUES (the compiled closure bakes them in) — the
    # structure-only static_key would alias different rates
    ck = (id(code), mesh, local, rounds,
          (noise.p_gate1, noise.p_gate2, noise.p_meas, noise.p_reset,
           noise.p_idle, noise.pauli1, noise.pauli2, noise.pauli_idle),
          iters, float(alpha))
    fn = _BP_MEMORY_CACHE.get(ck)
    if fn is None:
        tan = build_circuit_tanner(code, rounds, noise, sector="z",
                                   hz=hz, hx=hx)
        dec = BPDecoder(tan.checks, np.clip(tan.priors, 1e-12, 0.499),
                        iters=iters, alpha=alpha, osd=False)
        obs_t = jnp.asarray(tan.obs.T, jnp.int32)
        rz, rx = hz.shape[0], hx.shape[0]
        n = code.n
        z_arrays = tuple(map(jnp.asarray, z_extraction_circuit(
            code, checks=hz).to_arrays()))
        x_arrays = tuple(map(jnp.asarray, x_extraction_circuit(
            code, anc_offset=n + rz, checks=hx).to_arrays()))
        nq = n + rz + rx
        sample = _partial(_sample_two_sector, code=code, noise=noise,
                          z_arrays=z_arrays, x_arrays=x_arrays,
                          z_comp=fr.maybe_compile(z_arrays, nq),
                          x_comp=fr.maybe_compile(x_arrays, nq),
                          rz=rz, rx=rx)
        hz_t = jnp.asarray(hz.T, jnp.int32)
        lz_t = jnp.asarray(lz.T, jnp.int32)

        @partial(shard_map, mesh=mesh, in_specs=(P(),), out_specs=(P(), P()),
                 check_vma=False)
        def step(k):
            my_key = jax.random.fold_in(k, jax.lax.axis_index(axis))
            syns_z, _, x_err, _ = sample(my_key, local, rounds)
            final_z = ((x_err.astype(jnp.int32) @ hz_t) & 1).astype(jnp.uint8)
            dets = detector_history(syns_z, final_z).astype(jnp.uint8)
            e_hat, conv, _ = dec._bp_run(dets.reshape(local, -1))
            flips = (e_hat.astype(jnp.int32) @ obs_t) & 1
            par = (x_err.astype(jnp.int32) @ lz_t) & 1
            fail = (flips ^ par).any(axis=1)
            return (
                jax.lax.psum(jnp.sum(fail.astype(jnp.int32)), axis),
                jax.lax.psum(jnp.sum(1 - conv.astype(jnp.int32)), axis),
            )

        fn = jax.jit(step)
        _BP_MEMORY_CACHE[ck] = fn
    fails, unconv = fn(jax.random.key(seed))
    return {
        "x_fail": int(fails) / batch,
        "bp_unconverged": int(unconv) / batch,
        "rounds": rounds,
        "samples": batch,
        "decoder": "device-circuit-bp",
    }


_MAGIC_CACHE: dict = {}


def sharded_magic_factory(mesh: Mesh, noise, p_in, batch: int, *,
                          code=None, extractions: int = 1,
                          seed: int = 0) -> dict[str, float]:
    """Mesh-parallel circuit-level magic-state distillation (seventh
    sharded pipeline): every device runs its shard of
    `ftqc.magic.distill_circuit`'s frame kernel — noisy encoded-|+̄⟩
    preparation, Bernoulli(p_in) twirled-input Z injections, noisy
    X-syndrome extraction rounds, perfect transversal readout — and only
    the psummed (accepted, erroneous) counts cross the host boundary.
    ``p_in`` is a traced argument: one compile serves a whole input-error
    sweep. A factory is embarrassingly shot-parallel, so this is the
    deployment shape for calibrating distillation units at scale; the
    reference has no non-Clifford machinery at all (reference:
    css_code.py:433-434)."""
    from qcss_tpu.circuits import encoding
    from qcss_tpu.experiments.memory import x_extraction_circuit
    from qcss_tpu.ftqc import magic

    code = magic._default_code() if code is None else code
    magic._check_distillable(code)
    n_dev = mesh.devices.size
    if batch % n_dev:
        raise ValueError(f"batch {batch} not divisible by mesh size {n_dev}")
    local = batch // n_dev
    axis = mesh.axis_names[0]
    ck = (id(code), mesh, local, extractions,
          (noise.p_gate1, noise.p_gate2, noise.p_meas, noise.p_reset,
           noise.p_idle, noise.pauli1, noise.pauli2, noise.pauli_idle))
    fn = _MAGIC_CACHE.get(ck)
    if fn is None:
        kernel = partial(
            magic._circuit_kernel, inject=None, code=code, noise=noise,
            prep_arrays=tuple(map(jnp.asarray,
                                  encoding.encode_plus_network(code)
                                  .to_arrays())),
            ext_arrays=tuple(map(jnp.asarray,
                                 x_extraction_circuit(code).to_arrays())),
            h1t=jnp.asarray(code.parity_check_c1.T, jnp.int32),
            xbar=jnp.asarray(code.x_operator_matrix()[0], jnp.int32),
            batch=local, extractions=extractions, n=code.n, r1=code.r_1)

        @partial(shard_map, mesh=mesh, in_specs=(P(), P()),
                 out_specs=(P(), P()), check_vma=False)
        def step(k, p):
            my_key = jax.random.fold_in(k, jax.lax.axis_index(axis))
            accept, err = kernel(my_key, p)
            return (
                jax.lax.psum(jnp.sum(accept.astype(jnp.int32)), axis),
                jax.lax.psum(jnp.sum((accept & err).astype(jnp.int32)), axis),
            )

        fn = jax.jit(step)
        _MAGIC_CACHE[ck] = fn
    acc, bad = fn(jax.random.key(seed), jnp.float32(p_in))
    acc, bad = int(acc), int(bad)
    return {
        "p_in": float(p_in),
        "p_accept": acc / batch,
        "p_out": bad / max(acc, 1),
        "accepted": acc,
        "samples": batch,
        "extractions": extractions,
    }


_LOGICAL_PROG_CACHE: dict = {}


def sharded_logical_program(model, mesh: Mesh, *, p: float,
                            q: float | None = None, batch: int,
                            seed: int = 0) -> dict[str, float]:
    """Mesh-parallel compiled logical program (eighth validated
    pipeline): every device samples its shard of the program's fault
    model AND union-find-decodes it (`decode.device_uf` inside the
    shard_map); one `psum` of per-observable failure counts is the only
    collective — logical circuits at pod scale with nothing but counts
    leaving the devices.

    `model` is a built `experiments.patches.ScheduleModel` (e.g.
    `LogicalProgram(...).cnot(0, 1).build()`)."""
    from qcss_tpu.decode.device_uf import make_obs_decoder
    from qcss_tpu.experiments.surgery import _sample

    q = p if q is None else q
    n_dev = mesh.devices.size
    if batch % n_dev:
        raise ValueError(f"batch {batch} not divisible by {n_dev}")
    local = batch // n_dev
    axis = mesh.axis_names[0]
    n_obs = model.obs.shape[0]
    # content digest, NOT id(): a freed model's id can be reused and
    # alias a different compiled pipeline (see CLAUDE.md invariant)
    import hashlib

    dig = hashlib.sha1(
        model.F.tobytes() + model.obs.tobytes()
        + model.graph.edge_weight.tobytes()).hexdigest()
    ck = (dig, local, float(p), float(q),
          tuple(sorted(mesh.shape.items())))
    fn = _LOGICAL_PROG_CACHE.get(ck)
    if fn is None:
        decode_fn = make_obs_decoder(model.graph)
        cls = jnp.asarray(model.fault_probs_class)
        f_t = jnp.asarray(model.F.T.astype(np.int32))
        obs_t = jnp.asarray(model.obs.T.astype(np.int32))
        bits = jnp.asarray(1 << np.arange(n_obs), jnp.int32)

        @partial(shard_map, mesh=mesh, in_specs=(P(),),
                 out_specs=(P(), P(), P()), check_vma=False)
        def step(k):
            my_key = jax.random.fold_in(k, jax.lax.axis_index(axis))
            dets, ob = _sample(my_key, jnp.float32(p), jnp.float32(q),
                               local, cls, f_t, obs_t)
            flips, conv = decode_fn(dets)
            truth = (ob.astype(jnp.int32) * bits[None, :]).sum(axis=1)
            fail = flips.astype(jnp.int32) ^ truth
            per_obs = ((fail[:, None] & bits[None, :]) > 0).sum(axis=0)
            word = (fail != 0).sum()
            bad = (1 - conv.astype(jnp.int32)).sum()
            return (jax.lax.psum(per_obs, axis),
                    jax.lax.psum(word, axis), jax.lax.psum(bad, axis))

        fn = jax.jit(step)
        _LOGICAL_PROG_CACHE[ck] = fn
    per_obs, word, bad = fn(jax.random.key(seed))
    if int(bad):
        raise RuntimeError("device union-find hit its growth cap")
    out = {"word_fail": int(word) / batch, "samples": batch,
           "devices": n_dev, "p": float(p), "q": float(q)}
    names = model.meta.get("obs_names",
                           [f"obs{i}" for i in range(n_obs)])
    for i, name in enumerate(names):
        out[f"{name}_fail"] = int(per_obs[i]) / batch
    return out


_TWO_LEVEL_CACHE: dict = {}


def sharded_two_level_memory(d: int, k: int, rounds_l: int, mesh: Mesh,
                             *, p: float, q: float | None = None,
                             batch: int, seed: int = 0) -> dict:
    """Mesh-parallel hierarchical (two-level concatenated) memory —
    the ninth validated pipeline. Every device runs the FUSED
    two-level step of `experiments.concatenated`: sample the compiled
    mzz-sweep logical program's fault model, union-find-decode level 1,
    assemble the level-2 repetition-code spacetime detectors from the
    decoded deviation record, union-find-decode level 2 — and one
    `psum` of the level-1/level-2 failure counts is the only
    collective. Hierarchical decoding at pod scale with nothing but
    counts leaving the devices (no analogue in the reference's
    one-code-block world — reference: ftqc.py:42-120)."""
    from qcss_tpu.decode.device_uf import make_obs_decoder
    from qcss_tpu.experiments.concatenated import (
        _build_program, _level2_detectors, repetition_spacetime_graph)
    from qcss_tpu.experiments.surgery import _sample

    q = p if q is None else q
    n_dev = mesh.devices.size
    if batch % n_dev:
        raise ValueError(f"batch {batch} not divisible by {n_dev}")
    local = batch // n_dev
    axis = mesh.axis_names[0]
    ck = (d, k, rounds_l, local, float(p), float(q),
          tuple(sorted(mesh.shape.items())))
    entry = _TWO_LEVEL_CACHE.get(ck)
    if entry is None:
        prog, model, perm = _build_program(d, k, rounds_l)
        n_checks = k - 1
        n_obs = model.obs.shape[0]
        if n_obs > 24:
            raise ValueError(
                "device path packs obs rows into one int32: "
                f"rounds_l*(k-1)+k = {n_obs} > 24")
        dec1 = make_obs_decoder(model.graph)
        dec2 = make_obs_decoder(repetition_spacetime_graph(k, rounds_l + 1))
        cls = jnp.asarray(model.fault_probs_class)
        f_t = jnp.asarray(model.F.T.astype(np.int32))
        obs_t = jnp.asarray(model.obs.T.astype(np.int32))
        bits1 = jnp.asarray(1 << np.arange(n_obs), jnp.int32)

        @partial(shard_map, mesh=mesh, in_specs=(P(),),
                 out_specs=(P(), P(), P()), check_vma=False)
        def step(key):
            my_key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            dets, ob = _sample(my_key, jnp.float32(p), jnp.float32(q),
                               local, cls, f_t, obs_t)
            flips, conv1 = dec1(dets)
            truth = (ob.astype(jnp.int32) * bits1[None, :]).sum(axis=1)
            v = flips.astype(jnp.int32) ^ truth      # deviation bitmask
            mzz = ((v[:, None] >> jnp.asarray(perm)) & 1
                   ).reshape(-1, rounds_l, n_checks).astype(jnp.uint8)
            z = ((v[:, None] >> (rounds_l * n_checks + jnp.arange(k))) & 1
                 ).astype(jnp.uint8)
            dets2 = _level2_detectors(mzz, z)
            flips2, conv2 = dec2(dets2)
            zbits = (v >> (rounds_l * n_checks)) & ((1 << k) - 1)
            zcorr = zbits ^ flips2.astype(jnp.int32)
            bad = ((1 - conv1.astype(jnp.int32)).sum()
                   + (1 - conv2.astype(jnp.int32)).sum())
            return (jax.lax.psum((zbits != 0).sum(), axis),
                    jax.lax.psum((zcorr != 0).sum(), axis),
                    jax.lax.psum(bad, axis))

        entry = (jax.jit(step), prog.n)
        _TWO_LEVEL_CACHE[ck] = entry
    fn, grid_qubits = entry
    l1, l2, bad = fn(jax.random.key(seed))
    if int(bad):
        raise RuntimeError("device union-find hit its growth cap")
    return {
        "d": d, "k": k, "rounds_l": rounds_l,
        "p": float(p), "q": float(q), "samples": batch,
        "devices": n_dev, "grid_qubits": grid_qubits,
        "word_fail_l1": int(l1) / batch,
        "word_fail_l2": int(l2) / batch,
    }


def sharded_logical_error_rate(
    code,
    p,
    *,
    mesh: Mesh | None = None,
    samples: int = 1 << 20,
    batch: int = 1 << 18,
    seed: int = 0,
) -> dict[str, float]:
    """Mesh-parallel version of `decode.montecarlo.logical_error_rate`."""
    mesh = make_mesh() if mesh is None else mesh
    n_dev = mesh.devices.size
    batch = max(n_dev, batch - batch % n_dev)
    rounds = -(-samples // batch)
    total = {"x_fail": 0, "z_fail": 0, "word_fail": 0}
    keys = jax.random.split(jax.random.key(seed), rounds)
    for i in range(rounds):
        counts = sharded_mc_step(code, mesh, keys[i], batch, p)
        for k in total:
            total[k] += int(counts[k])
    n_samples = rounds * batch
    out = {k: v / n_samples for k, v in total.items()}
    out["samples"] = n_samples
    return out


def _code_struct_key(code) -> bytes:
    """Structural cache key for a code: bytes of its parity checks.

    Keying compiled-fn caches on ``id(code)`` can alias if the object is
    collected and a different code lands at the same address (the
    order-dependent wrong-circuit bug class CLAUDE.md documents for
    ftqc/executor._lowered) — a structural key cannot."""
    parts = [np.asarray(code.parity_check_c2, np.uint8).tobytes(),
             np.asarray(code.parity_check_c1, np.uint8).tobytes()]
    raw = getattr(code, "raw_parity_check_c2", None)
    if raw is not None:
        parts.append(np.asarray(raw, np.uint8).tobytes())
    return b"|".join(parts)


_MLD_MEMORY_CACHE: dict = {}


def sharded_mld_memory(code, mesh: Mesh, *, p: float, batch: int,
                       seed: int = 0) -> dict[str, float]:
    """Mesh-parallel EXACT maximum-likelihood memory (the eleventh
    validated multi-chip pipeline): every device samples its shard of
    iid X errors, computes syndromes, scores every degenerate coset of
    every logical class with the MXU coset matmuls
    (`decode.mld.MLDecoder.device_decode_fn`) and picks the ML class —
    all inside the `shard_map`; one `psum` of word-failure counts is
    the only collective. The optimal decoder, at mesh scale."""
    from qcss_tpu.decode.mld import MLDecoder
    from qcss_tpu.ops import gf2_jax

    n_dev = mesh.devices.size
    if batch % n_dev:
        raise ValueError(f"batch {batch} not divisible by mesh size {n_dev}")
    local = batch // n_dev
    axis = mesh.axis_names[0]
    ck = (_code_struct_key(code), mesh, local, float(p))
    fn = _MLD_MEMORY_CACHE.get(ck)
    if fn is None:
        ml = MLDecoder.for_code(code, p=p)
        dec = ml.device_decode_fn()
        h_t = jnp.asarray(np.asarray(code.parity_check_c2, np.uint8).T)
        lz_t = jnp.asarray(
            (np.asarray(code.z_operator_matrix(), np.uint8) & 1).T)
        llr0 = float(np.log(p / (1 - p)))
        n = code.n

        @partial(shard_map, mesh=mesh, in_specs=(P(),),
                 out_specs=P(), check_vma=False)
        def step(k):
            my_key = jax.random.fold_in(k, jax.lax.axis_index(axis))
            errs = (jax.random.uniform(my_key, (local, n))
                    < p).astype(jnp.uint8)
            syn = gf2_jax.mod2_matmul(errs, h_t)
            llr = jnp.full((local, n), llr0, jnp.float32)
            flips = dec(syn, llr)
            par = gf2_jax.mod2_matmul(errs, lz_t)
            fail = jnp.any(flips != par, axis=1)
            return jax.lax.psum(jnp.sum(fail.astype(jnp.int32)), axis)

        fn = jax.jit(step)
        _MLD_MEMORY_CACHE[ck] = fn
    fails = fn(jax.random.key(seed))
    return {
        "word_fail": int(fails) / batch,
        "samples": batch,
        "p": p,
        "decoder": "device-mld",
    }


_PW_MEMORY_CACHE: dict = {}


def sharded_parallel_window_memory(code, mesh: Mesh, *, rounds: int,
                                   p: float, q: float, batch: int,
                                   core: int, buf: int,
                                   seed: int = 0) -> dict[str, float]:
    """Mesh-parallel PARALLEL-WINDOW memory (the twelfth validated
    multi-chip pipeline): every device samples its shard of the
    phenomenological stream and decodes the whole recorded stream with
    `decode.parallel_window.ParallelWindowDecoder.decode_traced` — all
    layer-A windows and all layer-B seams fold into the local batch
    axis inside the `shard_map`; one `psum` of failure counts is the
    only collective. O(1) decode latency in R on every chip at once."""
    from qcss_tpu.decode.parallel_window import ParallelWindowDecoder
    from qcss_tpu.decode.streaming import sample_phenomenological_stream

    n_dev = mesh.devices.size
    if batch % n_dev:
        raise ValueError(f"batch {batch} not divisible by mesh size {n_dev}")
    local = batch // n_dev
    axis = mesh.axis_names[0]
    ck = (_code_struct_key(code), mesh, local, rounds, float(p), float(q),
          core, buf)
    fn = _PW_MEMORY_CACHE.get(ck)
    if fn is None:
        h = np.asarray(code.raw_parity_check_c2, np.uint8) & 1
        lz = np.atleast_2d(np.asarray(code.z_operator_matrix(), np.uint8) & 1)
        if lz.shape[0] != 1:
            # ParallelWindowDecoder itself rejects multi-observable inputs;
            # truncating silently would report fail rates for observable 0
            # only on a k>1 code (e.g. toric) — refuse instead.
            raise ValueError(
                f"sharded_parallel_window_memory supports k=1 codes only"
                f" (code has {lz.shape[0]} Z observables)")
        pw = ParallelWindowDecoder(h, lz, core=core, buf=buf,
                                   p_space=p, p_time=q)
        h_j = jnp.asarray(h)
        lz_j = jnp.asarray(lz)

        @partial(shard_map, mesh=mesh, in_specs=(P(),),
                 out_specs=(P(), P()), check_vma=False)
        def step(k):
            my_key = jax.random.fold_in(k, jax.lax.axis_index(axis))
            dets, par = sample_phenomenological_stream(
                my_key, jnp.float32(p), jnp.float32(q), local, rounds,
                h_j, lz_j)
            obs, conv = pw.decode_traced(dets)
            fail = (obs & 1).astype(jnp.uint8) != par[:, 0]
            return (jax.lax.psum(jnp.sum(fail.astype(jnp.int32)), axis),
                    jax.lax.psum(1 - conv.astype(jnp.int32), axis))

        fn = jax.jit(step)
        _PW_MEMORY_CACHE[ck] = fn
    fails, unconv = fn(jax.random.key(seed))
    if int(unconv):
        raise RuntimeError(
            f"parallel-window growth cap hit on {int(unconv)} window decodes"
            " — matches ParallelWindowDecoder.decode_stream /"
            " parallel_window_memory_rate semantics")
    return {
        "logical_fail": int(fails) / batch,
        "rounds": rounds,
        "samples": batch,
        "decoder": "device-parallel-window",
    }
