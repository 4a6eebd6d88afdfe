"""Magic-state injection: noisy logical |A⟩ preparation, measured exactly.

A factory needs two numbers the distillation analysis (`ftqc/magic.py`)
takes as given: the error rate ε of the RAW encoded magic states feeding
level 0, and their acceptance cost. This experiment measures both for any
CSS code, on the Pauli-frame engine (`sim.frame`), with every Clifford
location noisy. The reference has no analogue — it supports no
non-Clifford gate at all (reference: css_code.py:433-434).

Protocol (encode-then-grow injection, the standard scheme):
    1. all qubits noisily reset to |0⟩,
    2. noisy H on the input qubit q₀ (the code's standard-form logical
       input coordinate, `encoding.encode_state_network`),
    3. physical T on q₀ — ideal gate plus a twirled Z channel of rate
       `p_t` (the noisy-T model),
    4. the noisy encode_state_network grows q₀'s state onto the block,
    5. `extractions` rounds of real noisy syndrome extraction (both
       sectors); POST-SELECT on all syndromes trivial,
    6. perfect final decode (LUT corrections on both sectors); read the
       residual logical Pauli (pX, pY, pZ) on the injected qubit.

Exactness. Every operation except T is Clifford and every fault is
Pauli, so frame propagation is exact — with two observations making the
single T location exact too:
  * Any X deviation on q₀ entering the T gate acts on |+⟩, which X
    stabilizes: the deviation is deleted (identity up to global phase)
    rather than conjugated through T. The surviving Z component commutes
    with T exactly.
  * The noisy T itself is modeled as ideal T followed by a Pauli
    channel; dephasing-dominated hardware is Z-biased, and a full
    channel (px', py', pz') twirled about the |A⟩ axis folds to an
    effective Z rate anyway — pass that as `p_t`.
Reference outcomes are deterministic throughout (stabilizer measurements
on a codespace state), satisfying the frame-soundness rules.

The headline figure is the twirled single-state error rate
    ε = (pX + pY)/2 + pZ
(error probability of Pauli P on |A⟩ is 1 − |⟨A|P|A⟩|²: ½ for X and Y,
1 for Z), which is exactly the `p_in` of `magic.distill_exact`;
`factory_report` composes the two into an end-to-end physical-T-to-
target-fidelity resource estimate.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from qcss_tpu.circuits import encoding
from qcss_tpu.experiments.memory import x_extraction_circuit, z_extraction_circuit
from qcss_tpu.ftqc import magic
from qcss_tpu.sim import frame as fr
from qcss_tpu.sim import noise as noise_mod


def _injection_kernel(key, p_t, code, noise, h_arrays, grow_arrays,
                      ext_arrays, q0: int, batch: int, extractions: int,
                      n: int, n_anc: int, h1, h2, lut1, lut2, xbar, zbar):
    from qcss_tpu.ops import gf2_jax

    data = jnp.arange(n, dtype=jnp.int32)
    anc = jnp.arange(n, n + n_anc, dtype=jnp.int32)
    k_reset, k_h, k_t, k_grow, k_rounds = jax.random.split(key, 5)

    f = fr.zero_frames(batch, n + n_anc)
    f = fr.reset_qubits(f, data, k_reset, noise.p_reset)
    f = fr.run_arrays_noisy(f, *h_arrays, noise, k_h)
    # T location: X deviations act on |+⟩ (its stabilizer) — delete them;
    # then the twirled noisy T injects Z with probability p_t.
    zt = jax.random.bernoulli(k_t, p_t, (batch, 1)).astype(jnp.uint8)
    f = fr.Frames(f.x.at[:, q0].set(0), f.z)
    f = fr.inject_flips(f, jnp.array([q0], jnp.int32), jnp.zeros_like(zt), zt)
    f = fr.run_arrays_noisy(f, *grow_arrays, noise, k_grow)

    def round_body(carry, k):
        f = carry
        k1, k2, k3 = jax.random.split(k, 3)
        f = fr.run_arrays_noisy(f, *ext_arrays, noise, k1)
        f, syn = fr.measure_deviations(f, anc, k2, noise.p_meas)
        f = fr.reset_qubits(f, anc, k3, noise.p_reset)
        return f, syn

    keys = jax.random.split(k_rounds, extractions)
    f, syns = jax.lax.scan(round_body, f, keys)  # [E, B, n_anc]
    accept = jnp.all(syns == 0, axis=(0, 2))

    # Perfect final decode: correct each sector with its LUT, then read
    # the residual logical Pauli on the injected qubit.
    fz = f.z[:, :n]
    fx = f.x[:, :n]
    syn_z = gf2_jax.syndromes_dense(fz, h1)
    fz = fz ^ jnp.take(lut1, gf2_jax.bits_to_index(syn_z), axis=0)
    syn_x = gf2_jax.syndromes_dense(fx, h2)
    fx = fx ^ jnp.take(lut2, gf2_jax.bits_to_index(syn_x), axis=0)
    log_z = (fz.astype(jnp.int32) @ xbar) & 1  # residual Z anticommuting X̄
    log_x = (fx.astype(jnp.int32) @ zbar) & 1  # residual X anticommuting Z̄
    return accept, log_x == 1, log_z == 1


def magic_injection_experiment(code, noise: noise_mod.NoiseModel,
                               p_t: float, batch: int, *,
                               extractions: int = 1, seed: int = 0,
                               return_samples: bool = False) -> dict:
    """Run the injection protocol; see module docstring.

    Returns acceptance rate and the POST-SELECTED logical Pauli rates
    (p_x, p_y, p_z) plus the twirled single-state error rate ``eps``.
    With trivial Clifford noise, eps == p_t exactly (a Z at the T
    location propagates to Z̄ with a trivial syndrome).
    """
    if noise.p_idle:
        raise ValueError("injection experiment charges no idle locations; "
                         "p_idle must be 0")
    n = code.n
    net, inputs = encoding.encode_state_network(code)
    q0 = inputs[0]
    h_prep = encoding.Circuit().h(q0)
    ext = x_extraction_circuit(code)
    r1 = code.parity_check_c1.shape[0]
    for g in z_extraction_circuit(code, anc_offset=n + r1).gates:
        ext.gates.append(g)
    n_anc = r1 + code.parity_check_c2.shape[0]
    dev = code.device
    if dev.lut_c1 is None or dev.lut_c2 is None:
        raise ValueError("injection needs full syndrome LUTs "
                         "(construct the code with max_table_weight=None)")
    kernel = jax.jit(partial(
        _injection_kernel, code=code, noise=noise,
        h_arrays=tuple(map(jnp.asarray, h_prep.to_arrays())),
        grow_arrays=tuple(map(jnp.asarray, net.to_arrays())),
        ext_arrays=tuple(map(jnp.asarray, ext.to_arrays())),
        q0=q0, batch=batch, extractions=extractions, n=n, n_anc=n_anc,
        h1=jnp.asarray(code.parity_check_c1, jnp.uint8),
        h2=jnp.asarray(code.parity_check_c2, jnp.uint8),
        lut1=dev.lut_c1, lut2=dev.lut_c2,
        xbar=jnp.asarray(code.x_operator_matrix()[0], jnp.int32),
        zbar=jnp.asarray(code.z_operator_matrix()[0], jnp.int32)))
    accept, lx, lz = kernel(jax.random.key(seed), p_t)
    acc = int(jnp.sum(accept))
    nx = int(jnp.sum(accept & lx & ~lz))
    nz = int(jnp.sum(accept & lz & ~lx))
    ny = int(jnp.sum(accept & lx & lz))
    d = max(acc, 1)
    px, py, pz = nx / d, ny / d, nz / d
    out = {
        "p_t": float(p_t),
        "p_accept": acc / batch,
        "p_x": px, "p_y": py, "p_z": pz,
        "eps": (px + py) / 2.0 + pz,
        "accepted": acc,
        "samples": batch,
        "extractions": extractions,
    }
    if return_samples:
        out["accept"] = np.asarray(accept)
        out["log_x"] = np.asarray(lx)
        out["log_z"] = np.asarray(lz)
    return out


def factory_report(code, noise: noise_mod.NoiseModel, p_t: float, *,
                   levels: int = 2, batch: int = 1 << 20,
                   extractions: int = 1, distill_code=None,
                   seed: int = 0) -> dict:
    """End-to-end magic-state factory estimate: measured injection ε on
    `code` feeds the exact distillation cascade (`magic.distill_cascade`,
    on `distill_code`, default [[15,1,3]]). ``injections_per_state`` is
    the expected number of injection ATTEMPTS consumed per final output,
    folding the cascade's raw-state cost with the injection acceptance."""
    inj = magic_injection_experiment(code, noise, p_t, batch,
                                     extractions=extractions, seed=seed)
    cascade = magic.distill_cascade(inj["eps"], levels, code=distill_code)
    return {
        "injection": inj,
        "cascade": cascade,
        "p_out": cascade[-1]["p_out"],
        "injections_per_state":
            cascade[-1]["raw_cost"] / max(inj["p_accept"], 1e-30),
    }
