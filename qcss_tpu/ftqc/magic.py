"""Magic-state distillation — the universality layer.

The reference's non-Clifford path is an explicit stub: `_apply_universal`
returns None and no T gate, magic state, or distillation machinery exists
anywhere (reference: css_code.py:433-434). This module supplies the
standard route to universality for CSS frameworks: Bravyi-Kitaev 15-to-1
magic-state distillation on the [[15,1,3]] quantum Reed-Muller code
(quant-ph/0403025), generalized to any k=1 triorthogonal CSS code the
classifier accepts (`CSSCode.transversal_t_power`).

Protocol model (the standard twirled-input analysis)
----------------------------------------------------
Inputs are noisy T states that have been Clifford-twirled to Z-diagonal
form: rho = (1-p)|A><A| + p Z|A><A|Z with |A> = T|+>. The distillation
circuit teleport-injects one input onto each physical qubit of an encoded
|+̄>, realizing transversal T (= logical T^c, c odd) — a faulty input
contributes exactly a Z error at its injection site. Because transversal
T preserves the codespace (triorthogonality), the code's X stabilizers
remain deterministic +1: measuring them detects the injected Z errors.
Postselect on the trivial syndrome and read out the logical qubit:

    accept(e)  =  [H_1 · e = 0]          (e in the X-stabilizer dual)
    error(e)   =  [e in z̄ + rowspace(H_2)]  =  accept(e) AND <x̄, e> = 1

For the [[15,1,3]] code the error coset has weight enumerator starting
35·w^3, giving the famous p_out ≈ 35 p^3 with acceptance ≈ 1 - 15 p.
Both are computed EXACTLY here by coset weight enumeration (2^{r_2}
elements), alongside a batched device Monte-Carlo and an iterated-cascade
resource model.

Circuit-level tier (`distill_circuit`)
--------------------------------------
The same protocol with every Clifford operation noisy, on the Pauli-frame
engine (`sim.frame`): noisy |+̄> preparation network, Z-channel injections
(the twirled noisy inputs — exact, since T is diagonal and every
downstream check is X-type), `extractions` rounds of the real X-syndrome
extraction circuit under circuit noise, and a final transversal X-basis
readout whose H_1-syndrome must also vanish. The perfect-T deletion is
exact for these statistics: all injected/circuit faults are Pauli, the
reference outcomes are deterministic (+1 stabilizers on a codespace
state), and no X-type fault ever crosses a T gate location. Output error
floors at the Clifford-noise level instead of following 35 p^3 — the
quantity a factory designer actually needs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from qcss_tpu.circuits import encoding
from qcss_tpu.errors import UnsupportedGateError
from qcss_tpu.experiments.memory import x_extraction_circuit
from qcss_tpu.sim import frame as fr
from qcss_tpu.sim import noise as noise_mod


def _default_code():
    from qcss_tpu.codes import families

    return families.reed_muller_15()


def _check_distillable(code) -> None:
    power = code.transversal_t_power
    if power is None or power % 2 == 0:
        raise UnsupportedGateError(
            "distillation needs a k=1 CSS code with transversal T "
            "(odd transversal_t_power); got "
            f"{power!r} — the reference supports no non-Clifford gate at "
            "all (reference: css_code.py:433-434)"
        )


def distillation_enumerators(code) -> tuple[np.ndarray, np.ndarray]:
    """Weight enumerators (W0, W1) of the Z-stabilizer rowspace and of the
    logical-Z coset z̄ + rowspace(H_2): W0[w] = #codewords of weight w.
    Together they define the accept set null(H_1) = rowspace(H_2) ∪ coset
    (k=1), hence the exact distillation map."""
    h2 = np.asarray(code.parity_check_c2, np.uint8) & 1
    zbar = np.asarray(code.z_operator_matrix()[0], np.uint8) & 1
    basis = h2[np.any(h2, axis=1)]
    r = basis.shape[0]
    if r > 22:
        raise ValueError(f"coset enumeration over 2^{r} elements refused")
    span = np.zeros((1, code.n), np.uint8)
    for row in basis:
        span = np.concatenate([span, span ^ row])
    n = code.n
    w0 = np.bincount(span.sum(axis=1, dtype=np.int64), minlength=n + 1)
    w1 = np.bincount((span ^ zbar).sum(axis=1, dtype=np.int64), minlength=n + 1)
    return w0, w1


def distill_exact(p: float, code=None) -> dict[str, float]:
    """Exact one-level distillation map at input Z-error rate p:
    acceptance probability, output error rate, and expected raw inputs
    consumed per accepted output (n / p_accept)."""
    code = _default_code() if code is None else code
    _check_distillable(code)
    w0, w1 = distillation_enumerators(code)
    n = code.n
    w = np.arange(n + 1, dtype=np.float64)
    mass = np.power(p, w) * np.power(1.0 - p, n - w)
    ok = float((w0 * mass).sum())
    bad = float((w1 * mass).sum())
    return {
        "p_in": float(p),
        "p_accept": ok + bad,
        "p_out": bad / (ok + bad),
        "cost": n / (ok + bad),
    }


@partial(jax.jit, static_argnames=("batch", "n"))
def _mc_kernel(key, p, h1t, xbar, batch: int, n: int):
    e = jax.random.bernoulli(key, p, (batch, n)).astype(jnp.uint8)
    syn = (e.astype(jnp.int32) @ h1t) & 1
    accept = jnp.all(syn == 0, axis=1)
    err = (e.astype(jnp.int32) @ xbar) & 1
    return jnp.sum(accept), jnp.sum(accept & (err == 1))


def distill_mc(p: float, batch: int, code=None, seed: int = 0) -> dict[str, float]:
    """Batched device Monte-Carlo of the protocol-level map (noiseless
    Cliffords): sample e ~ Bern(p)^n, accept on trivial X-syndrome, error
    = <x̄, e>. Cross-checks `distill_exact`."""
    code = _default_code() if code is None else code
    _check_distillable(code)
    h1t = jnp.asarray(code.parity_check_c1.T, jnp.int32)
    xbar = jnp.asarray(code.x_operator_matrix()[0], jnp.int32)
    acc, bad = _mc_kernel(jax.random.key(seed), p, h1t, xbar, batch, code.n)
    acc, bad = int(acc), int(bad)
    return {
        "p_in": float(p),
        "p_accept": acc / batch,
        "p_out": bad / max(acc, 1),
        "accepted": acc,
        "samples": batch,
    }


def distill_cascade(p0: float, levels: int, code=None) -> list[dict[str, float]]:
    """Iterate the exact map: level i distills level i-1 outputs. Each
    entry adds `raw_cost` — expected RAW (level-0) input states per
    accepted output at that level, Π_j n / p_accept_j."""
    code = _default_code() if code is None else code
    out = []
    p, raw = p0, 1.0
    for _ in range(levels):
        step = distill_exact(p, code)
        raw *= step["cost"]
        step["raw_cost"] = raw
        out.append(step)
        p = step["p_out"]
    return out


def _circuit_kernel(key, p_in, inject, code, noise, prep_arrays, ext_arrays,
                    h1t, xbar, batch: int, extractions: int, n: int, r1: int):
    data = jnp.arange(n, dtype=jnp.int32)
    anc = jnp.arange(n, n + r1, dtype=jnp.int32)
    k_prep, k_inj, k_rounds = jax.random.split(key, 3)

    f = fr.zero_frames(batch, n + r1)
    f = fr.run_arrays_noisy(f, *prep_arrays, noise, k_prep)
    if inject is None:
        zf = jax.random.bernoulli(k_inj, p_in, (batch, n)).astype(jnp.uint8)
    else:
        zf = jnp.asarray(inject, jnp.uint8)
    f = fr.inject_flips(f, data, jnp.zeros_like(zf), zf)

    def round_body(carry, k):
        f = carry
        k1, k2, k3 = jax.random.split(k, 3)
        f = fr.run_arrays_noisy(f, *ext_arrays, noise, k1)
        f, syn = fr.measure_deviations(f, anc, k2, noise.p_meas)
        f = fr.reset_qubits(f, anc, k3, noise.p_reset)
        return f, syn

    keys = jax.random.split(k_rounds, extractions)
    f, syns = jax.lax.scan(round_body, f, keys)  # [E, B, r1]
    # Perfect transversal X-basis readout: Z errors flip X outcomes, so
    # the per-qubit deviations are the data Z frame.
    w = f.z[:, :n].astype(jnp.int32)
    syn_final = (w @ h1t) & 1
    obs = (w @ xbar) & 1
    accept = jnp.all(syns == 0, axis=(0, 2)) & jnp.all(syn_final == 0, axis=1)
    return accept, obs == 1


def distill_circuit(noise: noise_mod.NoiseModel, p_in: float, batch: int,
                    code=None, extractions: int = 1, seed: int = 0,
                    inject=None, return_samples: bool = False):
    """Circuit-level distillation on the frame engine (see module
    docstring): noisy |+̄> prep + twirled-input Z injections + noisy
    X-extraction rounds + perfect final X readout, postselecting on every
    syndrome. `inject` replaces the Bernoulli(p_in) injection with an
    explicit [batch, n] Z-flip array (exhaustive tests).

    Returns acceptance rate and the conditional output Z-error rate —
    with `noise` trivial this reproduces `distill_exact(p_in)`; with
    circuit noise it exhibits the Clifford-noise floor."""
    code = _default_code() if code is None else code
    _check_distillable(code)
    n, r1 = code.n, code.r_1
    prep = encoding.encode_plus_network(code).to_arrays()
    ext = x_extraction_circuit(code).to_arrays()
    h1t = jnp.asarray(code.parity_check_c1.T, jnp.int32)
    xbar = jnp.asarray(code.x_operator_matrix()[0], jnp.int32)

    kernel = jax.jit(partial(
        _circuit_kernel, code=code, noise=noise,
        prep_arrays=tuple(map(jnp.asarray, prep)),
        ext_arrays=tuple(map(jnp.asarray, ext)),
        h1t=h1t, xbar=xbar,
        batch=batch, extractions=extractions, n=n, r1=r1))
    accept, err = kernel(jax.random.key(seed), p_in, inject)
    acc = int(jnp.sum(accept))
    bad = int(jnp.sum(accept & err))
    out = {
        "p_in": float(p_in),
        "p_accept": acc / batch,
        "p_out": bad / max(acc, 1),
        "accepted": acc,
        "samples": batch,
        "extractions": extractions,
    }
    if return_samples:
        out["accept"] = np.asarray(accept)
        out["error"] = np.asarray(err)
    return out
