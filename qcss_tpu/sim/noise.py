"""Explicit, seeded Pauli noise channels for the tableau simulator.

The reference's only fault injection is the QVM's built-in decoherence
noise model, configured once per QC object (T1/T2/readout fidelity —
reference: test/test_fidelity.py:76-82). Here noise is a first-class batched
component: channels sample per-sample Pauli flips from explicit
probabilities and inject them via one fused sign update
(`tableau.apply_pauli_frame`), so noisy and noiseless execution share the
same compiled program structure.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from qcss_tpu.sim import tableau as tb


@dataclass(frozen=True)
class NoiseModel:
    """Circuit-level stochastic Pauli noise.

    p_gate1 / p_gate2: depolarizing probability after each 1q/2q gate
    (uniform over the 3 / 15 non-identity Paulis on the touched qubits).
    p_meas: classical bit-flip probability on each measurement outcome.
    p_reset: probability a reset leaves |1> instead of |0> (applied as an
    X flip after the reset).

    pauli1 / pauli2: optional biased per-qubit Pauli rates (p_x, p_y, p_z)
    that OVERRIDE the uniform split — pauli1 for 1q-gate locations, pauli2
    applied independently to each qubit of a 2q-gate location. When set,
    p_gate1/p_gate2 must hold the corresponding totals (they gate whether
    a noise location is emitted at all); use `from_decoherence`, which
    keeps them consistent.

    p_idle / pauli_idle: IDLE noise locations — the per-time-step Pauli
    channel on every data qubit not touched by the current operation
    (consumed by the FTQC macro executor, which charges duration-weighted
    idle channels; see `ftqc.schedule`). The reference has no idle
    locations at all, yet its own comment warns that shared EC ancillas
    "limit parallelism, which significantly reduces fault tolerance"
    (reference: ftqc.py:156-160) — a cost that only becomes measurable
    with these channels.
    """

    p_gate1: float = 0.0
    p_gate2: float = 0.0
    p_meas: float = 0.0
    p_reset: float = 0.0
    pauli1: tuple[float, float, float] | None = None
    pauli2: tuple[float, float, float] | None = None
    p_idle: float = 0.0
    pauli_idle: tuple[float, float, float] | None = None

    @property
    def is_trivial(self) -> bool:
        return not (self.p_gate1 or self.p_gate2 or self.p_meas or self.p_reset)

    @property
    def rate1(self):
        """1q-location channel: (p_x, p_y, p_z) if biased, else the scalar
        uniform-depolarizing total."""
        return self.pauli1 if self.pauli1 is not None else self.p_gate1

    @property
    def rate2(self):
        """2q-location channel: (p_x, p_y, p_z) per touched qubit if
        biased, else the scalar 15-way-depolarizing total."""
        return self.pauli2 if self.pauli2 is not None else self.p_gate2

    @property
    def rate_idle(self):
        """Per-time-step idle channel: (p_x, p_y, p_z) if biased, else the
        scalar uniform total."""
        return self.pauli_idle if self.pauli_idle is not None else self.p_idle

    # -- runtime-rate support (compile-once across noise VALUES) ---------------
    #
    # The FTQC executors jit once per noise STRUCTURE (which channels are
    # present, uniform vs biased) and stream the actual probabilities in as
    # a traced argument: a p-sweep then costs one XLA compile total instead
    # of one per point, and the test suite's many NoiseModel configurations
    # share executors. `static_key()` is the structure, `flat_rates()` the
    # traced payload, `view()` the NoiseModel-shaped façade the engines
    # read values from (guards keep using the static model: traced values
    # have no truthiness).

    def static_key(self) -> tuple:
        return (bool(self.p_gate1), bool(self.p_gate2), bool(self.p_meas),
                bool(self.p_reset), bool(self.p_idle),
                self.pauli1 is not None, self.pauli2 is not None,
                self.pauli_idle is not None)

    _FLAT_LEN = 14

    def flat_rates(self) -> "jax.Array":
        """All rate values as one f32[14] vector (order: p_gate1, p_gate2,
        p_meas, p_reset, p_idle, pauli1, pauli2, pauli_idle; absent biased
        tuples are zero-filled)."""
        def three(t):
            return t if t is not None else (0.0, 0.0, 0.0)

        return jnp.asarray(
            [self.p_gate1, self.p_gate2, self.p_meas, self.p_reset,
             self.p_idle, *three(self.pauli1), *three(self.pauli2),
             *three(self.pauli_idle)], dtype=jnp.float32)

    def view(self, vec) -> "NoiseView":
        """NoiseView over a (possibly traced) `flat_rates()` vector, with
        this model's static structure."""
        def rate(scalar_idx, tuple_off, biased):
            if biased:
                return (vec[tuple_off], vec[tuple_off + 1], vec[tuple_off + 2])
            return vec[scalar_idx]

        return NoiseView(
            p_gate1=self.p_gate1, p_gate2=self.p_gate2,
            is_trivial=self.is_trivial,
            rate1=rate(0, 5, self.pauli1 is not None),
            rate2=rate(1, 8, self.pauli2 is not None),
            rate_idle=rate(4, 11, self.pauli_idle is not None),
            p_meas=vec[2], p_reset=vec[3],
        )

    @classmethod
    def from_decoherence(cls, t1: float, t2: float,
                         gate_time_1q: float = 50e-9,
                         gate_time_2q: float = 150e-9,
                         ro_fidelity: float = 1.0,
                         idle_time: float | None = None) -> "NoiseModel":
        """Pauli-twirled T1/T2 decoherence — the apples-to-apples analogue
        of the reference's QVM noise model (reference:
        test/test_fidelity.py:76-82, which uses pyquil's
        _decoherence_noise_model with T1=T2=300e-6, ro_fidelity=0.99 and
        the default 50ns/150ns gate times).

        Twirling amplitude damping (rate 1/T1) plus dephasing (total
        coherence decay 1/T2) over a gate of duration t gives
        p_x = p_y = (1 - e^(-t/T1))/4 and
        p_z = (1 - e^(-t/T2))/2 - (1 - e^(-t/T1))/4
        (e.g. Ghosh et al., PRA 86, 062318). Requires t2 <= 2*t1 (p_z >= 0,
        clamped against rounding). 2q gates decohere both qubits
        independently for gate_time_2q.
        """
        if t2 > 2 * t1:
            raise ValueError("unphysical decoherence: T2 must be <= 2*T1")

        def twirl(t):
            gamma = 1.0 - math.exp(-t / t1)
            lam = 1.0 - math.exp(-t / t2)
            px = py = gamma / 4.0
            pz = max(lam / 2.0 - gamma / 4.0, 0.0)
            return (px, py, pz)

        r1 = twirl(gate_time_1q)
        r2 = twirl(gate_time_2q)
        # idle_time: duration of ONE idle step (a qubit waiting while one
        # elementary operation runs elsewhere); None = no idle locations,
        # matching both the reference's QVM model and this framework's
        # pre-round-3 behavior.
        ri = twirl(idle_time) if idle_time is not None else None
        return cls(
            p_gate1=sum(r1), p_gate2=sum(r2),
            p_meas=1.0 - ro_fidelity, p_reset=0.0,
            pauli1=r1, pauli2=r2,
            p_idle=sum(ri) if ri is not None else 0.0,
            pauli_idle=ri,
        )


@dataclass(frozen=True)
class NoiseView:
    """A NoiseModel-shaped read surface whose VALUES may be traced arrays
    while the guard fields (`p_gate1`, `p_gate2`, `is_trivial`) stay static
    host floats — what the engines swap in during `MacroExecutor.run_rows`
    so one compiled executor serves every rate assignment of the same
    structure. Value fields: rate1, rate2, rate_idle (scalar or 3-tuple,
    mirroring the model), p_meas, p_reset."""

    p_gate1: float
    p_gate2: float
    is_trivial: bool
    rate1: object
    rate2: object
    rate_idle: object
    p_meas: object
    p_reset: object


def _clamp0(v):
    """max(v, 0) for host floats and traced arrays alike."""
    if isinstance(v, jax.Array):
        return jnp.maximum(v, 0.0)
    return max(v, 0.0)


def compose_pauli(rate, steps: int):
    """The T-fold composition of a single-qubit Pauli channel, in closed
    form via its Pauli-transfer eigenvalues (lambda_x = 1 - 2(p_y + p_z)
    etc. multiply under composition): a qubit idling for `steps` time
    steps sees ONE channel with these rates, so duration-weighted idle
    noise costs a single RNG draw regardless of duration. `rate` is a
    scalar uniform total or a (p_x, p_y, p_z) tuple; the return matches
    the input's form (uniform composes to uniform)."""
    if steps == 1:
        return rate
    if isinstance(rate, tuple):
        px, py, pz = rate
    else:
        px = py = pz = rate / 3.0
    lx = (1.0 - 2.0 * (py + pz)) ** steps
    ly = (1.0 - 2.0 * (px + pz)) ** steps
    lz = (1.0 - 2.0 * (px + py)) ** steps
    px2 = _clamp0((1.0 + lx - ly - lz) / 4.0)
    py2 = _clamp0((1.0 - lx + ly - lz) / 4.0)
    pz2 = _clamp0((1.0 - lx - ly + lz) / 4.0)
    if isinstance(rate, tuple):
        return (px2, py2, pz2)
    return px2 + py2 + pz2


def _thresholds_1q(p):
    """Cumulative event thresholds (x_hi, z_lo, z_hi) over u ~ U[0,1).
    Event layout: X on [0, p_x), Y on [p_x, p_x+p_y), Z on
    [p_x+p_y, p_x+p_y+p_z); an X-component flip fires for u < x_hi =
    p_x+p_y, a Z-component flip for z_lo = p_x <= u < z_hi = p_x+p_y+p_z.
    Scalar p means the uniform p/3 split (bitwise identical to the
    historical thresholds)."""
    if isinstance(p, tuple):
        px, py, pz = p
        return px + py, px, px + py + pz
    return 2.0 * p / 3.0, p / 3.0, p


def depolarize1(t: tb.Tableau, q: int, p, key: jax.Array) -> tb.Tableau:
    """Single-qubit Pauli channel on qubit q: uniform depolarizing for
    scalar p (X/Y/Z each with probability p/3), biased for p=(px,py,pz)."""
    B, n = t.batch, t.n
    u = jax.random.uniform(key, (B,), dtype=jnp.float32)
    x_hi, z_lo, z_hi = (jnp.float32(v) for v in _thresholds_1q(p))
    x_flip = (u < x_hi).astype(jnp.uint8)
    z_flip = ((u >= z_lo) & (u < z_hi)).astype(jnp.uint8)
    qcol = (jnp.arange(n)[None, :] == q).astype(jnp.uint8)
    return tb.apply_pauli_frame(t, x_flip[:, None] * qcol, z_flip[:, None] * qcol)


def depolarize2(t: tb.Tableau, q1: int, q2: int, p, key: jax.Array) -> tb.Tableau:
    """Two-qubit noise location: for scalar p, one of the 15 non-identity
    two-qubit Paulis with probability p/15 each; for p=(px,py,pz), the
    biased 1q channel applied independently to each qubit (the twirled-
    decoherence semantics)."""
    if isinstance(p, tuple):
        return depolarize1_many(t, jnp.asarray([q1, q2], jnp.int32), p, key)
    B, n = t.batch, t.n
    key_u, key_p = jax.random.split(key)
    hit = jax.random.uniform(key_u, (B,), dtype=jnp.float32) < jnp.float32(p)
    # Uniform non-identity pattern: index in [1, 16) -> 2 bits per qubit.
    pat = jax.random.randint(key_p, (B,), 1, 16, dtype=jnp.int32)
    hit = hit.astype(jnp.uint8)
    x1 = (pat & 1).astype(jnp.uint8) * hit
    z1 = ((pat >> 1) & 1).astype(jnp.uint8) * hit
    x2 = ((pat >> 2) & 1).astype(jnp.uint8) * hit
    z2 = ((pat >> 3) & 1).astype(jnp.uint8) * hit
    col1 = (jnp.arange(n)[None, :] == q1).astype(jnp.uint8)
    col2 = (jnp.arange(n)[None, :] == q2).astype(jnp.uint8)
    x_flips = x1[:, None] * col1 ^ x2[:, None] * col2
    z_flips = z1[:, None] * col1 ^ z2[:, None] * col2
    return tb.apply_pauli_frame(t, x_flips, z_flips)


def depolarize1_many(t: tb.Tableau, qubits, p, key: jax.Array) -> tb.Tableau:
    """IID single-qubit Pauli channel on a set of qubits, fused into one
    Pauli-frame injection. p: scalar (uniform) or (px, py, pz) (biased)."""
    B, n = t.batch, t.n
    q = jnp.asarray(qubits, dtype=jnp.int32)
    m = q.shape[0]
    u = jax.random.uniform(key, (B, m), dtype=jnp.float32)
    x_hi, z_lo, z_hi = (jnp.float32(v) for v in _thresholds_1q(p))
    x_hit = (u < x_hi).astype(jnp.uint8)
    z_hit = ((u >= z_lo) & (u < z_hi)).astype(jnp.uint8)
    zeros = jnp.zeros((B, n), dtype=jnp.uint8)
    return tb.apply_pauli_frame(
        t, zeros.at[:, q].set(x_hit), zeros.at[:, q].set(z_hit)
    )


def depolarize2_many(t: tb.Tableau, controls, targets, p, key: jax.Array) -> tb.Tableau:
    """IID two-qubit noise on m disjoint qubit pairs, fused into one
    Pauli-frame injection. Scalar p: 15-way depolarizing per pair;
    p=(px,py,pz): the biased 1q channel independently on every touched
    qubit."""
    if isinstance(p, tuple):
        q_all = jnp.concatenate([
            jnp.asarray(controls, jnp.int32), jnp.asarray(targets, jnp.int32)
        ])
        return depolarize1_many(t, q_all, p, key)
    B, n = t.batch, t.n
    c = jnp.asarray(controls, dtype=jnp.int32)
    q = jnp.asarray(targets, dtype=jnp.int32)
    m = c.shape[0]
    key_u, key_p = jax.random.split(key)
    hit = (
        jax.random.uniform(key_u, (B, m), dtype=jnp.float32) < jnp.float32(p)
    ).astype(jnp.uint8)
    pat = jax.random.randint(key_p, (B, m), 1, 16, dtype=jnp.int32)
    x1 = (pat & 1).astype(jnp.uint8) * hit
    z1 = ((pat >> 1) & 1).astype(jnp.uint8) * hit
    x2 = ((pat >> 2) & 1).astype(jnp.uint8) * hit
    z2 = ((pat >> 3) & 1).astype(jnp.uint8) * hit
    zeros = jnp.zeros((B, n), dtype=jnp.uint8)
    x_flips = zeros.at[:, c].set(x1).at[:, q].set(x2)
    z_flips = zeros.at[:, c].set(z1).at[:, q].set(z2)
    return tb.apply_pauli_frame(t, x_flips, z_flips)


def flip_bits(bits: jax.Array, p, key: jax.Array) -> jax.Array:
    """Classical readout noise: flip each bit with probability p."""
    flips = jax.random.bernoulli(key, p, bits.shape).astype(bits.dtype)
    return bits ^ flips


def noisy_gate(
    t: tb.Tableau, name: str, qubits: tuple[int, ...],
    model: NoiseModel, key: jax.Array,
) -> tb.Tableau:
    """Apply a gate followed by its depolarizing noise location."""
    t = tb.apply_gate(t, name, *qubits)
    if len(qubits) == 1:
        if model.p_gate1:
            t = depolarize1(t, qubits[0], model.rate1, key)
    else:
        if model.p_gate2:
            t = depolarize2(t, qubits[0], qubits[1], model.rate2, key)
    return t


def run_circuit_noisy(
    t: tb.Tableau, circuit, model: NoiseModel, key: jax.Array
) -> tb.Tableau:
    """Run a circuit inserting a depolarizing location after every gate."""
    if model.is_trivial:
        return tb.run_circuit(t, circuit)
    keys = jax.random.split(key, max(len(circuit), 1))
    for k, g in zip(keys, circuit):
        t = noisy_gate(t, g.name, g.qubits, model, k)
    return t


def run_arrays_noisy(
    t: tb.Tableau, ops, q0, q1, model: NoiseModel, key: jax.Array
) -> tb.Tableau:
    """Scanned execution of an array-lowered circuit with a depolarizing
    location after every gate — the jit-friendly counterpart of
    `run_circuit_noisy` (O(1)-size graph for any circuit length)."""
    if model.is_trivial:
        return tb.run_circuit_scanned(t, ops, q0, q1)

    from qcss_tpu.circuits.ir import OPCODES

    two_q_start = OPCODES["CNOT"]
    ops = jnp.asarray(ops, jnp.int32)
    q0 = jnp.asarray(q0, jnp.int32)
    q1 = jnp.asarray(q1, jnp.int32)
    keys = jax.random.split(key, max(int(ops.shape[0]), 1))

    def body(carry, xs):
        op, a, b, k = xs
        carry = jax.lax.switch(op, tb._SCAN_BRANCHES, carry, a, b)
        if model.p_gate1 or model.p_gate2:
            carry = jax.lax.cond(
                op >= two_q_start,
                lambda s: depolarize2(s, a, b, model.rate2, k),
                lambda s: depolarize1(s, a, model.rate1, k),
                carry,
            )
        return carry, None

    t, _ = jax.lax.scan(body, t, (ops, q0, q1, keys))
    return t
