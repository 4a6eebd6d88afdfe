"""Fused multi-qubit measurement kernel vs the sequential scan.

The contract is BIT-IDENTITY: given the same key, `measure_many_fused`
must reproduce `tableau_packed.measure_many` exactly — outcomes, tableau
rows, and signs — across random states, qubit subsets, and word counts.
On CPU the kernel runs in interpreter mode (slow, tiny shapes only); the
TPU speed claim is measured by benchmarks/tableau_bench.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcss_tpu.circuits.ir import Circuit
from qcss_tpu.sim import tableau_packed as tp
from qcss_tpu.sim.pallas_measure import measure_many_fused


def _random_state(n, batch, seed, depth=80):
    rng = np.random.default_rng(seed)
    circ = Circuit()
    names = ["I", "X", "Y", "Z", "H", "S", "CNOT", "CZ"]
    for _ in range(depth):
        k = int(rng.integers(0, 8))
        a, b = (int(v) for v in rng.choice(n, 2, replace=False))
        circ.gate(names[k], *((a,) if k < 6 else (a, b)))
    return tp.run_circuit(tp.zero_state(batch, n), circ), rng


@pytest.mark.parametrize("n", [7, 13, 40])
def test_fused_matches_scan_bit_exact(n):
    t, rng = _random_state(n, batch=16, seed=n)
    qubits = jnp.asarray(
        rng.choice(n, min(n, 9), replace=False).astype(np.int32)
    )
    key = jax.random.key(100 + n)
    t_ref, outs_ref = tp.measure_many(t, qubits, key)
    t_new, outs_new = measure_many_fused(t, qubits, key)
    assert (np.asarray(outs_ref) == np.asarray(outs_new)).all()
    assert (np.asarray(t_ref.x) == np.asarray(t_new.x)).all()
    assert (np.asarray(t_ref.z) == np.asarray(t_new.z)).all()
    assert (np.asarray(t_ref.r) == np.asarray(t_new.r)).all()


def test_fused_full_block_measurement():
    """Measure every qubit (the FT measure_block shape): |0>^n state with
    X applied to a few qubits — deterministic outcomes."""
    n = 13
    t = tp.zero_state(8, n)
    circ = Circuit().x(2).x(5).x(12)
    t = tp.run_circuit(t, circ)
    qubits = jnp.arange(n, dtype=jnp.int32)
    _, outs = measure_many_fused(t, qubits, jax.random.key(0))
    expected = np.zeros(n, np.uint8)
    expected[[2, 5, 12]] = 1
    assert (np.asarray(outs) == expected[None, :]).all()


def test_fused_random_outcomes_use_scan_keys():
    """|+> qubits: outcomes are the same Bernoulli draws as the scan path
    (key-splitting discipline is shared)."""
    n = 5
    t = tp.run_circuit(tp.zero_state(32, n), Circuit().h(0).h(3))
    qubits = jnp.asarray([0, 3], dtype=jnp.int32)
    key = jax.random.key(7)
    _, outs_ref = tp.measure_many(t, qubits, key)
    _, outs_new = measure_many_fused(t, qubits, key)
    assert (np.asarray(outs_ref) == np.asarray(outs_new)).all()
    assert 0 < np.asarray(outs_new).mean() < 1  # genuinely random
