"""Statistical tests of the noise channels: empirical rates must match the
configured probabilities within Monte-Carlo tolerance."""

import jax
import numpy as np
import pytest

from qcss_tpu.sim import noise, tableau as tb


def measure_all(t, key):
    t, outs = tb.measure_many(t, list(range(t.n)), key)
    return np.asarray(outs)


class TestDepolarize1:
    def test_marginal_rates(self):
        # X-or-Y component rate must be 2p/3; Z leaves |0> fixed.
        p = 0.3
        B = 4096
        t = tb.zero_state(B, 1)
        t = noise.depolarize1(t, 0, p, jax.random.key(0))
        outs = measure_all(t, jax.random.key(1))
        rate = outs.mean()
        assert abs(rate - 2 * p / 3) < 0.02

    def test_many_matches_single(self):
        p = 0.2
        B = 4096
        t1 = tb.zero_state(B, 3)
        t1 = noise.depolarize1_many(t1, [0, 1, 2], p, jax.random.key(2))
        outs = measure_all(t1, jax.random.key(3))
        for q in range(3):
            assert abs(outs[:, q].mean() - 2 * p / 3) < 0.03


class TestDepolarize2:
    def test_any_error_rate(self):
        # P(flip on either qubit, measured in Z) = p * (#patterns with an
        # X-component on that qubit) / 15 = p * 8/15 per qubit.
        p = 0.5
        B = 8192
        t = tb.zero_state(B, 2)
        t = noise.depolarize2(t, 0, 1, p, jax.random.key(4))
        outs = measure_all(t, jax.random.key(5))
        for q in range(2):
            assert abs(outs[:, q].mean() - p * 8 / 15) < 0.02


class TestReadout:
    def test_flip_rate(self):
        import jax.numpy as jnp

        bits = jnp.zeros((1 << 16,), jnp.uint8)
        flipped = noise.flip_bits(bits, 0.25, jax.random.key(6))
        assert abs(float(np.asarray(flipped).mean()) - 0.25) < 0.01


class TestNoiseModel:
    def test_trivial_detection(self):
        assert noise.NoiseModel().is_trivial
        assert not noise.NoiseModel(p_gate1=1e-4).is_trivial

    def test_noisy_runner_trivial_equals_clean(self):
        from qcss_tpu.circuits.ir import Circuit

        circ = Circuit().h(0).cnot(0, 1).s(1)
        a = tb.run_circuit(tb.zero_state(2, 2), circ)
        b = noise.run_circuit_noisy(
            tb.zero_state(2, 2), circ, noise.NoiseModel(), jax.random.key(7)
        )
        assert np.array_equal(np.asarray(a.x), np.asarray(b.x))
        assert np.array_equal(np.asarray(a.r), np.asarray(b.r))
