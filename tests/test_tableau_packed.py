"""Packed-tableau engine: exact state equivalence against the unpacked
engine on random circuits with interleaved measurements (same PRNG keys
drive both, so stochastic outcomes must match bit-for-bit)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcss_tpu.circuits.ir import Circuit
from qcss_tpu.sim import tableau as tb
from qcss_tpu.sim import tableau_packed as tp

GATES_1Q = ["H", "S", "X", "Y", "Z"]
GATES_2Q = ["CNOT", "CZ"]


def random_circuit(rng, n, depth):
    circ = Circuit()
    for _ in range(depth):
        if n >= 2 and rng.random() < 0.45:
            q1, q2 = rng.choice(n, size=2, replace=False)
            circ.gate(str(rng.choice(GATES_2Q)), int(q1), int(q2))
        else:
            circ.gate(str(rng.choice(GATES_1Q)), int(rng.integers(n)))
    return circ


def assert_states_equal(packed: tp.PackedTableau, unpacked: tb.Tableau):
    up = tp.to_unpacked(packed)
    assert np.array_equal(np.asarray(up.x), np.asarray(unpacked.x))
    assert np.array_equal(np.asarray(up.z), np.asarray(unpacked.z))
    assert np.array_equal(np.asarray(up.r), np.asarray(unpacked.r))


class TestGateEquivalence:
    @pytest.mark.parametrize("n", [3, 7, 33, 40])
    def test_random_circuit_states_match(self, n):
        rng = np.random.default_rng(n)
        circ = random_circuit(rng, n, 60)
        u = tb.run_circuit(tb.zero_state(2, n), circ)
        p = tp.run_circuit(tp.zero_state(2, n), circ)
        assert_states_equal(p, u)

    def test_round_trip_conversion(self):
        rng = np.random.default_rng(1)
        circ = random_circuit(rng, 9, 30)
        u = tb.run_circuit(tb.zero_state(3, 9), circ)
        assert_states_equal(tp.from_unpacked(u), u)


class TestMeasurementEquivalence:
    @pytest.mark.parametrize("seed", range(8))
    def test_interleaved_measurements_match(self, seed):
        rng = np.random.default_rng(200 + seed)
        n = 6
        u = tb.zero_state(4, n)
        p = tp.zero_state(4, n)
        key = jax.random.key(seed)
        for _ in range(5):
            circ = random_circuit(rng, n, 12)
            u = tb.run_circuit(u, circ)
            p = tp.run_circuit(p, circ)
            q = int(rng.integers(n))
            key, sub = jax.random.split(key)
            u, ou = tb.measure_z(u, q, sub)
            p, op = tp.measure_z(p, q, sub)
            assert np.array_equal(np.asarray(ou), np.asarray(op))
            assert_states_equal(p, u)

    def test_reset_matches(self):
        n = 5
        rng = np.random.default_rng(3)
        circ = random_circuit(rng, n, 20)
        u = tb.run_circuit(tb.zero_state(8, n), circ)
        p = tp.run_circuit(tp.zero_state(8, n), circ)
        key = jax.random.key(9)
        for q in range(n):
            key, sub = jax.random.split(key)
            u = tb.reset_z(u, q, sub)
            p = tp.reset_z(p, q, sub)
        assert_states_equal(p, u)
        key, sub = jax.random.split(key)
        u2, outs = tb.measure_many(u, list(range(n)), sub)
        assert not np.asarray(outs).any()


class TestPauliFrame:
    def test_packed_frame_matches_unpacked(self):
        from qcss_tpu.ops import gf2_jax

        n = 37
        rng = np.random.default_rng(4)
        circ = random_circuit(rng, n, 40)
        u = tb.run_circuit(tb.zero_state(2, n), circ)
        p = tp.from_unpacked(u)
        x_f = rng.integers(0, 2, (2, n)).astype(np.uint8)
        z_f = rng.integers(0, 2, (2, n)).astype(np.uint8)
        u = tb.apply_pauli_frame(u, jnp.asarray(x_f), jnp.asarray(z_f))
        p = tp.apply_pauli_frame(
            p, gf2_jax.pack_bits(x_f), gf2_jax.pack_bits(z_f)
        )
        assert_states_equal(p, u)


class TestCrossWordBoundaries:
    def test_gates_across_word_boundary(self):
        # CNOT/CZ with control and target in different words.
        n = 40
        u = tb.zero_state(1, n)
        p = tp.zero_state(1, n)
        circ = (
            Circuit().h(0).cnot(0, 35).cz(31, 32).s(33).h(39).cnot(39, 1)
        )
        u = tb.run_circuit(u, circ)
        p = tp.run_circuit(p, circ)
        assert_states_equal(p, u)
        key = jax.random.key(0)
        for q in (0, 31, 32, 35, 39):
            key, sub = jax.random.split(key)
            u, ou = tb.measure_z(u, q, sub)
            p, op = tp.measure_z(p, q, sub)
            assert np.array_equal(np.asarray(ou), np.asarray(op))
        assert_states_equal(p, u)
