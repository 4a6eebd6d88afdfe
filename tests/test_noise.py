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


class TestDecoherenceModel:
    def test_twirl_rates_formula(self):
        import math

        from qcss_tpu.sim.noise import NoiseModel

        t1, t2, tg = 300e-6, 300e-6, 50e-9
        m = NoiseModel.from_decoherence(t1, t2, gate_time_1q=tg)
        gamma = 1 - math.exp(-tg / t1)
        lam = 1 - math.exp(-tg / t2)
        px, py, pz = m.pauli1
        assert abs(px - gamma / 4) < 1e-15
        assert abs(py - gamma / 4) < 1e-15
        assert abs(pz - (lam / 2 - gamma / 4)) < 1e-15
        assert abs(m.p_gate1 - (px + py + pz)) < 1e-15
        # T1-only limit (T2 = 2*T1): p_z = 0... the boundary is allowed
        m2 = NoiseModel.from_decoherence(1e-4, 2e-4, gate_time_1q=tg)
        assert m2.pauli1[2] >= 0.0

    def test_unphysical_t2_raises(self):
        import pytest

        from qcss_tpu.sim.noise import NoiseModel

        with pytest.raises(ValueError, match="T2"):
            NoiseModel.from_decoherence(1e-4, 3e-4)

    def test_biased_channel_statistics(self):
        """pauli1=(p,0,0) must produce only X flips; (0,0,p) only Z."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from qcss_tpu.sim import noise as noise_mod
        from qcss_tpu.sim import tableau as tb

        B = 4096
        p = 0.3
        # X-biased: measure in Z basis after the channel on |0> -> flip rate p
        t = tb.zero_state(B, 1)
        t = noise_mod.depolarize1(t, 0, (p, 0.0, 0.0), jax.random.key(0))
        _, out = tb.measure_z(t, 0, jax.random.key(1))
        rate = float(np.asarray(out).mean())
        assert abs(rate - p) < 0.03
        # Z-biased: |0> is a Z eigenstate -> no outcome change
        t = tb.zero_state(B, 1)
        t = noise_mod.depolarize1(t, 0, (0.0, 0.0, p), jax.random.key(2))
        _, out = tb.measure_z(t, 0, jax.random.key(3))
        assert float(np.asarray(out).mean()) == 0.0

    def test_uniform_tuple_matches_scalar_stream(self):
        """(p/3, p/3, p/3) thresholds are bitwise identical to scalar p."""
        import jax
        import numpy as np

        from qcss_tpu.sim import noise as noise_mod
        from qcss_tpu.sim import tableau as tb

        B, p = 512, 0.2
        k = jax.random.key(7)
        t1 = noise_mod.depolarize1(tb.zero_state(B, 3), 1, p, k)
        t2 = noise_mod.depolarize1(tb.zero_state(B, 3), 1, (p / 3, p / 3, p / 3), k)
        assert (np.asarray(t1.r) == np.asarray(t2.r)).all()

    def test_encoded_program_runs_under_decoherence(self):
        """End-to-end: the FT X program under the twirled reference-QVM
        noise model (T1=T2=300us, ro=0.99) stays overwhelmingly correct."""
        import jax

        from qcss_tpu.circuits import Program
        from qcss_tpu.codes import families
        from qcss_tpu.ftqc import rewrite_program
        from qcss_tpu.sim.noise import NoiseModel

        model = NoiseModel.from_decoherence(300e-6, 300e-6, ro_fidelity=0.99)
        prog = Program()
        ro = prog.declare("ro", 1)
        prog.x(0).measure(0, ro[0])
        enc = rewrite_program(prog, families.steane(), noise=model)
        res = enc.run(64, key=jax.random.key(5))
        assert res["ro"][:, 0].mean() > 0.9
