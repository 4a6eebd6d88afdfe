"""Fidelity-harness tests (tier 4 in the reference's test strategy —
reference: test/test_fidelity.py, which prints counts and asserts nothing).

Here the harness is exercised at small scale WITH assertions: statistical
tolerance on the raw pipeline, determinism checks on the encoded one."""

import jax

from benchmarks.fidelity import encoded_x_program_error_rate, raw_x_program_error_rate
from qcss_tpu.sim.noise import NoiseModel


class TestRawPipeline:
    def test_noiseless_raw_is_exact(self):
        rate = raw_x_program_error_rate(256, NoiseModel(), jax.random.key(0))
        assert rate == 0.0

    def test_noisy_raw_rate_matches_model(self):
        # X gate then measure: logical error iff the depolarizing location
        # flips the outcome (X/Y leave it flipped... Z no) -> error rate
        # = 2p/3 + p_meas (to first order).
        p = 0.05
        model = NoiseModel(p_gate1=p)
        rate = raw_x_program_error_rate(1 << 14, model, jax.random.key(1))
        assert abs(rate - 2 * p / 3) < 0.01


class TestEncodedPipeline:
    def test_noiseless_encoded_is_exact(self):
        rate, elapsed = encoded_x_program_error_rate(
            16, NoiseModel(), jax.random.key(2)
        )
        assert rate == 0.0
        assert elapsed > 0
