"""Utility tests: throughput counters and the profiler hook."""

import time

from qcss_tpu.utils import Throughput, trace


class TestThroughput:
    def test_accumulates(self):
        meter = Throughput()
        with meter.measure(n_samples=100):
            time.sleep(0.01)
        with meter.measure(n_samples=300):
            time.sleep(0.01)
        assert meter.total_samples == 400
        assert meter.total_seconds >= 0.02
        assert meter.samples_per_sec > 0

    def test_empty_is_zero(self):
        assert Throughput().samples_per_sec == 0.0


class TestTrace:
    def test_noop_without_dir(self):
        ran = []
        with trace(None):
            ran.append(1)
        assert ran == [1]

    def test_with_dir(self, tmp_path):
        # jax.profiler writes trace events under the directory.
        with trace(str(tmp_path)):
            import jax.numpy as jnp

            (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
        assert any(tmp_path.iterdir())
