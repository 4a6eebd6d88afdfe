"""Profiling and throughput instrumentation.

`trace` wraps `jax.profiler.trace` so hot paths can be captured for
TensorBoard/Perfetto; `Throughput` is the samples/sec counter used by the
benchmark harnesses.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Profile the enclosed block with the JAX profiler when `log_dir` is
    given; no-op otherwise."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


@dataclass
class Throughput:
    """Wall-clock samples/sec counter.

    >>> meter = Throughput()
    >>> with meter.measure(n_samples=batch):
    ...     run_step()
    >>> meter.samples_per_sec
    """

    total_samples: int = 0
    total_seconds: float = 0.0
    _t0: float = field(default=0.0, repr=False)

    @contextlib.contextmanager
    def measure(self, n_samples: int):
        t0 = time.perf_counter()
        yield
        self.total_seconds += time.perf_counter() - t0
        self.total_samples += n_samples

    @property
    def samples_per_sec(self) -> float:
        return self.total_samples / self.total_seconds if self.total_seconds else 0.0
