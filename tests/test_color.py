"""Triangular 6.6.6 color-code family tests (codes/families.py).

The family has no reference counterpart (the reference ships no code
constructors, SURVEY.md §2.5); correctness is pinned computationally:
exhaustive minimum-weight-logical search certifies the distance, the
collision-derived unique-decoding radius certifies t, and the FT stack
runs a deterministic program end-to-end on the d=5 member.
"""

import os
from itertools import combinations, islice

import jax
import numpy as np
import pytest

from qcss_tpu.codes import families

slow = pytest.mark.skipif(
    not os.environ.get("QCSS_SLOW_TESTS"),
    reason="exhaustive d=7 distance certificate; set QCSS_SLOW_TESTS=1",
)


def _min_logical_weight(code, up_to: int) -> int | None:
    """Smallest weight of an X-type logical operator (in ker H_Z with odd
    Z̄ overlap), searching weights 1..up_to by chunked enumeration."""
    h = code.raw_parity_check_c2.astype(np.int64)
    lz = code.z_operator_matrix()[0].astype(np.int64)
    n = code.n
    for w in range(1, up_to + 1):
        it = combinations(range(n), w)
        while True:
            chunk = list(islice(it, 200_000))
            if not chunk:
                break
            v = np.zeros((len(chunk), n), np.int64)
            rows = np.repeat(np.arange(len(chunk)), w)
            v[rows, np.asarray(chunk).ravel()] = 1
            in_ker = ((v @ h.T) % 2 == 0).all(axis=1)
            logical = (v @ lz) % 2 == 1
            if (in_ker & logical).any():
                return w
    return None


class TestConstruction:
    @pytest.mark.parametrize("d,n", [(3, 7), (5, 19), (7, 37)])
    def test_parameters(self, d, n):
        code = families.triangular_color(d, max_table_weight=0, t=(d - 1) // 2)
        assert code.n == n
        assert code.k == 1
        assert code.t == (d - 1) // 2

    def test_self_dual_transversal_set(self):
        # d=3 member is doubly even (all faces weight 4): S transversal.
        c3 = families.triangular_color(3)
        assert {"H", "CZ", "CNOT", "S"} <= c3.transversal_gates
        # d=5 has weight-6 bulk faces: self-dual H/CZ but no S.
        c5 = families.triangular_color(5)
        assert {"H", "CZ", "CNOT"} <= c5.transversal_gates
        assert "S" not in c5.transversal_gates

    def test_collision_radius_matches_distance(self):
        # With no explicit t, the syndrome-table collision stop must find
        # the unique-decoding radius (d-1)/2.
        assert families.triangular_color(3).t == 1
        assert families.triangular_color(5).t == 2

    @pytest.mark.parametrize("d", [3, 5])
    def test_distance_certificate(self, d):
        code = families.triangular_color(d, max_table_weight=0, t=(d - 1) // 2)
        assert _min_logical_weight(code, d) == d

    @slow
    def test_distance_certificate_d7(self):
        code = families.triangular_color(7, max_table_weight=0, t=3)
        assert _min_logical_weight(code, 7) == 7


class TestEndToEnd:
    def test_mc_decode(self):
        code = families.triangular_color(5)
        from qcss_tpu.decode import logical_error_rate

        r0 = logical_error_rate(code, 0.0, samples=1 << 12)
        assert r0["word_fail"] == 0.0
        r = logical_error_rate(code, 0.01, samples=1 << 14, seed=1)
        assert 0 < r["word_fail"] < 0.03

    def test_ft_x_program_exact(self):
        from qcss_tpu.circuits.ir import Program
        from qcss_tpu.ftqc import rewrite_program

        code = families.triangular_color(5)
        p = Program()
        ro = p.declare("ro", 1)
        p.x(0).measure(0, ro[0])
        enc = rewrite_program(p, code, tableau="frames")
        out = enc.run(32, key=jax.random.key(0))
        assert (np.asarray(out["ro"]) == 1).all()

    def test_circuit_level_bp_memory(self):
        """Color codes are NOT matchable (weight-6 faces flip 3 checks per
        error), so the UF/MWPM stack never applies — but the circuit-level
        detector-fault Tanner BP path (`qldpc_memory_experiment`) is
        code-agnostic and decodes them at scale, where the reference's LUT
        architecture (css_code.py:649-685) is exponential in check count.
        Pins d=3 vs d=5 suppression at a fixed operating point."""
        from qcss_tpu.experiments.memory_qldpc import qldpc_memory_experiment
        from qcss_tpu.sim.noise import NoiseModel

        nm = NoiseModel(p_gate2=2e-3, p_meas=5e-3)
        out3 = qldpc_memory_experiment(
            families.triangular_color(3), rounds=3, noise=nm,
            batch=1 << 11, sectors="both", seed=3)
        out5 = qldpc_memory_experiment(
            families.triangular_color(5), rounds=3, noise=nm,
            batch=1 << 11, sectors="both", seed=5)
        # d=3 sits around 2-3% word failure at this point; d=5 well below.
        assert 0.0 < out3["word_fail"] < 0.10
        assert out5["word_fail"] < out3["word_fail"]
        assert out5["bp_converged_z"] > 0.95
        assert out5["bp_converged_x"] > 0.95
