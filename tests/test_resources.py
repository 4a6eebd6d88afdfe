"""Logical resource estimation (`experiments/resources.py`).

The fit/solve math is tested exactly on synthetic points; the report is
exercised end to end with pre-measured failure points (no MC) plus one
tiny real-MC smoke, so the suite cost stays seconds.
"""

import math

import pytest

from qcss_tpu.experiments import (
    fit_suppression,
    logical_resource_report,
    program_stats,
    required_distance,
)
from qcss_tpu.experiments.logical import LogicalProgram


class TestProgramStats:
    def test_counts_and_volume(self):
        prog = LogicalProgram(3, 3).x(0).cnot(0, 1).t(1).mzz(1, 2)
        s = program_stats(prog)
        assert s["op_counts"] == {"x": 1, "cnot": 1, "t": 1, "mzz": 1}
        assert s["t_count"] == 1
        assert s["d"] == 3 and s["n_data"] == 3
        assert s["grid_qubits"] == prog.n
        assert s["total_rounds"] == sum(ph.rounds for ph in prog._phases)
        assert s["spacetime_volume"] == s["grid_qubits"] * s["total_rounds"]
        model = prog.build()
        assert s["fault_locations"] == model.F.shape[1]
        assert s["detectors"] == model.F.shape[0]
        assert s["observables"] == model.obs.shape[0]

    def test_stats_idempotent_after_measure(self):
        prog = LogicalProgram(3, 2).cnot(0, 1).measure()
        s1 = program_stats(prog)
        s2 = program_stats(prog)
        assert s1 == s2


class TestFitAndSolve:
    def test_exact_two_point_fit(self):
        # fail(d) = 0.1 / 10^((d+1)/2 - 1): Lambda = 10 exactly
        pts = {3: 1e-2, 5: 1e-3}
        fit = fit_suppression(pts)
        assert fit["Lambda"] == pytest.approx(10.0, rel=1e-9)
        # predicted fail at d=7 continues the law
        pred7 = fit["A"] * fit["Lambda"] ** (-4)
        assert pred7 == pytest.approx(1e-4, rel=1e-9)

    def test_three_point_least_squares(self):
        lam, a = 7.0, 0.5
        pts = {d: a * lam ** (-(d + 1) / 2) for d in (3, 5, 7)}
        fit = fit_suppression(pts)
        assert fit["Lambda"] == pytest.approx(lam, rel=1e-9)
        assert fit["A"] == pytest.approx(a, rel=1e-9)

    def test_required_distance(self):
        fit = fit_suppression({3: 1e-2, 5: 1e-3})
        assert required_distance(1e-2, fit) == 3
        assert required_distance(5e-3, fit) == 5
        assert required_distance(1e-6, fit) == 11
        # exactly-at-target counts as met
        at = fit["A"] * fit["Lambda"] ** (-3)
        assert required_distance(at, fit) == 5

    def test_guards(self):
        with pytest.raises(ValueError, match=">= 2 distances"):
            fit_suppression({3: 1e-2})
        with pytest.raises(ValueError, match="not in \\(0, 1\\)"):
            fit_suppression({3: 1e-2, 5: 0.0})
        sub = fit_suppression({3: 1e-3, 5: 1e-2})  # anti-suppression
        with pytest.raises(ValueError, match="Lambda"):
            required_distance(1e-6, sub)
        with pytest.raises(ValueError, match="target"):
            required_distance(0.0, fit_suppression({3: 1e-2, 5: 1e-3}))


class TestReport:
    def test_report_from_premeasured_points(self):
        factory = {"p_out": 1e-9, "injections_per_state": 100.0}
        rep = logical_resource_report(
            lambda d: LogicalProgram(d, 2).cnot(0, 1).t(1),
            2e-3, target=1e-5, fails={3: 1e-2, 5: 1e-3},
            factory=factory)
        assert rep["d_star"] == 9
        assert rep["predicted_word_fail"] == pytest.approx(1e-5)
        assert rep["at_d_star"]["d"] == 9
        assert rep["at_d_star"]["t_count"] == 1
        m = rep["magic"]
        assert m["total_injections"] == pytest.approx(100.0)
        assert m["factory_meets_budget"]  # 1e-9 <= 1e-5 / 2 ops
        # budget check flips when the factory is too dirty
        rep2 = logical_resource_report(
            lambda d: LogicalProgram(d, 2).cnot(0, 1).t(1),
            2e-3, target=1e-5, fails={3: 1e-2, 5: 1e-3},
            factory={"p_out": 1e-3, "injections_per_state": 10.0})
        assert not rep2["magic"]["factory_meets_budget"]

    def test_report_mc_smoke(self):
        # Real MC at one tiny shape pair: high p so both points have
        # failures; only the plumbing (not the physics) is under test.
        rep = logical_resource_report(
            lambda d: LogicalProgram(d, 2).cnot(0, 1),
            1.5e-2, target=0.5, distances=(3, 5),
            batch=1 << 9, seed=7)
        assert set(rep["mc"]) == {3, 5}
        assert 0 < rep["fit"]["Lambda"]
        assert rep["d_star"] >= 3
