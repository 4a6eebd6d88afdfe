"""Error-rate-curve sweep tests: monotonicity, checkpoint/resume."""

import json

import pytest

from qcss_tpu.codes import families
from qcss_tpu.decode import error_rate_curve, mc_decode_rounds


@pytest.fixture(scope="module")
def steane():
    return families.steane()


class TestCurve:
    def test_monotone_in_p(self, steane):
        points = error_rate_curve(
            steane, [0.0, 0.02, 0.08], samples_per_point=1 << 15, batch=1 << 15
        )
        rates = [pt["word_fail"] for pt in points]
        assert rates[0] == 0.0
        assert rates[0] <= rates[1] <= rates[2]

    def test_checkpoint_resume(self, steane, tmp_path):
        ckpt = str(tmp_path / "curve.jsonl")
        first = error_rate_curve(
            steane, [0.01, 0.03], samples_per_point=1 << 14, batch=1 << 14,
            checkpoint_path=ckpt,
        )
        assert len(open(ckpt).readlines()) == 2
        # Resume with an extended grid: existing points are reused verbatim.
        second = error_rate_curve(
            steane, [0.01, 0.03, 0.05], samples_per_point=1 << 14, batch=1 << 14,
            checkpoint_path=ckpt,
        )
        assert second[0] == first[0]
        assert second[1] == first[1]
        assert len(open(ckpt).readlines()) == 3

    def test_mesh_sweep(self, steane):
        from qcss_tpu.parallel import make_mesh

        points = error_rate_curve(
            steane, [0.05], samples_per_point=1 << 14, batch=1 << 14,
            mesh=make_mesh(),
        )
        assert 0.0 < points[0]["word_fail"] < 0.5


class TestScanRounds:
    def test_matches_step_statistics(self, steane):
        import jax

        counts = mc_decode_rounds(steane, jax.random.key(0), 1 << 14, 4, 0.05)
        total = 4 * (1 << 14)
        rate = int(counts["word_fail"]) / total
        # Analytic ballpark at p=0.05: ~2*21*(2p/3)^2 ≈ 0.047 minus overlap.
        assert 0.01 < rate < 0.15
