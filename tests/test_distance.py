"""Randomized information-set distance bounds — codes/distance.py.

Every known-distance family in the package is reproduced exactly; the
estimator is a certified upper bound by construction (each candidate is
verified to be a non-stabilizer codeword), so on codes with known d the
assertion est == d is the tightness check and est >= d the soundness
check."""

import numpy as np

from qcss_tpu.codes import families
from qcss_tpu.codes.distance import min_distance_upper_bound as mdub


class TestKnownDistances:
    def test_small_families_exact(self):
        cases = [
            (families.steane(), 3),
            (families.golay(), 7),
            (families.rotated_surface(5), 5),
            (families.triangular_color(7), 7),
            (families.toric(4), 4),
            (families.bb72(), 6),
        ]
        for code, d in cases:
            assert mdub(code, iters=60, seed=0) == d, (code.n, d)

    def test_bb144_exact(self):
        assert mdub(families.bb144(), iters=150, seed=0) == 12

    def test_bb288_exact(self):
        assert mdub(families.bb288(), iters=150, seed=0) == 18

    def test_sector_split(self):
        """Rectangular surface patch: the two sector distances are the
        two lattice dimensions."""
        code = families.rotated_surface_rect(3, 5)
        dx = mdub(code, "x", iters=40, seed=0)
        dz = mdub(code, "z", iters=40, seed=0)
        assert {dx, dz} == {3, 5}
        assert mdub(code, iters=40, seed=0) == 3

    def test_lifted_instance_bound(self):
        """The pinned [[91, 19]] lifted-product instance: weight <= 2
        logicals were excluded by brute force (test_lifted), and the
        estimator certifies d <= 4 — so d is 3 or 4."""
        rng = np.random.default_rng(1)
        a = [[[(int(rng.integers(0, 7)),), (int(rng.integers(0, 7)),)]
              for _ in range(3)] for _ in range(2)]
        b = [[[(int(rng.integers(0, 7)),), (int(rng.integers(0, 7)),)]
              for _ in range(3)] for _ in range(2)]
        lp = families.lifted_product(a, b, (7,))
        assert mdub(lp, iters=100, seed=0) in (3, 4)
