"""Code-family constructor tests (BASELINE configs 1, 2, 4)."""

import numpy as np
import pytest

from qcss_tpu.codes import families
from qcss_tpu.ops import gf2


def check_css_structure(code):
    """Invariants every constructed code must satisfy."""
    h1, h2 = code.parity_check_c1.astype(int), code.parity_check_c2.astype(int)
    r1, r2 = code.r_1, code.r_2
    n = code.n
    # Standard forms.
    assert np.array_equal(h1[:, 0:r1], np.eye(r1))
    assert np.array_equal(h2[:, r1 : r1 + r2], np.eye(r2))
    # Duality preserved through normalization.
    assert not np.any((h1 @ h2.T) & 1)
    # k consistency.
    assert code.k == n - r1 - r2
    # Logical operators commute with checks, anticommute pairwise.
    xbar, zbar = code.x_operator_matrix().astype(int), code.z_operator_matrix().astype(int)
    assert not np.any((h1 @ zbar.T) & 1)
    assert not np.any((h2 @ xbar.T) & 1)
    assert np.array_equal((xbar @ zbar.T) & 1, np.eye(code.k, dtype=int))


class TestSteane:
    def test_structure(self):
        check_css_structure(families.steane())


class TestShor:
    def test_parameters(self):
        code = families.shor()
        assert (code.n, code.k) == (9, 1)
        assert code.r_1 == 2 and code.r_2 == 6
        # Faithful reference semantics: unique-decoding threshold of the
        # degenerate C1 side is 0 (see families.shor docstring).
        assert code.t == 0
        check_css_structure(code)

    def test_c2_corrects_single_x_errors(self):
        code = families.shor()
        _, table = gf2.syndrome_table(code.parity_check_c2)
        # All 9 single-qubit X errors have distinct syndromes.
        weight1 = [e for e in table.values() if e.sum() == 1]
        assert len(weight1) == 9


class TestReedMuller15:
    def test_parameters(self):
        code = families.reed_muller_15()
        assert (code.n, code.k, code.t) == (15, 1, 1)
        assert code.r_1 == 4 and code.r_2 == 10
        check_css_structure(code)

    def test_not_self_dual(self):
        code = families.reed_muller_15()
        assert not code.is_transversal("H")


class TestRotatedSurface:
    @pytest.mark.parametrize("d", [3, 5, 7])
    def test_structure(self, d):
        code = families.rotated_surface(d)
        assert code.n == d * d
        assert code.k == 1
        assert code.r_1 == (d * d - 1) // 2
        assert code.r_2 == (d * d - 1) // 2
        assert code.t == (d - 1) // 2
        check_css_structure(code)

    def test_d3_unique_decoding_threshold(self):
        # The surface code is degenerate: distinct weight-1 errors share a
        # syndrome (differing by a stabilizer), so the reference's
        # collision-stop unique-decoding logic faithfully reports t=0 even
        # though the code corrects (d-1)/2 errors up to degeneracy.
        code = families.rotated_surface(3, t=None, max_table_weight=None)
        assert code.t == 0

    def test_d3_min_weight_table_degeneracy_aware(self):
        code = families.rotated_surface(3)
        h = code.parity_check_c2.astype(int)
        table = gf2.min_weight_table(code.parity_check_c2, max_weight=2)
        # Every weight-1 error's syndrome has a correction that differs from
        # it by a stabilizer (X-type rowspace of... here: nullspace check):
        for e in gf2.weight_w_vectors(code.n, 1):
            syn = (h @ e) & 1
            corr = table[gf2.vec_to_int(syn)]
            residual = (e ^ corr).astype(int)
            # Residual has zero syndrome...
            assert not np.any((h @ residual) & 1)
            # ...and does not flip the logical X operator's partner:
            zbar = code.z_operator_matrix().astype(int)
            # weight-1 X errors: residual must commute with Z̄ (no logical flip)
            assert not np.any((zbar @ residual) & 1)

    def test_d3_lut_available(self):
        code = families.rotated_surface(3, max_table_weight=2)
        assert code.device.lut_c1 is not None


class TestToric:
    @pytest.mark.parametrize("d", [3, 4])
    def test_structure(self, d):
        code = families.toric(d)
        assert code.n == 2 * d * d
        assert code.k == 2
        h1 = code.parity_check_c1.astype(int)
        h2 = code.parity_check_c2.astype(int)
        assert not np.any((h1 @ h2.T) & 1)
        assert gf2.rank(h1) == d * d - 1
        assert gf2.rank(h2) == d * d - 1


class TestDegenerateLUTs:
    def test_surface5_luts_decode_weight2(self):
        """Regression: explicit max_table_weight must build degeneracy-aware
        min-weight tables (the collision-stop table is nearly empty for
        surface codes, silently disabling LUT decode)."""
        import jax.numpy as jnp

        from qcss_tpu.decode import montecarlo as mc

        code = families.rotated_surface(5, max_table_weight=3, t=None)
        dev = code.device
        assert dev.lut_c2.shape[0] == 1 << code.r_2
        # All weight-1 and weight-2 X errors decode without a logical flip.
        errs = []
        for e in gf2.weight_w_vectors(code.n, 1):
            errs.append(e)
        for e in gf2.weight_w_vectors(code.n, 2):
            errs.append(e)
        errs = np.array(errs, dtype=np.uint8)
        fails = mc.decode_failures(
            jnp.asarray(errs), jnp.zeros_like(jnp.asarray(errs)),
            dev.h1, dev.h2, dev.lut_c1, dev.lut_c2,
            dev.logical_x, dev.logical_z,
            dev.flip_z_of_lut_c2, dev.flip_x_of_lut_c1,
        )
        assert int(fails["x_fail"].sum()) == 0


class TestReedMullerFamily:
    def test_m5_parameters(self):
        code = families.reed_muller(5)
        assert code.n == 31
        assert code.k == 1
        assert code.r_1 == 5
        assert code.r_2 == 5 + 10 + 10  # C(5,1)+C(5,2)+C(5,3)
        assert code.t == 1
        check_css_structure(code)

    def test_m4_alias(self):
        a = families.reed_muller(4)
        b = families.reed_muller_15()
        assert np.array_equal(a.parity_check_c1, b.parity_check_c1)
        assert np.array_equal(a.parity_check_c2, b.parity_check_c2)

    def test_m3_rejected(self):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            families.reed_muller(3)
