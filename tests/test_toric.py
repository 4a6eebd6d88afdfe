"""k=2 (toric) decode-path tests: syndrome extraction and degeneracy-aware
logical checks for multi-logical-qubit codes (decode-only; the FT transpiler
requires k=1 like the reference — reference: css_code.py:74-75)."""

import jax.numpy as jnp
import numpy as np
import pytest

from qcss_tpu.codes import families
from qcss_tpu.decode import montecarlo as mc
from qcss_tpu.ops import gf2, gf2_jax


@pytest.fixture(scope="module")
def toric3():
    return families.toric(3, max_table_weight=2, t=1)


class TestToricDecode:
    def test_weight1_x_errors_no_logical_flip(self, toric3):
        code = toric3
        dev = code.device
        n = code.n
        errs = np.eye(n, dtype=np.uint8)
        fails = mc.decode_failures(
            jnp.asarray(errs), jnp.zeros((n, n), jnp.uint8),
            dev.h1, dev.h2, dev.lut_c1, dev.lut_c2,
            dev.logical_x, dev.logical_z,
            dev.flip_z_of_lut_c2, dev.flip_x_of_lut_c1,
        )
        assert int(fails["word_fail"].sum()) == 0

    def test_logical_operator_is_undetected_but_flips(self, toric3):
        code = toric3
        dev = code.device
        # A logical X operator: zero syndrome, but logical flip.
        xbar = code.x_operator_matrix()[0:1].astype(np.uint8)
        syn = gf2_jax.syndromes_dense(jnp.asarray(xbar), dev.h2)
        assert not np.asarray(syn).any()
        fails = mc.decode_failures(
            jnp.asarray(xbar), jnp.zeros_like(jnp.asarray(xbar)),
            dev.h1, dev.h2, dev.lut_c1, dev.lut_c2,
            dev.logical_x, dev.logical_z,
            dev.flip_z_of_lut_c2, dev.flip_x_of_lut_c1,
        )
        assert int(fails["x_fail"][0]) == 1

    def test_stabilizer_error_is_harmless(self, toric3):
        code = toric3
        dev = code.device
        # An X-stabilizer row: zero syndrome AND no logical flip.
        stab = code.parity_check_c1[0:1].astype(np.uint8)
        fails = mc.decode_failures(
            jnp.asarray(stab), jnp.zeros_like(jnp.asarray(stab)),
            dev.h1, dev.h2, dev.lut_c1, dev.lut_c2,
            dev.logical_x, dev.logical_z,
            dev.flip_z_of_lut_c2, dev.flip_x_of_lut_c1,
        )
        assert int(fails["word_fail"][0]) == 0

    def test_mc_rate_sane(self, toric3):
        out = mc.logical_error_rate(toric3, 0.03, samples=1 << 14, batch=1 << 14)
        assert 0.0 <= out["word_fail"] < 0.5


class TestFlipTableEquivalence:
    def test_flip_tables_match_full_decode(self):
        code = families.steane()
        dev = code.device
        rng = np.random.default_rng(0)
        x = rng.integers(0, 2, size=(256, 7), dtype=np.uint8)
        z = rng.integers(0, 2, size=(256, 7), dtype=np.uint8)
        full = mc.decode_failures(
            jnp.asarray(x), jnp.asarray(z),
            dev.h1, dev.h2, dev.lut_c1, dev.lut_c2,
            dev.logical_x, dev.logical_z,
        )
        fast = mc.decode_failures(
            jnp.asarray(x), jnp.asarray(z),
            dev.h1, dev.h2, dev.lut_c1, dev.lut_c2,
            dev.logical_x, dev.logical_z,
            dev.flip_z_of_lut_c2, dev.flip_x_of_lut_c1,
        )
        for k in full:
            assert np.array_equal(np.asarray(full[k]), np.asarray(fast[k])), k
