"""Pallas kernel equivalence tests (interpret mode on the CPU backend; the
hardware path is exercised by benchmarks/syndrome_sweep.py on the chip)."""

import jax.numpy as jnp
import numpy as np
import pytest

from qcss_tpu.codes import families
from qcss_tpu.decode.lut import decode_corrections
from qcss_tpu.ops import gf2, gf2_jax, pallas_gf2


class TestPackedSyndromeKernel:
    @pytest.mark.parametrize("n,r", [(7, 3), (33, 10), (121, 60)])
    def test_matches_xla_packed(self, n, r):
        rng = np.random.default_rng(n * 100 + r)
        h = rng.integers(0, 2, size=(r, n), dtype=np.uint8)
        e = rng.integers(0, 2, size=(1024, n), dtype=np.uint8)
        ep, hp = gf2_jax.pack_bits(e), gf2_jax.pack_bits(h)
        want = np.asarray(gf2_jax.syndromes_packed(ep, hp))
        got = np.asarray(pallas_gf2.syndromes_packed_pallas(ep, hp))
        assert np.array_equal(want, got)

    def test_bad_tile_rejected(self):
        e = jnp.zeros((100, 1), jnp.uint32)
        h = jnp.zeros((3, 1), jnp.uint32)
        with pytest.raises(ValueError):
            pallas_gf2.syndromes_packed_pallas(e, h, tile_b=512)


class TestFusedDecodeKernel:
    def test_steane_residuals(self):
        code = families.steane()
        rng = np.random.default_rng(5)
        lut = gf2.correction_lut(code.parity_check_c2, code.c2_syndromes)
        e = rng.integers(0, 2, size=(512, 7), dtype=np.uint8)
        resid = pallas_gf2.decode_residual_packed_pallas(
            gf2_jax.pack_bits(e),
            gf2_jax.pack_bits(code.parity_check_c2),
            gf2_jax.pack_bits(lut),
        )
        resid_bits = np.asarray(gf2_jax.unpack_bits(resid, 7))
        syn = gf2_jax.syndromes_dense(jnp.asarray(e), code.device.h2)
        corr = np.asarray(decode_corrections(syn, code.device.lut_c2))
        assert np.array_equal(resid_bits, e ^ corr)

    def test_weight1_residuals_are_stabilisers(self):
        # Weight-1 errors decode exactly: residual must be zero.
        code = families.steane()
        e = np.eye(7, dtype=np.uint8)
        e = np.repeat(e, 74, axis=0)[:512]  # pad to tile multiple
        lut = gf2.correction_lut(code.parity_check_c2, code.c2_syndromes)
        resid = pallas_gf2.decode_residual_packed_pallas(
            gf2_jax.pack_bits(e),
            gf2_jax.pack_bits(code.parity_check_c2),
            gf2_jax.pack_bits(lut),
        )
        assert not np.asarray(resid).any()
