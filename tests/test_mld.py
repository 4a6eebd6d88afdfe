"""Exact maximum-likelihood decoder tests (decode/mld.py)."""

import numpy as np
import pytest

from qcss_tpu.codes import families
from qcss_tpu.decode.mld import MLDecoder, mld_logical_error_rate
from qcss_tpu.ops import gf2


def _brute_scores(h, stab, lerr, lobs, p):
    """[2^rank, C] exact per-syndrome class probabilities by summing
    over ALL 2^n errors (float64), plus the syndrome indexing used."""
    h = np.asarray(h, np.uint8)
    n = h.shape[1]
    errs = ((np.arange(1 << n, dtype=np.uint64)[:, None]
             >> np.arange(n, dtype=np.uint64)[None, :]) & 1).astype(np.uint8)
    syn = (errs @ h.T) & 1
    pw2 = (1 << np.arange(h.shape[0], dtype=np.int64))
    sidx = syn.astype(np.int64) @ pw2
    w = errs.sum(1)
    prob = (p ** w) * ((1 - p) ** (n - w))
    # class of e relative to the zero error: its lobs parity minus the
    # representative's is handled by comparing to e0 outside; here we
    # bucket by absolute lobs parity, which labels classes because
    # stabilizers are lobs-transparent
    par = (errs @ np.atleast_2d(lobs).T) & 1
    k = par.shape[1]
    cidx = par.astype(np.int64) @ (1 << np.arange(k, dtype=np.int64))
    np_idx = sidx * (1 << k) + cidx
    flat = np.zeros((int(sidx.max()) + 1) * (1 << k), np.float64)
    np.add.at(flat, np_idx, prob)
    return flat.reshape(-1, 1 << k), sidx, par


class TestExactness:
    @pytest.mark.parametrize("maker", [families.steane,
                                       lambda: families.rotated_surface(3)])
    def test_matches_brute_force(self, maker):
        """Device class scores equal the full 2^n enumeration (up to the
        class-independent constant) and the argmax class agrees on every
        realizable syndrome."""
        code = maker()
        p = 0.08
        h = np.asarray(code.parity_check_c2, np.uint8)
        lz = code.z_operator_matrix()
        ml = MLDecoder.for_code(code, p=p)
        flat, sidx, par = _brute_scores(
            h, code.parity_check_c1, code.x_operator_matrix(), lz, p)
        # one representative error per realizable syndrome
        syns, first = np.unique(sidx, return_index=True)
        errs = ((first[:, None] >> np.arange(code.n)[None, :]) & 1
                ).astype(np.uint8)  # error index IS its bit pattern
        syn_bits = (errs @ h.T) & 1
        flips, scores = ml.decode_flips(syn_bits, return_scores=True)
        n = code.n
        const = n * np.log(1 - p)
        # device class c scores the coset of (e0 ^ L_c); its ABSOLUTE
        # lobs parity is par(e0) ^ c (lx @ lz.T == I, checked below),
        # so remap device columns onto the brute absolute-parity buckets
        e0 = ml._representatives(syn_bits)
        par0 = ((e0 @ np.atleast_2d(lz).T) & 1).astype(np.int64)
        par0_idx = par0 @ (1 << np.arange(code.k, dtype=np.int64))
        C = 1 << code.k
        for i, s in enumerate(syns):
            brute = flat[s]
            dev = np.zeros(C)
            for c in range(C):
                dev[int(par0_idx[i]) ^ c] = np.exp(scores[c, i] + const)
            realizable = brute > 0
            assert np.allclose(dev[realizable], brute[realizable],
                               rtol=2e-3), (i, dev, brute)
            gap = np.sort(brute)[-1] / max(np.sort(brute)[-2], 1e-300)
            if gap > 1 + 1e-6:
                assert int(np.argmax(dev)) == int(np.argmax(brute)), i
        pair = (np.asarray(code.x_operator_matrix()) @ lz.T) & 1
        assert (pair == np.eye(code.k, dtype=np.uint8)).all()

    def test_flips_score_failures_correctly(self):
        """Weight-1 errors always decode exactly (flips == true parity)."""
        code = families.rotated_surface(3)
        h = np.asarray(code.parity_check_c2, np.uint8)
        lz = code.z_operator_matrix()
        ml = MLDecoder.for_code(code, p=1e-3)
        errs = np.eye(code.n, dtype=np.uint8)
        flips = ml.decode_flips((errs @ h.T) & 1)
        assert (flips == ((errs @ lz.T) & 1)).all()


class TestOptimality:
    def test_ml_not_worse_than_lut(self):
        """Paired-shot comparison: ML failure <= min-weight LUT failure
        (strictly better at high p where degeneracy matters)."""
        code = families.rotated_surface(3)
        out = mld_logical_error_rate(code, 0.10, batch=1 << 13, seed=1)
        assert out["word_fail_ml"] <= out["word_fail_lut"] + 0.003, out
        out2 = mld_logical_error_rate(code, 0.15, batch=1 << 13, seed=2)
        assert out2["word_fail_ml"] < out2["word_fail_lut"], out2

    def test_soft_priors_run_and_default_matches(self):
        code = families.steane()
        p = 0.05
        h = np.asarray(code.parity_check_c2, np.uint8)
        ml = MLDecoder.for_code(code, p=p)
        rng = np.random.default_rng(0)
        errs = (rng.random((256, code.n)) < p).astype(np.uint8)
        syn = (errs @ h.T) & 1
        base = ml.decode_flips(syn)
        llr = np.full((256, code.n), np.log(p / (1 - p)), np.float32)
        assert (ml.decode_flips(syn, llr=llr) == base).all()

    def test_k2_code_shapes(self):
        code = families.toric(3)
        ml = MLDecoder.for_code(code, p=0.05)
        rng = np.random.default_rng(3)
        errs = (rng.random((128, code.n)) < 0.05).astype(np.uint8)
        h = np.asarray(code.parity_check_c2, np.uint8)
        flips = ml.decode_flips((errs @ h.T) & 1)
        assert flips.shape == (128, code.k)

    def test_too_large_refused(self):
        code = families.golay()
        bb = families.bb72()
        with pytest.raises(ValueError, match="class"):
            MLDecoder.for_code(bb, p=0.01)  # k=12 class explosion
        with pytest.raises(ValueError, match="exponential"):
            MLDecoder(bb.parity_check_c2, bb.parity_check_c1,
                      bb.x_operator_matrix()[:1],
                      bb.z_operator_matrix()[:1], p=0.01)  # 2^30 cosets
        # golay itself is fine (r=11)
        MLDecoder.for_code(code, p=0.01)


class TestSharded:
    def test_sharded_mld_memory(self):
        """Exact ML decoding fused inside the shard_map (the eleventh
        mesh pipeline): matches the host MLDecoder's failure rate on the
        same operating point, and the device decode path is bit-identical
        to the host path on identical syndromes."""
        import jax
        import jax.numpy as jnp

        from qcss_tpu.parallel import make_mesh, sharded_mld_memory

        code = families.rotated_surface(3)
        p = 0.08
        out = sharded_mld_memory(code, make_mesh(), p=p, batch=8 * 1024,
                                 seed=1)
        assert out["decoder"] == "device-mld"
        ref = mld_logical_error_rate(code, p, batch=1 << 13, seed=2)
        assert abs(out["word_fail"] - ref["word_fail_ml"]) < 0.02

        ml = MLDecoder.for_code(code, p=p)
        rng = np.random.default_rng(5)
        errs = (rng.random((512, code.n)) < p).astype(np.uint8)
        h = np.asarray(code.parity_check_c2, np.uint8)
        syn = (errs @ h.T) & 1
        llr = np.full((512, code.n), np.log(p / (1 - p)), np.float32)
        dev = np.asarray(jax.jit(ml.device_decode_fn())(
            jnp.asarray(syn), jnp.asarray(llr)))
        assert (dev == ml.decode_flips(syn)).all()


class TestColorCode:
    def test_ml_beats_bp_on_color5(self):
        """Exact ML on the [[19,1,5]] color code (non-matchable, beyond
        the LUT's unique-decoding weight): X-sector failure below the
        BP+OSD per-sector rate at the same p, and 5x below the
        reference-style LUT (measured: 2.4% vs 2.8% vs 12.0% at
        p=0.05)."""
        from qcss_tpu.decode.bp import bp_logical_error_rate

        code = families.triangular_color(5)
        out = mld_logical_error_rate(code, 0.05, batch=1 << 13, seed=0)
        bp = bp_logical_error_rate(code, 0.05, batch=1 << 13, seed=0)
        assert out["word_fail_ml"] <= bp["x_fail"] + 0.01, (out, bp)
        assert out["word_fail_ml"] < 0.5 * out["word_fail_lut"], out


class TestQldpcGap:
    def test_ml_anchors_bp_osd_on_small_hgp(self):
        """The measured BP+OSD-vs-ML accuracy gap on a genuine k>1
        qLDPC instance — the [[34,4,3]] hypergraph product of the
        [5,2,3] classical code (r_x=15 -> 2^15 cosets, within the ML
        enumerator's reach). Same shots, same (non-redundant vs
        redundant) check conventions as production: exact ML must be
        at least as good as BP+OSD-0 (measured at 8k shots, p=0.02/
        0.04/0.06: 1.87%/7.3%/15.8% ML vs 2.44%/9.5%/19.1% OSD-0;
        OSD-2 closes ~25% of the gap)."""
        import jax
        import jax.numpy as jnp

        from qcss_tpu.decode.bp import BPDecoder
        from qcss_tpu.ops import gf2_jax

        h = np.array([[1, 1, 1, 0, 0], [0, 1, 1, 1, 0], [0, 0, 1, 1, 1]],
                     np.uint8)
        code = families.hypergraph_product(h, h, distance=3)
        h2 = getattr(code, "redundant_parity_check_c2",
                     code.parity_check_c2)
        lz = code.z_operator_matrix()
        p, B = 0.05, 1 << 10
        ml = MLDecoder.for_code(code, p=p)
        bp = BPDecoder(h2, p, logicals=lz, iters=64, alpha=0.8, osd=True)
        x_err = (jax.random.uniform(jax.random.key(5), (B, code.n))
                 < p).astype(jnp.uint8)
        syn = gf2_jax.syndromes_dense(
            x_err, jnp.asarray(code.parity_check_c2))
        syn_r = gf2_jax.syndromes_dense(x_err, jnp.asarray(h2))
        truth = (np.asarray(x_err, np.int64)
                 @ lz.T.astype(np.int64)) & 1
        fail_ml = ((ml.decode_flips(np.asarray(syn)) ^ truth)
                   .any(axis=1)).mean()
        flips_bp, _ = bp.decode_obs(np.asarray(syn_r))
        fail_bp = ((np.asarray(flips_bp) ^ truth).any(axis=1)).mean()
        assert fail_ml <= fail_bp + 2.0 / B, (fail_ml, fail_bp)


class TestErasure:
    def test_pure_erasure_below_d_exact(self):
        """Heralded erasure as soft input: erased qubits get llr = 0
        (error equally likely as not), unerased keep the tiny base
        rate. Any erasure pattern of weight < d then decodes exactly —
        the ML form of the erasure-uniqueness property the UF pipeline
        shows with near-free edge weights (experiments/erasure.py)."""
        code = families.rotated_surface(5)
        h = np.asarray(code.parity_check_c2, np.uint8)
        lz = code.z_operator_matrix()
        ml = MLDecoder.for_code(code, p=1e-3)
        rng = np.random.default_rng(0)
        n = code.n
        base = np.log(1e-3 / (1 - 1e-3))
        errs, llrs = [], []
        for _ in range(200):
            er = rng.choice(n, size=4, replace=False)
            e = np.zeros(n, np.uint8)
            e[er] = rng.integers(0, 2, 4)
            llr = np.full(n, base, np.float32)
            llr[er] = 0.0
            errs.append(e)
            llrs.append(llr)
        errs = np.stack(errs)
        llrs = np.stack(llrs)
        flips = ml.decode_flips((errs @ h.T) & 1, llr=llrs)
        assert (flips == ((errs @ lz.T) & 1)).all()
