"""Soft-readout (analog measurement) decoding — experiments/soft.py.

Tiers tested: the Gaussian readout model's calibration (hard-decision
error rate, posterior flip probability), the per-shot override wiring
(static-valued overrides must reproduce the static decode exactly), and
the physics payoff (soft beats hard-decision decoding on the same shots
in a measurement-noise-dominated regime, for both the union-find and BP
tiers)."""

import numpy as np
import pytest

from qcss_tpu.codes import families
from qcss_tpu.experiments import soft


class TestReadoutModel:
    def test_flip_prob_matches_monte_carlo(self):
        rng = np.random.default_rng(7)
        sigma = 0.62
        u = 1.0 + sigma * rng.standard_normal(1 << 20)
        emp = float((u < 0).mean())
        assert abs(emp - soft.flip_prob(sigma)) < 1e-3

    def test_sigma_for_flip_prob_inverts(self):
        for q in (0.3, 0.1, 0.02, 1e-3):
            assert abs(soft.flip_prob(soft.sigma_for_flip_prob(q)) - q) \
                < 1e-12

    def test_posterior_flip_prob_is_the_true_posterior(self):
        """Bin observed amplitudes; the empirical flip fraction in each
        bin must match the likelihood-ratio posterior."""
        rng = np.random.default_rng(3)
        sigma = 0.7
        u = 1.0 + sigma * rng.standard_normal(1 << 21)
        amp, flip = np.abs(u), u < 0
        for lo in (0.05, 0.25, 0.45, 0.65):
            sel = (amp >= lo) & (amp < lo + 0.1)
            emp = float(flip[sel].mean())
            pred = float(soft.posterior_flip_prob(amp[sel], sigma).mean())
            assert abs(emp - pred) < 0.015, (lo, emp, pred)


class TestOverrideWiring:
    """A per-shot override whose values equal the static configuration
    must reproduce the static decode exactly — the wiring guard."""

    def test_uf_static_shot_weights_identity(self):
        import jax
        import jax.numpy as jnp

        from qcss_tpu.decode.uf import (
            UFDecoder, graph_from_checks, spacetime_graph)

        code = families.rotated_surface(3)
        h, lz = code.raw_parity_check_c2, code.z_operator_matrix()
        q_eff = soft.flip_prob(0.62)
        graph = spacetime_graph(h, lz, 3, p_space=5e-3, p_time=q_eff)
        dec = UFDecoder(graph)
        dets, _, _ = map(np.asarray, soft._sample_soft_stream(
            jax.random.key(0), jnp.float32(5e-3), jnp.float32(0.62),
            256, 3, code.n, jnp.asarray(h, jnp.uint8),
            jnp.asarray(lz, jnp.uint8)))
        _, obs0 = dec.decode_batch(dets, want_corrections=False)
        sw = np.tile(np.asarray(graph.edge_weight), (256, 1))
        _, obs1 = dec.decode_batch(dets, want_corrections=False,
                                   shot_weights=sw)
        np.testing.assert_array_equal(obs0, obs1)

    def test_bp_static_priors_identity(self):
        import jax
        import jax.numpy as jnp

        from qcss_tpu.decode.bp import BPDecoder, spacetime_tanner

        code = families.rotated_surface(3)
        h, lz = code.raw_parity_check_c2, code.z_operator_matrix()
        q_eff = soft.flip_prob(0.62)
        tan, priors, obs, _ = spacetime_tanner(h, 3, 5e-3, q_eff,
                                               logicals=lz)
        dec = BPDecoder(tan, priors, logicals=obs, iters=32, osd=True)
        dets, _, _ = map(np.asarray, soft._sample_soft_stream(
            jax.random.key(1), jnp.float32(5e-3), jnp.float32(0.62),
            256, 3, code.n, jnp.asarray(h, jnp.uint8),
            jnp.asarray(lz, jnp.uint8)))
        f0, c0 = dec.decode_obs(dets)
        f1, c1 = dec.decode_obs(dets, priors=np.tile(priors, (256, 1)))
        np.testing.assert_array_equal(f0, f1)
        np.testing.assert_array_equal(c0, c1)


class TestCircuitTier:
    def test_analog_sampler_flip_rate(self):
        """With ONLY analog measurement noise, the sampled syndrome
        deviations are pure hard-decision flips at rate q_eff — the
        sampler/decoder-model lockstep (the DEM is built at
        p_meas = flip_prob(sigma))."""
        import jax
        import jax.numpy as jnp
        from functools import partial

        from qcss_tpu.experiments.memory import (
            x_extraction_circuit, z_extraction_circuit)
        from qcss_tpu.experiments.memory_xz import _sample_two_sector
        from qcss_tpu.sim import frame as fr
        from qcss_tpu.sim.noise import NoiseModel

        code = families.rotated_surface(3)
        hz, hx = code.raw_parity_check_c2, code.raw_parity_check_c1
        rz, rx = hz.shape[0], hx.shape[0]
        n = code.n
        z_arrays = tuple(map(jnp.asarray, z_extraction_circuit(
            code, checks=hz).to_arrays()))
        x_arrays = tuple(map(jnp.asarray, x_extraction_circuit(
            code, anc_offset=n + rz, checks=hx).to_arrays()))
        sigma = 0.7
        fn = jax.jit(
            partial(_sample_two_sector, code=code, noise=NoiseModel(),
                    z_arrays=z_arrays, x_arrays=x_arrays,
                    z_comp=fr.maybe_compile(z_arrays, n + rz + rx),
                    x_comp=fr.maybe_compile(x_arrays, n + rz + rx),
                    rz=rz, rx=rx, sigma=sigma),
            static_argnames=("batch", "rounds"))
        syns_z, syns_x, x_err, z_err, amps_z, amps_x = map(
            np.asarray, fn(jax.random.key(5), 4096, 4))
        assert not x_err.any() and not z_err.any()
        q_eff = soft.flip_prob(sigma)
        for syns in (syns_z, syns_x):
            emp = float(syns.mean())
            assert abs(emp - q_eff) < 0.005, (emp, q_eff)
        # flips and amplitudes are consistent: flip iff the signed
        # analog value was negative, i.e. P(flip | amp) as modeled
        pf = soft.posterior_flip_prob(amps_z, sigma)
        # high-confidence amplitudes almost never flipped
        sel = pf.transpose(1, 0, 2) < 1e-3
        assert float(syns_z[sel].mean()) < 5e-3

    def test_dem_tier_soft_not_worse(self):
        """Circuit level, d=3: the DEM's time-like edges merge several
        non-measurement mechanisms, so the analog gain is small but must
        not be negative (measured 111 vs 116 / 8k at this seed)."""
        from qcss_tpu.sim.noise import NoiseModel

        code = families.rotated_surface(3)
        nm = NoiseModel(p_gate2=2e-3, p_reset=2e-3)
        kw = dict(rounds=4, noise=nm, sigma=0.65, batch=1 << 13, seed=2)
        rs = soft.soft_xz_memory_experiment(code, soft=True, **kw)
        rh = soft.soft_xz_memory_experiment(code, soft=False, **kw)
        assert rs["word_fail"] <= rh["word_fail"], (rs, rh)

    def test_bp_tier_soft_helps(self):
        """Circuit-level BP, d=3: per-shot measurement priors improve
        min-sum convergence (the low-variance signal) and do not hurt
        the failure rate (measured 34 vs 37 / 4k, conv 96.9 vs 94.5%)."""
        from qcss_tpu.sim.noise import NoiseModel

        code = families.rotated_surface(3)
        nm = NoiseModel(p_gate2=2e-3, p_reset=2e-3)
        kw = dict(rounds=3, noise=nm, sigma=0.75, batch=1 << 12, seed=3)
        bs = soft.soft_qldpc_circuit_memory(code, soft=True, **kw)
        bh = soft.soft_qldpc_circuit_memory(code, soft=False, **kw)
        assert bs["word_fail"] <= bh["word_fail"], (bs, bh)
        assert bs["bp_converged_z"] > bh["bp_converged_z"] + 0.01


class TestDeviceSoft:
    """Per-shot weights on the device union-find kernels
    (`device_uf.decode_labels(shot_weights=...)`) and the fused
    on-device analog pipeline."""

    def _weighted_setup(self, rounds=3, sigma=0.7, p=5e-3, batch=4096):
        import dataclasses

        import jax
        import jax.numpy as jnp

        from qcss_tpu.decode.uf import graph_from_checks, spacetime_graph

        code = families.rotated_surface(3)
        h, lz = code.raw_parity_check_c2, code.z_operator_matrix()
        q = soft.flip_prob(sigma)
        g = spacetime_graph(h, lz, rounds, p_space=p, p_time=q)
        base_ln = np.log(max(p, q))
        n_space = graph_from_checks(h, lz).num_edges * (rounds + 1)
        probs = np.concatenate([np.full(n_space, p),
                                np.full(g.num_edges - n_space, q)])
        w_static = soft._llr_weights(probs, base_ln, resolution=8)
        g = dataclasses.replace(g, edge_weight=w_static)
        dets, par, amp = map(np.asarray, soft._sample_soft_stream(
            jax.random.key(3), jnp.float32(p), jnp.float32(sigma),
            batch, rounds, code.n,
            jnp.asarray(np.asarray(h, np.uint8)),
            jnp.asarray(np.asarray(lz, np.uint8))))
        pf = soft.posterior_flip_prob(amp.reshape(batch, -1), sigma)
        sw = np.tile(w_static, (batch, 1))
        sw[:, n_space:] = soft._llr_weights(
            np.clip(pf, 1e-9, 0.499), base_ln, resolution=8)
        return g, dets, par, sw, w_static

    def test_static_shot_weights_bit_identical(self):
        import jax.numpy as jnp

        from qcss_tpu.decode import device_uf

        g, dets, _, _, w_static = self._weighted_setup(batch=512)
        dg = device_uf.build_device_graph(g, stencil=False)
        l0, c0 = device_uf.decode_labels(dg, jnp.asarray(dets))
        l1, c1 = device_uf.decode_labels(
            dg, jnp.asarray(dets),
            shot_weights=jnp.asarray(np.tile(w_static, (512, 1)),
                                     jnp.int32))
        np.testing.assert_array_equal(np.asarray(l0[0]), np.asarray(l1[0]))
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))

    def test_weighted_device_matches_host(self):
        """Same shots, same per-shot soft weights: the device kernel and
        the host union-find agree on >99% of observable flips and on the
        failure count to within a few shots (they may legally differ on
        heavy patterns — different valid matchings)."""
        import jax.numpy as jnp

        from qcss_tpu.decode import device_uf
        from qcss_tpu.decode.uf import UFDecoder, _pack_parity

        g, dets, par, sw, _ = self._weighted_setup()
        _, obs_h = UFDecoder(g).decode_batch(
            dets, want_corrections=False, shot_weights=sw)
        dg = device_uf.build_device_graph(g, stencil=False)
        labels, conv = device_uf.decode_labels(
            dg, jnp.asarray(dets), shot_weights=jnp.asarray(sw, jnp.int32))
        assert bool(np.asarray(conv).all())
        obs_d = np.asarray(labels[0]).astype(np.uint32)
        assert float((obs_d == obs_h).mean()) > 0.99
        pb = _pack_parity(par)
        fh, fd = int((obs_h != pb).sum()), int((obs_d != pb).sum())
        assert abs(fh - fd) <= max(5, 0.3 * fh), (fh, fd)

    def test_fused_device_rate(self):
        """The one-compiled-program pipeline (sample -> per-shot weights
        -> decode -> count) runs and lands in the host pipeline's
        failure range."""
        code = families.rotated_surface(3)
        out = soft.soft_device_memory_rate(
            code, 5e-3, 0.7, rounds=3, batch=2048, reps=2, seed=1)
        assert 0.0 < out["logical_fail"] < 0.05
        assert out["samples"] == 4096


class TestSoftBeatsHard:
    def test_uf_tier(self):
        """d=5, measurement-noise-dominated (q_eff = 7.7% vs p = 0.3%):
        the analog side information substantially cuts the logical
        failure rate on the same shots (measured 20 vs 32 / 32k at this
        seed and weight resolution 8 — both arms share the resolution,
        so the gain is the analog information itself)."""
        code = families.rotated_surface(5)
        kw = dict(rounds=5, samples=1 << 15, batch=1 << 13, seed=1)
        rs = soft.soft_phenomenological_error_rate(
            code, 3e-3, 0.7, soft=True, **kw)
        rh = soft.soft_phenomenological_error_rate(
            code, 3e-3, 0.7, soft=False, **kw)
        fs = rs["logical_fail"] * rs["samples"]
        fh = rh["logical_fail"] * rh["samples"]
        assert fh >= 25, (fs, fh)     # the regime has enough events
        assert fs < 0.75 * fh, (fs, fh)

    def test_bp_tier(self):
        """Same regime, spacetime BP: per-shot priors must not hurt the
        failure rate and must HELP min-sum convergence (the low-variance
        signal; measured 0.84 vs 0.79 over 4k shots)."""
        code = families.rotated_surface(5)
        kw = dict(rounds=5, samples=1 << 12, batch=1 << 12, seed=1)
        bs = soft.soft_bp_phenomenological_error_rate(
            code, 3e-3, 0.7, soft=True, **kw)
        bh = soft.soft_bp_phenomenological_error_rate(
            code, 3e-3, 0.7, soft=False, **kw)
        assert bs["logical_fail"] <= bh["logical_fail"]
        assert bs["bp_converged"] > bh["bp_converged"] + 0.02
