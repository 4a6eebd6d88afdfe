"""Biased-noise circuit-level DEMs.

`NoiseModel.pauli2` samples 2q locations as INDEPENDENT per-qubit biased
channels (the frame/tableau injectors' tuple branch) — but until round 3
every DEM builder booked the uniform 4p/15 split regardless, a silent
sampler/model divergence. These tests pin the exact biased booking:

* per-side (X, Z)-component joint {(1,0): px, (1,1): py, (0,1): pz};
* exclusive X-support classes as products (c-only a(1-a), both a² with
  a = px+py), mirrored for Z; correlation pairs q(xc,zc)·q(xt,zt);

validated the strongest way available — detector-statistics calibration
on frame-sampled biased data must hand back the biased DEM's own edge
probabilities (`decode/calibrate.py`'s graph-agnostic two-point
identity), and the biased DEM must out-decode a total-matched uniform
booking on the same biased shots."""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from qcss_tpu.codes import families
from qcss_tpu.sim.noise import NoiseModel

#: strongly Z-biased 2q channel (eta ~ 10): px=py=2.5e-4, pz=3.5e-3
BIASED = NoiseModel(p_gate2=4e-3, pauli2=(2.5e-4, 2.5e-4, 3.5e-3),
                    p_meas=6e-3, p_reset=2e-3)


class TestBiasedSingleSectorDEM:
    def test_calibration_recovers_biased_probs(self):
        """Frame-sampled detector data under biased pauli2, calibrated
        with the two-point identity, must match the biased booking —
        the X-memory sees per-side X rates a=px+py=5e-4, so the data/
        ancilla class edges book a(1-a) and the XX diagonal a²~2.5e-7
        (vs the uniform split's 4p/15~1.1e-3: 2x+ off on every
        species)."""
        from test_calibrate import _sample_circuit_level

        from qcss_tpu.decode.calibrate import estimate_edge_probs
        from qcss_tpu.decode.dem import (
            circuit_level_graph, extraction_gate_list)

        code = families.rotated_surface(3)
        rounds = 5
        raw = code.raw_parity_check_c2
        graph, true_p = circuit_level_graph(
            raw, extraction_gate_list(code, raw), rounds,
            p_gate2=BIASED.p_gate2, p_meas=BIASED.p_meas,
            p_reset=BIASED.p_reset, logicals=code.z_operator_matrix(),
            return_probs=True, rate2=BIASED.pauli2)
        dets, _ = _sample_circuit_level(code, BIASED, rounds,
                                        batch=1 << 17)
        est = estimate_edge_probs(dets, graph)
        # species-level: group edges by booked probability, means tight
        for pv in np.unique(np.round(true_p, 9)):
            if pv < 2e-4:
                continue  # below two-point resolution at this batch
            sel = np.abs(true_p - pv) < 1e-9
            assert abs(est[sel].mean() - pv) < 0.2 * pv, (
                pv, est[sel].mean(), int(sel.sum()))

    def test_uniform_booking_is_wrong_for_biased_noise(self):
        """The uniform-split booking disagrees with the biased one on
        every 2q species (the pre-fix divergence, made visible)."""
        from qcss_tpu.decode.dem import _round_faults

        code = families.rotated_surface(3)
        raw = code.raw_parity_check_c2
        from qcss_tpu.decode.dem import extraction_gate_list

        gates = extraction_gate_list(code, raw)
        fu = _round_faults(raw, gates, BIASED.p_gate2, 0.0, 0.0)
        fb = _round_faults(raw, gates, BIASED.p_gate2, 0.0, 0.0,
                           rate2=BIASED.pauli2)
        pu = sorted({p for _, _, p, _ in fu})
        pb = sorted({p for _, _, p, _ in fb})
        a = 5e-4
        assert pu == [4.0 * 4e-3 / 15.0]
        assert np.allclose(pb, sorted({a * (1 - a), a * a}))


class TestBiasedTwoSectorDEM:
    def test_biased_dem_beats_total_matched_uniform(self):
        """Same strongly-biased shots decoded twice: with the exact
        biased DEM and with a uniform DEM at the same per-location
        total. The biased model knows Z faults outnumber X ~7:1 and
        weights the sectors' graphs accordingly."""
        from qcss_tpu.decode.dem2 import build_two_sector_dem
        from qcss_tpu.decode.spacetime import detector_history
        from qcss_tpu.decode.uf import UFDecoder
        from qcss_tpu.experiments.memory import (
            x_extraction_circuit, z_extraction_circuit)
        from qcss_tpu.experiments.memory_xz import _sample_two_sector
        from qcss_tpu.sim import frame as fr

        code = families.rotated_surface(3)
        rounds, batch = 5, 1 << 13
        hz = np.asarray(code.raw_parity_check_c2, np.uint8) & 1
        hx = np.asarray(code.raw_parity_check_c1, np.uint8) & 1
        rz, rx = hz.shape[0], hx.shape[0]
        lz = np.asarray(code.z_operator_matrix(), np.uint8) & 1
        lx = np.asarray(code.x_operator_matrix(), np.uint8) & 1
        n = code.n
        z_arrays = tuple(map(jnp.asarray, z_extraction_circuit(
            code, checks=hz).to_arrays()))
        x_arrays = tuple(map(jnp.asarray, x_extraction_circuit(
            code, anc_offset=n + rz, checks=hx).to_arrays()))
        fn = jax.jit(
            partial(_sample_two_sector, code=code, noise=BIASED,
                    z_arrays=z_arrays, x_arrays=x_arrays,
                    z_comp=fr.maybe_compile(z_arrays, n + rz + rx),
                    x_comp=fr.maybe_compile(x_arrays, n + rz + rx),
                    rz=rz, rx=rx),
            static_argnames=("batch", "rounds"))
        syns_z, syns_x, x_err, z_err = map(
            np.asarray, fn(jax.random.key(11), batch, rounds))
        dets_z = detector_history(
            syns_z, ((x_err.astype(np.int64) @ hz.T) & 1).astype(np.uint8))
        dets_x = detector_history(
            syns_x, ((z_err.astype(np.int64) @ hx.T) & 1).astype(np.uint8))
        par_x = ((x_err.astype(np.int64) @ lz[0]) & 1).astype(np.uint32)
        par_z = ((z_err.astype(np.int64) @ lx[0]) & 1).astype(np.uint32)

        def word_fail(noise_model):
            dem = build_two_sector_dem(code, rounds, noise_model)
            _, oz = UFDecoder(dem.graph_x_errors).decode_batch(
                dets_z, want_corrections=False)
            _, ox = UFDecoder(dem.graph_z_errors).decode_batch(
                dets_x, want_corrections=False)
            return float(np.mean(((oz & 1) != par_x)
                                 | ((ox & 1) != par_z)))

        f_biased = word_fail(BIASED)
        f_uniform = word_fail(dataclasses.replace(BIASED, pauli2=None))
        assert f_biased < f_uniform, (f_biased, f_uniform)

    def test_biased_pair_probabilities_are_exact_products(self):
        from qcss_tpu.decode.dem2 import _RoundCircuit, _fault_species

        code = families.rotated_surface(3)
        comps, pairs = _fault_species(_RoundCircuit(code), BIASED)
        px, py, pz = BIASED.pauli2
        q = {(0, 0): 1 - px - py - pz, (1, 0): px, (1, 1): py,
             (0, 1): pz}
        bits = {"c": (1, 0), "t": (0, 1), "ct": (1, 1)}
        for (kx, kz), jp in pairs.items():
            if kx[0] != "2q":
                continue
            (xc, xt), (zc, zt) = bits[kx[2]], bits[kz[2]]
            assert abs(jp - q[(xc, zc)] * q[(xt, zt)]) < 1e-15
