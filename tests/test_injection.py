"""Arbitrary-state encoding networks + magic-state injection.

`encode_state_network` is gold-tested against the dense statevector
simulator (every amplitude, including signs); the injection experiment's
exactness claims (trivial-syndrome Z̄ propagation, the pre-T X-deviation
twirl, the Clifford-noise floor) are each pinned by a dedicated test.
The reference has no arbitrary-state encoder and no non-Clifford path at
all (reference: css_code.py:203-312, 433-434).
"""

import numpy as np
import pytest

from qcss_tpu.circuits import encoding
from qcss_tpu.codes import families
from qcss_tpu.experiments import injection
from qcss_tpu.sim.noise import NoiseModel
from qcss_tpu.sim.statevec import StateVector


def _logical_basis_states(code):
    """All 2^k logical basis states as dense vectors (little-endian)."""
    g = np.asarray(code.parity_check_c1, np.uint8) & 1
    xops = np.asarray(code.x_operator_matrix(), np.uint8) & 1
    n, k = code.n, code.k
    span = np.zeros((1, n), np.uint8)
    for row in g:
        span = np.vstack([span, span ^ row])
    pow2 = (1 << np.arange(n)).astype(np.int64)
    states = {}
    for b in range(1 << k):
        coset = span.copy()
        for j in range(k):
            if (b >> j) & 1:
                coset = coset ^ xops[j]
        v = np.zeros(1 << n, np.complex128)
        v[coset.astype(np.int64) @ pow2] = 1.0
        states[b] = v / np.sqrt(len(coset))
    return states


class TestEncodeStateNetwork:
    @pytest.mark.parametrize("ctor", [
        families.steane, families.shor, families.reed_muller_15,
        lambda: families.rotated_surface(3)])
    def test_statevector_gold_k1(self, ctor):
        code = ctor()
        n = code.n
        basis = _logical_basis_states(code)
        net, (q0,) = encoding.encode_state_network(code)
        rng = np.random.default_rng(3)
        for _ in range(3):
            a, b = rng.normal(size=2) + 1j * rng.normal(size=2)
            norm = np.sqrt(abs(a) ** 2 + abs(b) ** 2)
            a, b = a / norm, b / norm
            sv = StateVector(n)
            psi = np.zeros(1 << n, np.complex128)
            psi[0], psi[1 << q0] = a, b
            sv.psi = psi
            sv.run_circuit(net)
            want = a * basis[0] + b * basis[1]
            assert np.allclose(sv.psi, want, atol=1e-12)

    def test_statevector_gold_k2_toric(self):
        # k=2: both logical inputs encode simultaneously, exact amplitudes.
        code = families.toric(2)
        n = code.n
        basis = _logical_basis_states(code)
        net, inputs = encoding.encode_state_network(code)
        assert len(inputs) == 2
        rng = np.random.default_rng(7)
        amps = rng.normal(size=4) + 1j * rng.normal(size=4)
        amps /= np.linalg.norm(amps)
        sv = StateVector(n)
        psi = np.zeros(1 << n, np.complex128)
        for b in range(4):
            idx = (((b >> 0) & 1) << inputs[0]) | (((b >> 1) & 1) << inputs[1])
            psi[idx] = amps[b]
        sv.psi = psi
        sv.run_circuit(net)
        want = sum(amps[b] * basis[b] for b in range(4))
        assert np.allclose(sv.psi, want, atol=1e-12)

    def test_zero_input_reduces_to_zero_network(self):
        # |0...0⟩ input must give exactly the |0̄⟩ the zero network gives.
        code = families.steane()
        net, _ = encoding.encode_state_network(code)
        sv1, sv2 = StateVector(code.n), StateVector(code.n)
        sv1.run_circuit(net)
        sv2.run_circuit(encoding.encode_zero_network(code))
        assert np.allclose(sv1.psi, sv2.psi, atol=1e-12)


class TestMagicInjection:
    def test_quiet_is_exact_zero(self):
        r = injection.magic_injection_experiment(
            families.steane(), NoiseModel(), 0.0, 1 << 12, seed=0)
        assert r["p_accept"] == 1.0 and r["eps"] == 0.0

    def test_t_fault_is_logical_z_with_trivial_syndrome(self):
        # p_t=1: the Z at the T location must propagate to EXACTLY Z̄ —
        # every shot accepted (trivial syndrome), every shot a Z error,
        # never an X component.
        for ctor in (families.steane,
                     lambda: families.rotated_surface(3, max_table_weight=2)):
            r = injection.magic_injection_experiment(
                ctor(), NoiseModel(), 1.0, 256, seed=1)
            assert r["p_accept"] == 1.0
            assert r["p_z"] == 1.0 and r["p_x"] == 0.0 and r["p_y"] == 0.0
            assert r["eps"] == 1.0

    def test_quiet_p_t_matches_binomial(self):
        r = injection.magic_injection_experiment(
            families.steane(), NoiseModel(), 0.02, 1 << 16, seed=2)
        assert r["p_accept"] == 1.0
        assert r["p_x"] == 0.0 and r["p_y"] == 0.0
        assert abs(r["p_z"] - 0.02) < 0.003

    def test_reset_noise_on_input_is_unprotected_z(self):
        # Reset X flips on q0 pass through H as Z deviations at the T
        # location (NOT deleted — only the |+⟩-stabilizer X component is)
        # and land on Z̄: eps ~ p_reset, failures Z-type.
        q = 0.01
        r = injection.magic_injection_experiment(
            families.steane(), NoiseModel(p_reset=q), 0.0, 1 << 16,
            seed=3, return_samples=True)
        assert r["p_x"] == 0.0 and r["p_y"] == 0.0
        assert 0.5 * q < r["p_z"] < 3.0 * q

    def test_postselection_cleans_clifford_noise(self):
        noise = NoiseModel(p_gate1=2e-3, p_gate2=2e-3, p_meas=2e-3,
                           p_reset=2e-3)
        post = injection.magic_injection_experiment(
            families.steane(), noise, 0.0, 1 << 16, seed=4,
            return_samples=True)
        assert post["p_accept"] < 1.0
        # unconditioned error rate of the same shots
        acc, lx, lz = post["accept"], post["log_x"], post["log_z"]
        raw_eps = ((lx & ~lz).mean() + (lx & lz).mean()) / 2 + (lz & ~lx).mean()
        assert post["eps"] < raw_eps

    def test_factory_report_composes(self):
        noise = NoiseModel(p_gate1=1e-4, p_gate2=1e-4, p_meas=1e-4,
                           p_reset=1e-4)
        rep = injection.factory_report(
            families.steane(), noise, 1e-3, levels=2, batch=1 << 16)
        eps = rep["injection"]["eps"]
        assert 0 < eps < 0.01
        assert rep["cascade"][0]["p_in"] == eps
        assert rep["p_out"] < 1e-6
        assert rep["injections_per_state"] > 15 * 15

    def test_idle_refused(self):
        with pytest.raises(ValueError):
            injection.magic_injection_experiment(
                families.steane(), NoiseModel(p_idle=1e-4), 0.0, 64)
