"""Circuit-level logical-Z memory experiment tests."""

import numpy as np
import pytest

from qcss_tpu.codes import families
from qcss_tpu.experiments import z_extraction_circuit, z_memory_experiment
from qcss_tpu.sim.noise import NoiseModel


@pytest.fixture(scope="module")
def steane():
    return families.steane()


class TestExtractionCircuit:
    def test_structure(self, steane):
        circ = z_extraction_circuit(steane)
        # One CNOT per 1 in the Z-check matrix, data -> ancilla.
        assert len(circ) == int(steane.parity_check_c2.sum())
        for g in circ:
            assert g.name == "CNOT"
            assert g.qubits[0] < steane.n  # control on data
            assert g.qubits[1] >= steane.n  # target on ancilla

    def test_noiseless_extraction_reads_zero_syndrome(self, steane):
        out = z_memory_experiment(
            steane, rounds=3, noise=NoiseModel(), batch=256, seed=0
        )
        assert out["logical_fail"] == 0.0
        assert out["residual_syndrome"] == 0.0


class TestUnderNoise:
    def test_measurement_noise_only_is_suppressed(self, steane):
        # With only syndrome-measurement noise, the data stays clean; the
        # temporal vote must keep false corrections rare.
        noisy = z_memory_experiment(
            steane, rounds=5, noise=NoiseModel(p_meas=0.05), batch=4096, seed=1
        )
        single = z_memory_experiment(
            steane, rounds=1, noise=NoiseModel(p_meas=0.05), batch=4096, seed=2
        )
        assert noisy["logical_fail"] <= single["logical_fail"]
        assert noisy["logical_fail"] < 0.01

    def test_gate_noise_produces_bounded_failures(self, steane):
        out = z_memory_experiment(
            steane, rounds=3,
            noise=NoiseModel(p_gate2=0.002, p_meas=0.002),
            batch=4096, seed=3,
        )
        # ~63 CNOT locations per round x 3 rounds at p=2e-3: failures occur
        # but the code suppresses most single faults.
        assert 0.0 <= out["logical_fail"] < 0.1

    def test_even_rounds_rejected(self, steane):
        with pytest.raises(ValueError):
            z_memory_experiment(steane, rounds=2, noise=NoiseModel(), batch=8)


class TestDifferenceDecoder:
    def test_valid_codeword_guarantee(self, steane):
        """The difference decoder always closes the final syndrome window:
        residual syndrome must be exactly zero."""
        out = z_memory_experiment(
            steane, rounds=4, noise=NoiseModel(p_gate2=0.002, p_meas=0.01),
            batch=4096, seed=7, decoder="difference",
        )
        assert out["residual_syndrome"] == 0.0

    def test_noiseless_exact(self, steane):
        out = z_memory_experiment(
            steane, rounds=4, noise=NoiseModel(), batch=256, decoder="difference"
        )
        assert out["logical_fail"] == 0.0

    def test_even_rounds_allowed(self, steane):
        # No odd-round constraint for the difference decoder.
        out = z_memory_experiment(
            steane, rounds=2, noise=NoiseModel(), batch=64, decoder="difference"
        )
        assert out["logical_fail"] == 0.0

    def test_unknown_decoder_rejected(self, steane):
        with pytest.raises(ValueError):
            z_memory_experiment(
                steane, rounds=3, noise=NoiseModel(), batch=8, decoder="nope"
            )


class TestXBasisMemory:
    """The |+̄⟩ mirror experiment (memory_experiment basis='x')."""

    def test_noiseless_silent_both_engines(self, steane):
        from qcss_tpu.experiments import memory_experiment
        from qcss_tpu.sim.noise import NoiseModel

        for engine in ("tableau", "frames"):
            out = memory_experiment(
                steane, rounds=3, noise=NoiseModel(), basis="x",
                batch=64, decoder="vote", engine=engine)
            assert out["logical_fail"] == 0.0
            assert out["residual_syndrome"] == 0.0

    def test_engines_bit_identical_under_noise(self, steane):
        from qcss_tpu.experiments import memory_experiment
        from qcss_tpu.sim.noise import NoiseModel

        noise = NoiseModel(p_gate2=2e-3, p_meas=1e-2)
        kw = dict(rounds=3, noise=noise, basis="x", batch=1 << 10,
                  seed=7, decoder="vote")
        a = memory_experiment(steane, engine="tableau", **kw)
        b = memory_experiment(steane, engine="frames", **kw)
        assert a["logical_fail"] == b["logical_fail"]
        assert a["residual_syndrome"] == b["residual_syndrome"]

    def test_x_basis_uf_and_dem_on_surface(self):
        from qcss_tpu.codes import families
        from qcss_tpu.experiments import memory_experiment
        from qcss_tpu.sim.noise import NoiseModel

        code = families.rotated_surface(3)
        noise = NoiseModel(p_gate2=3e-3, p_meas=1e-2)
        uf = memory_experiment(code, rounds=3, noise=noise, basis="x",
                               batch=1 << 11, seed=1, decoder="uf",
                               engine="frames")
        dem = memory_experiment(code, rounds=3, noise=noise, basis="x",
                                batch=1 << 11, seed=1, decoder="dem",
                                engine="frames")
        assert 0 < uf["logical_fail"] < 0.2
        # circuit-level DEM should not lose to the phenomenological graph
        assert dem["logical_fail"] <= uf["logical_fail"] + 2 / 2048
