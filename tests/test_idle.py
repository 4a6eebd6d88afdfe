"""Idle-qubit noise locations (round 3).

The reference's noise model has no idle locations, yet its own comment
warns that shared ancillas "limit parallelism, which significantly reduces
fault tolerance" (reference: ftqc.py:156-160) — the cost these channels
make measurable. Covered here: closed-form channel composition, engine
bit-identity with idle on, backward compatibility at p_idle = 0, and the
physics (idle noise hurts; more blocks serialized = more idle errors).
"""

import jax
import numpy as np
import pytest

from qcss_tpu.circuits.ir import Program
from qcss_tpu.codes.families import steane
from qcss_tpu.ftqc import rewrite_program
from qcss_tpu.sim.noise import NoiseModel, compose_pauli


@pytest.fixture(scope="module")
def code():
    return steane()


def x_program():
    p = Program()
    ro = p.declare("ro", 1)
    p.x(0).measure(0, ro[0])
    return p


def two_block_program():
    p = Program()
    ro = p.declare("ro", 2)
    p.x(0).x(1).measure(0, ro[0]).measure(1, ro[1])
    return p


class TestComposePauli:
    def test_two_step_matches_convolution(self):
        rate = (0.01, 0.02, 0.03)
        px, py, pz = rate
        pi = 1 - px - py - pz
        # direct XOR-convolution of the channel with itself
        probs = {"I": pi, "X": px, "Y": py, "Z": pz}
        mult = {("I", p): p for p in "IXYZ"}
        mult.update({(p, "I"): p for p in "IXYZ"})
        mult.update({(p, p): "I" for p in "IXYZ"})
        mult.update({("X", "Y"): "Z", ("Y", "X"): "Z",
                     ("Y", "Z"): "X", ("Z", "Y"): "X",
                     ("X", "Z"): "Y", ("Z", "X"): "Y"})
        out = {p: 0.0 for p in "IXYZ"}
        for a, pa in probs.items():
            for b, pb in probs.items():
                out[mult[(a, b)]] += pa * pb
        got = compose_pauli(rate, 2)
        assert np.allclose(got, (out["X"], out["Y"], out["Z"]))

    def test_uniform_stays_uniform_scalar(self):
        p = compose_pauli(0.003, 7)
        assert isinstance(p, float)
        # 1 - 4/3 p' = (1 - 4/3 p)^7
        expect = 0.75 * (1 - (1 - 0.003 * 4 / 3) ** 7)
        assert np.isclose(p, expect)

    def test_one_step_identity(self):
        assert compose_pauli(0.01, 1) == 0.01
        assert compose_pauli((0.1, 0.2, 0.3), 1) == (0.1, 0.2, 0.3)

    def test_from_decoherence_idle(self):
        m = NoiseModel.from_decoherence(300e-6, 300e-6, ro_fidelity=0.99,
                                        idle_time=150e-9)
        assert m.p_idle > 0 and m.pauli_idle is not None
        m0 = NoiseModel.from_decoherence(300e-6, 300e-6, ro_fidelity=0.99)
        assert m0.p_idle == 0.0


class TestIdleExecution:
    def test_frames_bit_identical_to_unpacked_with_idle(self, code):
        noise = NoiseModel(p_gate2=2e-3, p_meas=2e-3, p_idle=1e-3)
        enc_f = rewrite_program(x_program(), code, noise=noise,
                                tableau="frames")
        enc_u = rewrite_program(x_program(), code, noise=noise,
                                tableau="unpacked")
        out_f = enc_f.run(256, key=jax.random.key(3))
        out_u = enc_u.run(256, key=jax.random.key(3))
        for k in out_u:
            assert (np.asarray(out_f[k]) == np.asarray(out_u[k])).all(), k

    def test_idle_zero_matches_legacy(self, code):
        """p_idle=0 must not consume keys: outputs identical to a model
        without the field set at all."""
        n1 = NoiseModel(p_gate2=2e-3, p_meas=2e-3)
        n2 = NoiseModel(p_gate2=2e-3, p_meas=2e-3, p_idle=0.0)
        o1 = rewrite_program(x_program(), code, noise=n1,
                             tableau="frames").run(128, key=jax.random.key(1))
        o2 = rewrite_program(x_program(), code, noise=n2,
                             tableau="frames").run(128, key=jax.random.key(1))
        for k in o1:
            assert (np.asarray(o1[k]) == np.asarray(o2[k])).all(), k

    def test_parallel_ec_exact_and_wins_under_idle(self, code):
        """ec_schedule='parallel': deterministic outcomes stay exact, and
        under idle noise the parallel schedule beats the serialized one
        (waiting blocks no longer decohere through each other's EC) —
        the measurable form of the reference's own warning that shared
        scratch 'significantly reduces fault tolerance'
        (reference: ftqc.py:156-160)."""
        p = Program()
        ro = p.declare("ro", 2)
        p.x(0).x(1).measure(0, ro[0]).measure(1, ro[1])
        noise = NoiseModel(p_gate2=3e-4, p_idle=3e-4)
        k = jax.random.key(2)
        enc_par = rewrite_program(p, code, noise=noise, tableau="frames",
                                  ancillas="dedicated",
                                  ec_schedule="parallel")
        enc_ser = rewrite_program(p, code, noise=noise, tableau="frames",
                                  ancillas="dedicated")
        out_p = enc_par.run(4096, key=k)
        out_s = enc_ser.run(4096, key=k)
        fp = int((np.asarray(out_p["ro"]) != [1, 1]).any(axis=1).sum())
        fs = int((np.asarray(out_s["ro"]) != [1, 1]).any(axis=1).sum())
        # Measured 187 vs 473 at 4096 shots (2.5x; the earlier 63-vs-1622
        # figure predated the commit-ordering fix in _encode_ft_par, which
        # was silently dropping data-block idle inside the parallel RUS
        # loop — the win is real but 2.5x, not 26x).
        assert fp * 2 < fs, (fp, fs)
        # noiseless exactness through the same parallel machinery
        out0 = rewrite_program(p, code, tableau="frames",
                               ancillas="dedicated",
                               ec_schedule="parallel").run(32)
        assert (np.asarray(out0["ro"]) == [1, 1]).all()

    def test_parallel_ec_validation(self, code):
        with pytest.raises(ValueError):
            rewrite_program(x_program(), code, tableau="frames",
                            ec_schedule="parallel")  # shared ancillas
        with pytest.raises(ValueError):
            rewrite_program(x_program(), code, tableau="unpacked",
                            ancillas="dedicated", ec_schedule="parallel")

    def test_idle_noise_hurts(self, code):
        """A two-block program under strong idle noise must fail more than
        the same program without idle noise (blocks idle through each
        other's serialized EC)."""
        base = NoiseModel(p_gate2=1e-4)
        idle = NoiseModel(p_gate2=1e-4, p_idle=2e-3)
        k = jax.random.key(7)
        out0 = rewrite_program(two_block_program(), code, noise=base,
                               tableau="frames").run(2048, key=k)
        out1 = rewrite_program(two_block_program(), code, noise=idle,
                               tableau="frames").run(2048, key=k)
        fails0 = int((np.asarray(out0["ro"]) != 1).sum())
        fails1 = int((np.asarray(out1["ro"]) != 1).sum())
        assert fails1 > fails0 + 8, (fails0, fails1)
