"""Quantum Golay code [[23,1,7]] tests (families.golay).

The flagship transversal-Clifford code: self-dual, doubly even, distance
7 — S is transversal at three times the Steane distance. Distance and
unique-decoding radius are certified computationally (no reference
analogue; the reference ships no code constructors, SURVEY.md §2.5).
"""

from itertools import combinations, islice

import jax
import numpy as np

from qcss_tpu.codes import families


def _min_logical_weight(code, up_to):
    h = code.raw_parity_check_c2.astype(np.int64)
    lz = code.z_operator_matrix()[0].astype(np.int64)
    for w in range(1, up_to + 1):
        it = combinations(range(code.n), w)
        while True:
            chunk = list(islice(it, 200_000))
            if not chunk:
                break
            v = np.zeros((len(chunk), code.n), np.int64)
            v[np.repeat(np.arange(len(chunk)), w),
              np.asarray(chunk).ravel()] = 1
            if (((v @ h.T) % 2 == 0).all(1) & ((v @ lz) % 2 == 1)).any():
                return w
    return None


class TestGolay:
    def test_parameters_and_transversal_set(self):
        code = families.golay()
        assert (code.n, code.k, code.t) == (23, 1, 3)
        assert {"I", "CNOT", "H", "CZ", "S"} <= code.transversal_gates

    def test_dual_is_doubly_even(self):
        code = families.golay()
        assert (code.raw_parity_check_c1.sum(axis=1) % 4 == 0).all()

    def test_distance_is_7(self):
        assert _min_logical_weight(families.golay(), 7) == 7

    def test_collision_radius(self):
        assert families.golay(t=None).t == 3

    def test_corrects_all_weight_3_errors(self):
        code = families.golay()
        from qcss_tpu.decode import logical_error_rate

        # weight <= 3 exhaustive via the LUT pipeline at p=0 + manual check
        h = code.parity_check_c2.astype(np.int64)
        lut = np.asarray(code.device.lut_c2)
        lz = np.asarray(code.device.logical_z[0]).astype(np.int64)
        errs = []
        for w in (1, 2, 3):
            for sup in combinations(range(23), w):
                e = np.zeros(23, np.uint8)
                e[list(sup)] = 1
                errs.append(e)
        errs = np.asarray(errs)
        syn = (errs.astype(np.int64) @ h.T) & 1
        idx = (syn * (1 << np.arange(syn.shape[1] - 1, -1, -1))).sum(1)
        corr = lut[idx]
        resid = (errs ^ corr).astype(np.int64)
        assert not ((resid @ h.T) & 1).any()
        assert not ((resid @ lz) & 1).any()

    def test_ft_s_program_exact(self):
        """S·S = Z then X: transversal S exercised FT end-to-end on the
        frame engine (outcome deterministic: Z X |0̄⟩ measures 1)."""
        from qcss_tpu.circuits.ir import Program
        from qcss_tpu.ftqc import rewrite_program

        code = families.golay()
        p = Program()
        ro = p.declare("ro", 1)
        p.s(0).s(0).x(0).measure(0, ro[0])
        enc = rewrite_program(p, code, tableau="frames")
        out = enc.run(16, key=jax.random.key(0))
        assert (np.asarray(out["ro"]) == 1).all()
