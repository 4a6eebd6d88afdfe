"""Flag-qubit EC (ftqc/flags.py + schedule ec_mode='flag').

The protocol has no reference analogue (the reference's only EC is
Steane-style with encoded ancillas — reference: css_code.py:436-470).
Correctness is pinned at three levels: (1) the host-side hook tables —
every flagged-window fault of every stabilizer must decode back to an
error equivalent to the hook modulo the stabilizer group; (2) exact
logical outcomes of noiseless FT programs under the flag executor; (3)
fault tolerance under noise — the logical failure of a flag-EC'd program
must scale quadratically in p (single faults are corrected), and sit in
the same regime as Steane EC at operating rates.
"""

import jax
import numpy as np
import pytest

from qcss_tpu.codes import families
from qcss_tpu.circuits.ir import Program
from qcss_tpu.errors import InvalidCodeError
from qcss_tpu.ftqc import rewrite_program
from qcss_tpu.ftqc.flags import _hooks, build_flag_data
from qcss_tpu.ops import gf2
from qcss_tpu.sim.noise import NoiseModel


def _equiv(e1, e2, stab_rows):
    d = (e1 ^ e2) & 1
    if not d.any():
        return True
    stacked = np.concatenate([stab_rows, d[None]], axis=0)
    return gf2.rank(stacked) == gf2.rank(stab_rows)


CODES = {
    "steane": lambda: families.steane(),
    "surface3": lambda: families.rotated_surface(3, max_table_weight=1),
    "color3": lambda: families.triangular_color(3),
}


class TestHookTables:
    @pytest.mark.parametrize("name", list(CODES))
    def test_every_hook_decodes_exactly(self, name):
        """For every stabilizer and every flagged-window fault position,
        the conditional table's correction at the hook's re-measured
        syndrome must be stabilizer-equivalent to the hook."""
        code = CODES[name]()
        fd = build_flag_data(code)
        h1 = np.asarray(code.parity_check_c1, np.uint8) & 1
        h2 = np.asarray(code.parity_check_c2, np.uint8) & 1
        n = code.n
        w1 = 1 << np.arange(h1.shape[0] - 1, -1, -1)
        w2 = 1 << np.arange(h2.shape[0] - 1, -1, -1)
        # Z-sector (H2 rows): hooks are Z errors, syndromes under h1,
        # equivalence modulo h2 rows.
        for i, order in enumerate(fd.z_sector.supports):
            for e in _hooks(order, n):
                s = int(((h1 @ e) % 2) @ w1)
                corr = fd.z_sector.cond_lut[i, s]
                assert _equiv(corr, e, h2), (name, "z", i, e)
        for i, order in enumerate(fd.x_sector.supports):
            for e in _hooks(order, n):
                s = int(((h2 @ e) % 2) @ w2)
                corr = fd.x_sector.cond_lut[i, s]
                assert _equiv(corr, e, h1), (name, "x", i, e)

    def test_t1_only(self):
        with pytest.raises(InvalidCodeError):
            build_flag_data(families.golay())

    def test_needs_luts(self):
        with pytest.raises(InvalidCodeError):
            build_flag_data(families.rotated_surface(3))  # tables skipped


class TestFlagPrograms:
    def test_noiseless_exact(self):
        code = families.steane()
        p = Program()
        ro = p.declare("ro", 2)
        p.x(0).h(1).cnot(1, 0).cnot(1, 0).h(1)
        p.measure(0, ro[0]).measure(1, ro[1])
        enc = rewrite_program(p, code, tableau="frames", ec_mode="flag")
        out = enc.run(32, key=jax.random.key(0))
        assert (np.asarray(out["ro"][:, 0]) == 1).all()
        assert (np.asarray(out["ro"][:, 1]) == 0).all()

    def test_noisy_ft_scaling(self):
        """Quadratic suppression: tripling p must grow the logical failure
        faster than linearly (single faults are corrected)."""
        code = families.steane()
        p = Program()
        ro = p.declare("ro", 1)
        p.x(0).measure(0, ro[0])
        fails = {}
        for rate, batch in ((1e-3, 1 << 14), (3e-3, 1 << 13)):
            nm = NoiseModel(p_gate1=rate, p_gate2=rate,
                            p_meas=rate, p_reset=rate)
            enc = rewrite_program(p, code, noise=nm, tableau="frames",
                                  ec_mode="flag")
            out = enc.run(batch, key=jax.random.key(2))
            fails[rate] = (np.asarray(out["ro"][:, 0]) != 1).mean()
        assert 0 < fails[1e-3] < 0.05
        # linear scaling would give 3x; demand clearly super-linear
        assert fails[3e-3] > 4.5 * fails[1e-3]

    def test_config_validation(self):
        code = families.steane()
        p = Program()
        ro = p.declare("ro", 1)
        p.x(0).measure(0, ro[0])
        with pytest.raises(ValueError):
            rewrite_program(p, code, ec_mode="flag")  # needs frames
        with pytest.raises(ValueError):
            rewrite_program(p, code, tableau="frames", ec_mode="flag",
                            ec_extractions=2)
