"""Quil text front-end: reference-ecosystem programs run unmodified.

The test programs mirror the reference's own end-to-end suite
(reference: test/test_ftqc.py:22-113), written as Quil source instead of
IR calls, and must produce the same deterministic logical outcomes
through the full FT pipeline.
"""

import jax
import numpy as np
import pytest

from qcss_tpu.circuits.quil import parse_quil
from qcss_tpu.codes.families import steane
from qcss_tpu.errors import UnsupportedProgramError
from qcss_tpu.ftqc import rewrite_program


@pytest.fixture(scope="module")
def code():
    return steane()


def run_quil(text, code, batch=16, **kw):
    prog = parse_quil(text)
    return rewrite_program(prog, code, **kw).run(batch, key=jax.random.key(0))


class TestParsing:
    def test_basic_program(self):
        p = parse_quil("""
            DECLARE ro BIT[2]
            X 0
            H 1
            CNOT 0 1
            MEASURE 0 ro[0]
            MEASURE 1 ro[1]
        """)
        assert sorted(p.qubits()) == [0, 1]
        assert p.memory == {"ro": 2}

    def test_phase_is_s(self):
        p = parse_quil("DECLARE ro BIT\nPHASE(pi/2) 0\nMEASURE 0 ro[0]")
        names = [i.name for i in p.instructions if hasattr(i, "name")]
        assert "S" in names

    def test_comments_and_nop(self):
        p = parse_quil("# header\nNOP\nDECLARE ro BIT\nX 0 # trailing\n"
                       "MEASURE 0 ro[0]")
        assert sorted(p.qubits()) == [0]

    def test_classical_ops(self):
        p = parse_quil("""
            DECLARE a BIT[2]
            MOVE a[0] 1
            NOT a[1]
            XOR a[1] a[0]
        """)
        assert len(p.instructions) > 2

    def test_rejects_defgate(self):
        with pytest.raises(UnsupportedProgramError):
            parse_quil("DEFGATE FOO:\n    1, 0\n    0, 1")

    def test_rejects_non_clifford(self):
        with pytest.raises(UnsupportedProgramError):
            parse_quil("DECLARE ro BIT\nRX(0.3) 0")

    def test_rejects_irreducible_jump(self):
        with pytest.raises(UnsupportedProgramError):
            parse_quil("DECLARE ro BIT\nJUMP @nowhere\nX 0")

    def test_if_then_jump_when_idiom(self):
        # pyQuil if_then shape
        p = parse_quil("""
            DECLARE ro BIT[2]
            MEASURE 0 ro[0]
            JUMP-WHEN @THEN ro[0]
            JUMP @END
            LABEL @THEN
            X 0
            LABEL @END
            MEASURE 0 ro[1]
        """)
        kinds = [type(i).__name__ for i in p.instructions]
        assert "IfThenInst" in kinds

    def test_if_then_jump_unless_idiom(self):
        p = parse_quil("""
            DECLARE ro BIT[2]
            MEASURE 0 ro[0]
            JUMP-UNLESS @SKIP ro[0]
            X 0
            LABEL @SKIP
            MEASURE 0 ro[1]
        """)
        kinds = [type(i).__name__ for i in p.instructions]
        assert "IfThenInst" in kinds

    def test_while_loop_idiom(self):
        # loop until flag reads 1 (JUMP-WHEN head: exit when set)
        p = parse_quil("""
            DECLARE flag BIT
            LABEL @START
            JUMP-WHEN @END flag
            X 0
            MEASURE 0 flag
            JUMP @START
            LABEL @END
        """)
        kinds = [type(i).__name__ for i in p.instructions]
        assert "RepeatUntilInst" in kinds

    def test_while_do_negated_idiom(self):
        # pyQuil while_do(flag): exit when flag CLEAR -> negation register
        p = parse_quil("""
            DECLARE flag BIT
            MOVE flag 1
            LABEL @START
            JUMP-UNLESS @END flag
            X 0
            MEASURE 0 flag
            JUMP @START
            LABEL @END
        """)
        kinds = [type(i).__name__ for i in p.instructions]
        assert "RepeatUntilInst" in kinds
        assert any(n.startswith("__quil_neg_") for n in p.memory)


class TestEndToEnd:
    """The reference's deterministic outcome matrix, from Quil source
    (reference: test/test_ftqc.py:22-113)."""

    def test_x_measures_one(self, code):
        out = run_quil("DECLARE ro BIT\nX 0\nMEASURE 0 ro[0]", code)
        assert (np.asarray(out["ro"])[:, 0] == 1).all()

    def test_hzh_measures_one(self, code):
        out = run_quil(
            "DECLARE ro BIT\nH 0\nZ 0\nH 0\nMEASURE 0 ro[0]", code)
        assert (np.asarray(out["ro"])[:, 0] == 1).all()

    def test_conditional_feedback(self, code):
        # measure 1, apply X iff set, measure 0 — the reference's
        # readout-feedback pattern through the jump idiom
        out = run_quil("""
            DECLARE ro BIT[2]
            X 0
            MEASURE 0 ro[0]
            JUMP-UNLESS @SKIP ro[0]
            X 0
            LABEL @SKIP
            MEASURE 0 ro[1]
        """, code)
        ro = np.asarray(out["ro"])
        assert (ro[:, 0] == 1).all() and (ro[:, 1] == 0).all()


class TestCfgDispatch:
    """Tier-2 control flow: arbitrary (out-of-idiom, including
    irreducible) jump topologies run through the CFG dispatch
    structurizer — the program class the reference passes through with
    mangled labels (reference: ftqc.py:98-103,147-151)."""

    def test_undefined_label_still_rejected(self):
        with pytest.raises(UnsupportedProgramError):
            parse_quil("DECLARE ro BIT\nJUMP @nowhere\nX 0")

    def test_forward_and_backward_jumps(self, code):
        # jump over a dead block, then a conditional BACKWARD jump into it
        out = run_quil("""
            DECLARE ro BIT[3]
            MEASURE 0 ro[0]
            JUMP @MID
            LABEL @A
            X 0
            JUMP @DONE
            LABEL @MID
            X 0
            MEASURE 0 ro[1]
            JUMP-WHEN @A ro[1]
            LABEL @DONE
            MEASURE 0 ro[2]
        """, code, batch=8)
        assert (np.asarray(out["ro"]) == [0, 1, 0]).all()

    def test_irreducible_two_entry_loop(self, code):
        # the loop {A, B} has TWO entries (fall-through into A, jump into
        # B): not expressible as structured if/while — the canonical
        # irreducible shape
        out = run_quil("""
            DECLARE ro BIT[2]
            DECLARE c BIT
            DECLARE k BIT
            MOVE c 1
            JUMP-WHEN @B c
            LABEL @A
            X 0
            LABEL @B
            MEASURE 0 ro[0]
            NOT k
            JUMP-WHEN @A k
            MEASURE 0 ro[1]
        """, code, batch=8)
        assert (np.asarray(out["ro"]) == [1, 1]).all()

    def test_mid_program_halt(self, code):
        out = run_quil("""
            DECLARE ro BIT[2]
            X 0
            MEASURE 0 ro[0]
            HALT
            X 0
            MEASURE 0 ro[1]
        """, code, batch=8)
        assert (np.asarray(out["ro"]) == [1, 0]).all()

    def test_dispatch_on_frames_engine(self, code):
        # Pauli-only branch bodies keep the reference trajectory
        # sample-independent, so the frame engine runs goto programs too
        out = run_quil("""
            DECLARE ro BIT[3]
            MEASURE 0 ro[0]
            JUMP @MID
            LABEL @A
            X 0
            JUMP @DONE
            LABEL @MID
            X 0
            MEASURE 0 ro[1]
            JUMP-WHEN @A ro[1]
            LABEL @DONE
            MEASURE 0 ro[2]
        """, code, batch=8, tableau="frames")
        assert (np.asarray(out["ro"]) == [0, 1, 0]).all()

    def test_structured_idioms_still_preferred(self):
        # in-idiom programs must NOT fall to the dispatch tier
        p = parse_quil("""
            DECLARE ro BIT[2]
            MEASURE 0 ro[0]
            JUMP-WHEN @THEN ro[0]
            JUMP @END
            LABEL @THEN
            X 0
            LABEL @END
            MEASURE 0 ro[1]
        """)
        assert not any(n.startswith("__cf_") for n in p.memory)


class TestGuardedInst:
    """The IR-level per-sample guarded instruction the dispatch tier
    lowers to (gates, measurements, classical ops — beyond IfThenInst's
    unitary-only bodies)."""

    def test_guarded_measure_and_gate(self, code):
        from qcss_tpu.circuits.ir import ClassicalInst, GateInst, MeasureInst
        from qcss_tpu.circuits.ir import Program

        p = Program()
        ro = p.declare("ro", 3)
        flag = p.declare("flag", 2)[0:2]
        p.x(0)
        p.measure(0, ro[0])                      # 1
        p.guarded(ro[0], GateInst("X", (0,)))    # fires: back to |0>
        p.guarded(ro[0], MeasureInst(0, ro[1]))  # fires: 0
        p.guarded(ro[1], GateInst("X", (0,)))    # ro[1]=0: does NOT fire
        p.guarded(ro[0], ClassicalInst("MOVE", flag[0], 1))  # fires
        p.guarded(ro[1], ClassicalInst("MOVE", flag[1], 1))  # masked
        p.measure(0, ro[2])                      # still 0
        out = rewrite_program(p, code).run(8, key=jax.random.key(0))
        assert (np.asarray(out["ro"]) == [1, 0, 0]).all()
        assert (np.asarray(out["flag"]) == [1, 0]).all()

    def test_guarded_requires_scheduled_engine(self, code):
        from qcss_tpu.circuits.ir import GateInst, Program

        p = Program()
        ro = p.declare("ro", 1)
        p.measure(0, ro[0])
        p.guarded(ro[0], GateInst("X", (0,)))
        with pytest.raises(UnsupportedProgramError):
            rewrite_program(p, code, engine="unrolled")

    def test_real_declare_passes_through(self, code):
        # the reference passes non-BIT Declares through untouched
        # (ftqc.py:111-116); they carry as annotations here
        out = run_quil("""
            DECLARE ro BIT
            DECLARE theta REAL[2]
            X 0
            MEASURE 0 ro[0]
        """, code, batch=4)
        assert (np.asarray(out["ro"])[:, 0] == 1).all()
