"""Macro-op scheduler: constant-size compiled programs for FTQC execution.

The unrolled executor (`EncodedProgram._execute`) re-traces the full FT
machinery (preparation while-loops, Steane EC, measurement trials) at every
occurrence, so compile time grows linearly with program length — the traced
analogue of the reference's output-program blowup (its emitted Quil grows as
O(2^r · n) per EC round — reference: css_code.py:649-685, SURVEY §3.2).

The scheduler instead lowers an encoded program to a small array of
macro-instructions over a uniform machine state and executes it with ONE
`lax.scan` whose body `lax.switch`es over five macro-op bodies:

    PREP_ZERO b cond        FT |0̄⟩ preparation of block b
    GATE g b0 b1 cond       logical gate
    EC_ALL cond             Steane error correction on every data block
                            (fori_loop over a traced block index)
    MEASURE_TRIAL b s cond  one noisy logical measurement into vote slot s
    VOTE_STORE off cond     majority over the 2t+1 vote slots -> memory[off]

Every body takes block indices as *traced* values (qubit sets are
``b * n + iota``), so each FT subroutine traces exactly once regardless of
program length: compile time is O(1) in the number of logical gates.

Every op carries a per-sample condition `cond` against classical memory:
-1 = unconditional, k >= 0 = run iff memory[k] == 1, and -(k+2) = run iff
memory[k] == 0 (the negated form `repeat_until` loops lower to). Masked-out
samples pass through an op with their machine state selected back — the
batched replacement for the reference's jump-skipped instruction spans
(reference: ftqc.py:98-107).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from qcss_tpu.circuits.ir import (
    CLASSICAL_OPS,
    BitRef,
    ClassicalInst,
    DeclareInst,
    PragmaInst,
    GateInst,
    GuardedInst,
    IfThenInst,
    MeasureInst,
    RepeatUntilInst,
    ResetInst,
)
from qcss_tpu.decode import lut as decode_lut
from qcss_tpu.sim import noise as noise_mod
from qcss_tpu.sim import tableau as tb

# Macro opcodes.
OP_PREP_ZERO = 0
OP_GATE = 1
OP_EC_ALL = 2
OP_MEASURE_TRIAL = 3
OP_VOTE_STORE = 4
OP_CLASSICAL = 5  # (cop, dst, src_enc, cond): classical bit op on memory;
# src_enc >= 0 is a register offset, -(v+1) an immediate v (0/1).
# The pass-through of the reference's classical instructions
# (reference: ftqc.py:111-116).
OP_NOP = 6  # padding row: programs are padded to shape buckets so one
# compiled executor (macro rows as a TRACED argument) runs every program
# of the same (code, config, bucket) — compile once, run many.

# Logical gate ids for OP_GATE's arg0 ('PHASE' is the reference's old name
# for S — reference: test/test_css_code.py:25).
GATE_IDS = {"I": 0, "X": 1, "Y": 2, "Z": 3, "H": 4, "S": 5, "CNOT": 6, "CZ": 7,
            "PHASE": 5}


def circuit_depth(arrays) -> int:
    """ASAP-layered depth of an array-lowered circuit (host-side): the
    number of parallel gate layers, i.e. the circuit's duration in
    elementary time steps for idle-noise accounting."""
    ops, q0, q1 = (np.asarray(a) for a in arrays)
    from qcss_tpu.circuits.ir import OPCODES

    two_q_start = OPCODES["CNOT"]
    avail: dict[int, int] = {}
    depth = 0
    for g in range(ops.shape[0]):
        qs = [int(q0[g])]
        if int(ops[g]) >= two_q_start:
            qs.append(int(q1[g]))
        t = max(avail.get(q, 0) for q in qs) + 1
        for q in qs:
            avail[q] = t
        depth = max(depth, t)
    return depth


class MachineState(NamedTuple):
    tab: tb.Tableau
    x_frames: jax.Array  # [B, n_blocks, n]
    z_frames: jax.Array
    votes: jax.Array     # [B, trials]
    memory: jax.Array    # [B, M]
    key: jax.Array
    prep_fail: jax.Array  # [B] uint8 — 1 iff any FT preparation for this
    # sample exhausted max_prep_attempts while still flagged by error
    # detection (an unverified preparation the caller may want to discard)


class MacroProgram(NamedTuple):
    """Lowered program: rows of (opcode, a0, a1, a2, a3) int32."""

    ops: np.ndarray          # [T, 5]
    n_logical: int
    memory_layout: dict[str, tuple[int, int]]  # name -> (offset, size)
    memory_size: int


def lower(raw, code) -> MacroProgram:
    """Lower a validated `circuits.ir.Program` to macro-instructions,
    following the reference's transpile structure (reference: ftqc.py:42-120):
    FT-prep all blocks, EC after every logical gate, EC between measurement
    trials, majority vote.

    The EC round emitted after a conditional gate carries the gate's own
    condition, matching the reference's jump-skip semantics (the emitted EC
    sits inside the skipped span — reference: ftqc.py:98-107): samples whose
    condition is 0 skip both the gate and its EC round, via the per-sample
    state-select masking every macro-op supports."""
    qubit_map = {q: i for i, q in enumerate(raw.qubits())}
    n_logical = len(qubit_map)
    trials = 2 * code.t + 1

    layout: dict[str, tuple[int, int]] = {}
    offset = 0
    for name, size in raw.memory.items():
        layout[name] = (offset, size)
        offset += size

    rows: list[tuple[int, int, int, int, int]] = []
    for b in range(n_logical):
        rows.append((OP_PREP_ZERO, b, -1, 0, 0))

    def bit_offset(ref) -> int:
        off, _ = layout[ref.name]
        return off + ref.index

    def emit_gate(g: GateInst, cond: int):
        b0 = qubit_map[g.qubits[0]]
        b1 = qubit_map[g.qubits[1]] if len(g.qubits) > 1 else 0
        rows.append((OP_GATE, GATE_IDS[g.name], b0, b1, cond))
        rows.append((OP_EC_ALL, cond, 0, 0, 0))

    def emit_measure(inst: MeasureInst, cond: int):
        b = qubit_map[inst.qubit]
        for s in range(trials):
            rows.append((OP_MEASURE_TRIAL, b, s, cond, 0))
            rows.append((OP_EC_ALL, cond, 0, 0, 0))
        rows.append((OP_VOTE_STORE, bit_offset(inst.target), cond, 0, 0))

    def emit_classical(inst: ClassicalInst, cond: int):
        if isinstance(inst.src, BitRef):
            src = bit_offset(inst.src)
        elif inst.src is None:
            src = -1
        else:
            src = -(int(inst.src) + 1)
        rows.append((OP_CLASSICAL, CLASSICAL_OPS.index(inst.op),
                     bit_offset(inst.dst), src, cond))

    # One hidden scratch bit past the user registers, used to AND a
    # GuardedInst's guard with the enclosing loop's activity mask (the
    # per-op condition word holds a single bit test).
    scratch = offset
    used_scratch = [False]
    _MOVE = CLASSICAL_OPS.index("MOVE")

    def emit_inner(inst, cond: int):
        """Emit a GuardedInst's inner instruction under condition `cond`."""
        if isinstance(inst, GateInst):
            emit_gate(inst, cond)
        elif isinstance(inst, MeasureInst):
            emit_measure(inst, cond)
        elif isinstance(inst, ClassicalInst):
            emit_classical(inst, cond)
        elif isinstance(inst, ResetInst):
            rows.append((OP_PREP_ZERO, qubit_map[inst.qubit], cond, 0, 0))
        else:  # pragma: no cover — GuardedInst validates inner types
            raise ValueError(f"cannot lower guarded {inst}")

    def emit_guarded(inst: GuardedInst, ncond: int | None):
        """Lower a GuardedInst. Outside a loop the guard bit IS the
        condition. Inside a loop the op must fire only when (loop still
        active) AND (guard set): scratch = 0; scratch = guard [masked by
        loop-active]; inner [masked by scratch]. The unconditional zeroing
        is what keeps a stale guard bit from re-firing an op for samples
        that already exited the loop."""
        goff = bit_offset(inst.condition)
        if ncond is None:
            emit_inner(inst.inner, goff)
            return
        used_scratch[0] = True
        rows.append((OP_CLASSICAL, _MOVE, scratch, -1 - 0, -1))   # scratch=0
        rows.append((OP_CLASSICAL, _MOVE, scratch, goff, ncond))
        emit_inner(inst.inner, scratch)

    for inst in raw.instructions:
        if isinstance(inst, (DeclareInst, PragmaInst)):
            continue
        if isinstance(inst, GateInst):
            emit_gate(inst, -1)
        elif isinstance(inst, IfThenInst):
            for g in inst.body:
                emit_gate(g, bit_offset(inst.condition))
        elif isinstance(inst, MeasureInst):
            emit_measure(inst, -1)
        elif isinstance(inst, ClassicalInst):
            emit_classical(inst, -1)
        elif isinstance(inst, GuardedInst):
            emit_guarded(inst, None)
        elif isinstance(inst, ResetInst):
            rows.append((OP_PREP_ZERO, qubit_map[inst.qubit], -1, 0, 0))
        elif isinstance(inst, RepeatUntilInst):
            # Bounded unroll: every body op masked by "loop bit still 0"
            # (negated encoding -(k+2)); samples that have already
            # succeeded pass through untouched.
            ncond = -bit_offset(inst.condition) - 2
            for _ in range(inst.max_iters):
                for body_inst in inst.body:
                    if isinstance(body_inst, GateInst):
                        emit_gate(body_inst, ncond)
                    elif isinstance(body_inst, MeasureInst):
                        emit_measure(body_inst, ncond)
                    elif isinstance(body_inst, ClassicalInst):
                        emit_classical(body_inst, ncond)
                    elif isinstance(body_inst, GuardedInst):
                        emit_guarded(body_inst, ncond)
                    elif isinstance(body_inst, ResetInst):
                        rows.append((OP_PREP_ZERO,
                                     qubit_map[body_inst.qubit], ncond, 0, 0))
                    else:  # pragma: no cover — IR validates body types
                        raise ValueError(f"cannot lower {body_inst}")
        else:  # pragma: no cover — rewrite validates first
            raise ValueError(f"cannot lower {inst}")

    return MacroProgram(
        ops=np.asarray(rows, dtype=np.int32).reshape(-1, 5),
        n_logical=n_logical,
        memory_layout=layout,
        memory_size=offset + 1 if used_scratch[0] else max(offset, 1),
    )


class MacroExecutor:
    """Executes a MacroProgram batched on a block-level tableau engine
    (`ftqc.engines`): 'unpacked' byte-per-bit tableaus for small codes,
    'packed' word-aligned uint32 tableaus for surface-code-scale blocks.
    All block arguments below may be traced scalars or Python ints."""

    def __init__(self, code, n_logical: int,
                 noise: noise_mod.NoiseModel | None = None,
                 max_prep_attempts: int = 8,
                 tableau_engine: str = "unpacked",
                 ancillas: str = "shared",
                 ec_extractions: int = 1,
                 ec_schedule: str = "serial",
                 ec_mode: str = "steane",
                 reference_mode: bool = False):
        from qcss_tpu.ftqc.engines import make_engine

        if ancillas not in ("shared", "dedicated"):
            raise ValueError("ancillas must be 'shared' or 'dedicated'")
        if ec_extractions not in (1, 2):
            raise ValueError("ec_extractions must be 1 or 2")
        if ec_schedule not in ("serial", "parallel"):
            raise ValueError("ec_schedule must be 'serial' or 'parallel'")
        if ec_mode not in ("steane", "flag"):
            raise ValueError("ec_mode must be 'steane' or 'flag'")
        if ec_mode == "flag" and not reference_mode:
            # Flag EC measures stabilizers with bare ancilla+flag qubit
            # pairs and sequential CNOTs (qubit-level ops: frames engine
            # only); the adaptive re-extraction subsumes ec_extractions,
            # and the per-stabilizer serial schedule is inherent.
            if tableau_engine != "frames":
                raise ValueError("ec_mode='flag' requires tableau='frames'")
            if ec_extractions != 1:
                raise ValueError("ec_mode='flag' has its own adaptive "
                                 "re-extraction; use ec_extractions=1")
            if ec_schedule != "serial":
                raise ValueError("ec_mode='flag' requires "
                                 "ec_schedule='serial'")
        self.ec_mode = ec_mode if not reference_mode else "steane"
        if ec_schedule == "parallel":
            # Parallel EC runs every block's Steane round simultaneously:
            # it needs per-block ancillas, and per-(sample, block) RUS
            # commits, which only the frame state representation supports
            # (tableau rows are not block-separable mid-protocol).
            if ancillas != "dedicated":
                raise ValueError("ec_schedule='parallel' requires "
                                 "ancillas='dedicated'")
            if tableau_engine != "frames" and not reference_mode:
                raise ValueError("ec_schedule='parallel' requires "
                                 "tableau='frames'")
        self.ec_schedule = ec_schedule if not reference_mode else "serial"
        # reference_mode: the noiseless run that records per-measure-site
        # reference outcomes for the 'frames' engine. Pauli gates are
        # skipped (they ride the frame in the frame run) and measure
        # trials ignore their condition mask — sound because a
        # deterministic Z̄ measurement is non-demolition, so forcing it
        # cannot disturb the reference quantum trajectory.
        self.reference_mode = reference_mode
        # ec_extractions=2: Shor-style repeated syndrome extraction in EC —
        # each sector extracts TWICE (fresh verified ancilla each time) and
        # commits the frame correction only for samples where both
        # syndromes agree. Measurement-flip-induced spurious corrections
        # become second order per EC round (the reference trusts a single
        # noisy extraction — css_code.py:436-470), which is what wins the
        # readout-dominated regime (ro_fidelity ~ 0.99) where a single
        # extraction loses to the raw program.
        self.ec_extractions = ec_extractions
        self.code = code
        self.n = code.n
        self.n_logical = n_logical
        self.ancillas = ancillas
        # 'shared': one ancilla pair serves every block (the reference's
        # QVM-qubit-ceiling compromise — reference: ftqc.py:153-160).
        # 'dedicated': each logical block owns its own EC/measure ancilla
        # pair — no ceiling here, and the layout the parallel-EC path
        # needs. Without idle locations (p_idle = 0) the failure
        # statistics are identical (the ancilla is freshly verified per
        # use either way); with p_idle > 0 the serialization cost the
        # reference warns about (ftqc.py:156-160) becomes measurable —
        # see benchmarks/idle_bench.py.
        n_anc = 2 if ancillas == "shared" else 2 * n_logical
        self.n_blocks = n_logical + n_anc
        self.noise = noise or noise_mod.NoiseModel()
        # Value source for noise rates: the static model by default;
        # `set_rates` swaps in a traced NoiseView so one compiled executor
        # serves every rate assignment with this structure (guards — the
        # `if self.noise.p_X:` short-circuits that also fix the key
        # consumption pattern — always read the STATIC model).
        self.nv = self.noise
        self.max_prep_attempts = max_prep_attempts
        self.trials = 2 * code.t + 1
        self.engine = make_engine(tableau_engine, self.n, self.n_blocks, self.noise)
        dev = code.device
        self.h1, self.h2 = dev.h1, dev.h2
        self.lut1, self.lut2 = dev.lut_c1, dev.lut_c2
        self.logical_x, self.logical_z = dev.logical_x, dev.logical_z
        self.detect_x_plain = dev.h2
        self.detect_x_with_ops = jnp.concatenate([dev.h2, dev.logical_z], axis=0)
        self.detect_z_plain = dev.h1
        self.detect_z_with_ops = jnp.concatenate([dev.h1, dev.logical_x], axis=0)
        # Block-local prep networks (qubits in [0, n)), lowered once; the
        # engine offsets them to the target block. Depth-optimized
        # (commuting-gate reorder, unitary-identical to the reference-order
        # network): idle noise is charged per LAYER, so prep depth is a
        # direct fault-tolerance cost — 1.4-2x shallower across the code
        # families (Golay 22 -> 11 layers), see encoding.depth_optimize.
        from qcss_tpu.circuits.encoding import depth_optimize

        self._prep_zero0 = depth_optimize(
            code.noisy_encode_zero(range(self.n))).to_arrays()
        self._prep_plus0 = depth_optimize(
            code.noisy_encode_plus(range(self.n))).to_arrays()
        # Frame engine: prep circuits in matrix form (bit-identical to the
        # scan on the same key; 5-10x on the RUS-prep hot path).
        if hasattr(self.engine, "compile_block_circuit"):
            self._prep_zero_comp = self.engine.compile_block_circuit(
                self._prep_zero0)
            self._prep_plus_comp = self.engine.compile_block_circuit(
                self._prep_plus0)
        else:
            self._prep_zero_comp = self._prep_plus_comp = None
        # Shared-mode static ancilla block indices (reference: ftqc.py:60-61).
        self.anc1 = n_logical
        self.anc2 = n_logical + 1
        if self.ec_schedule == "parallel":
            L = n_logical
            a1 = [L + 2 * b for b in range(L)]
            a2 = [L + 2 * b + 1 for b in range(L)]
            self._par = {
                "anc1_blocks": np.asarray(a1, np.int32),
                "anc2_blocks": np.asarray(a2, np.int32),
                "data_q": self.engine.blocks_qubits(list(range(L))),
                "anc1_q": self.engine.blocks_qubits(a1),
                "anc2_q": self.engine.blocks_qubits(a2),
            }
        # Idle-noise durations, in elementary time steps (one transversal
        # layer / measurement / reset = 1 step; prep networks = their
        # ASAP-layered depth). Static Python ints, so each idle channel
        # composes to ONE closed-form injection (noise.compose_pauli).
        self._idle_on = bool(self.noise.p_idle) and n_logical > 0
        self._depth_zero = circuit_depth(self._prep_zero0)
        self._depth_plus = circuit_depth(self._prep_plus0)
        # _error_detect(x_sector, include_operators): reset + anc prep +
        # transversal CNOT + (H for the Z sector) + measure.
        self._detect_steps = {
            (True, False): 1 + self._depth_plus + 1 + 1,
            (True, True): 1 + self._depth_zero + 1 + 1,
            (False, False): 1 + self._depth_zero + 1 + 1 + 1,
            (False, True): 1 + self._depth_plus + 1 + 1 + 1,
        }
        # one _encode_ft attempt: reset + prep + both detection rounds
        self._attempt_steps = {
            True: 1 + self._depth_plus
            + self._detect_steps[(True, False)]
            + self._detect_steps[(False, True)],
            False: 1 + self._depth_zero
            + self._detect_steps[(False, False)]
            + self._detect_steps[(True, True)],
        }
        if self.ec_mode == "flag":
            from qcss_tpu.ftqc import flags as flags_mod

            self._flag = flags_mod.build_flag_data(code)
            # flags on H1 rows condition the X-error decode; H2 rows the
            # Z-error decode (hooks deposit the SAME Pauli type as the
            # measured stabilizer — see flags.py docstring)
            self._flag_cond_x = jnp.asarray(self._flag.x_sector.cond_lut)
            self._flag_cond_z = jnp.asarray(self._flag.z_sector.cond_lut)

    def _anc_pair(self, b):
        """The EC/measure ancilla pair serving data block b (b may be
        traced in dedicated mode)."""
        if self.ancillas == "shared":
            return self.anc1, self.anc2
        b = jnp.asarray(b, jnp.int32)
        return self.n_logical + 2 * b, self.n_logical + 2 * b + 1

    # -- helpers ------------------------------------------------------------------

    def _split(self, st: MachineState):
        key, sub = jax.random.split(st.key)
        return st._replace(key=key), sub

    def _idle_data(self, st: MachineState, busy, steps: int,
                   sample_mask=None) -> MachineState:
        """Charge `steps` time steps of idle noise to every DATA block not
        in `busy` (block indices, traced or static; ancilla blocks are
        reset/re-verified before every use, so idling them is
        unobservable). The composed channel costs one RNG draw; the draw
        and its key split happen identically in every engine, preserving
        the frames <-> tableau bit-identity contract. `sample_mask`
        restricts the charge to samples actually spending the time (the
        RUS-prep retry loop)."""
        if not self._idle_on or steps <= 0:
            return st
        rate = noise_mod.compose_pauli(self.nv.rate_idle, steps)
        st, sub = self._split(st)
        B = st.x_frames.shape[0]
        L = self.n_logical
        u = jax.random.uniform(sub, (B, L, self.n), dtype=jnp.float32)
        x_hi, z_lo, z_hi = (
            jnp.float32(v) for v in noise_mod._thresholds_1q(rate))
        x_hit = u < x_hi
        z_hit = (u >= z_lo) & (u < z_hi)
        bl = jnp.arange(L, dtype=jnp.int32)
        idle = jnp.ones((L,), bool)
        for bb in busy:
            idle = idle & (bl != jnp.asarray(bb, jnp.int32))
        m = idle[None, :, None]
        if sample_mask is not None:
            m = m & sample_mask.astype(bool)[:, None, None]
        xf = (x_hit & m).astype(jnp.uint8)
        zf = (z_hit & m).astype(jnp.uint8)
        return st._replace(tab=self.engine.inject_data_flips(st.tab, xf, zf))

    def _cond_mask(self, st: MachineState, cond) -> jax.Array:
        """Per-sample execution mask for an op's condition word: -1 → all,
        k >= 0 → memory[k], -(k+2) → NOT memory[k]."""
        ones = jnp.ones((st.tab.batch,), jnp.uint8)
        pos = st.memory[:, jnp.maximum(cond, 0)]
        neg = 1 - st.memory[:, jnp.maximum(-(cond + 2), 0)]
        return jnp.where(cond == -1, ones, jnp.where(cond >= 0, pos, neg))

    def _select_state(self, mask, new: MachineState, old: MachineState) -> MachineState:
        """Commit `new` only for mask=1 samples (kept: the advanced PRNG
        key, which is batch-shared)."""
        m1 = mask.astype(bool)[:, None]
        m3 = mask.astype(bool)[:, None, None]
        return MachineState(
            self.engine.select(mask, new.tab, old.tab),
            jnp.where(m3, new.x_frames, old.x_frames),
            jnp.where(m3, new.z_frames, old.z_frames),
            jnp.where(m1, new.votes, old.votes),
            jnp.where(m1, new.memory, old.memory),
            new.key,
            jnp.where(m1[:, 0], new.prep_fail, old.prep_fail),
        )

    def _run_prep(self, st: MachineState, b, plus: bool) -> MachineState:
        st, sub = self._split(st)
        comp = self._prep_plus_comp if plus else self._prep_zero_comp
        if comp is not None:
            return st._replace(tab=self.engine.run_compiled(st.tab, comp, b, sub))
        arrays = self._prep_plus0 if plus else self._prep_zero0
        return st._replace(tab=self.engine.run_block_circuit(st.tab, arrays, b, sub))

    def _reset_block(self, st: MachineState, b) -> MachineState:
        st, sub = self._split(st)
        tab = self.engine.reset_block(st.tab, b, sub)
        if self.noise.p_reset:
            st, sub = self._split(st)
            flips = jax.random.bernoulli(
                sub, self.nv.p_reset, (tab.batch, self.n)
            ).astype(jnp.uint8)
            tab = self.engine.inject_block_flips(
                tab, b, flips, jnp.zeros_like(flips)
            )
        zeros_f = jnp.zeros((tab.batch, self.n), dtype=jnp.uint8)
        return st._replace(
            tab=tab,
            x_frames=st.x_frames.at[:, b, :].set(zeros_f),
            z_frames=st.z_frames.at[:, b, :].set(zeros_f),
        )

    def _transversal_cnot(self, st: MachineState, b_ctrl, b_tgt) -> MachineState:
        st, sub = self._split(st)
        return st._replace(tab=self.engine.transversal_cnot(st.tab, b_ctrl, b_tgt, sub))

    def _transversal_1q(self, st: MachineState, gate: str, b) -> MachineState:
        st, sub = self._split(st)
        return st._replace(tab=self.engine.transversal_1q(st.tab, gate, b, sub))

    def _measure_block(self, st: MachineState, b):
        st, sub = self._split(st)
        tab, outs = self.engine.measure_block(st.tab, b, sub)
        st = st._replace(tab=tab)
        if self.noise.p_meas:
            st, sub = self._split(st)
            outs = noise_mod.flip_bits(outs, self.nv.p_meas, sub)
        return st, outs

    # -- FT subroutines (reference: css_code.py:314-533) ----------------------------

    def _error_detect(self, st: MachineState, b, anc, x_sector: bool,
                      include_operators: bool):
        """Detect X (or Z) errors on block b against noisily prepared block
        `anc` (reference: css_code.py:472-533)."""
        st = self._reset_block(st, anc)
        if x_sector:
            st = self._run_prep(st, anc, plus=not include_operators)
            st = self._transversal_cnot(st, b, anc)
        else:
            st = self._run_prep(st, anc, plus=include_operators)
            st = self._transversal_cnot(st, anc, b)
            st = self._transversal_1q(st, "H", anc)
        st, mem = self._measure_block(st, anc)
        if x_sector:
            check = self.detect_x_with_ops if include_operators else self.detect_x_plain
            frame = st.x_frames[:, b, :]
        else:
            check = self.detect_z_with_ops if include_operators else self.detect_z_plain
            frame = st.z_frames[:, b, :]
        return st, decode_lut.detect_errors(mem, frame, check)

    def _encode_ft(self, st: MachineState, b, anc, plus: bool,
                   busy_data=()) -> MachineState:
        """Repeat-until-success |0̄⟩/|+̄⟩ preparation of block b with
        detection against `anc` (reference: css_code.py:314-366): the
        while-loop body runs batch-wide but commits only still-flagged
        samples. `busy_data` lists the data blocks engaged in this prep
        (all others are charged one attempt's worth of idle noise per
        attempt they actually wait through — committed with the rest of
        the body, so only still-flagged samples pay)."""
        batch = st.tab.batch

        def body(carry):
            st_in, flag, attempts = carry
            s = self._reset_block(st_in, b)
            s = self._run_prep(s, b, plus)
            # Detection ORDER is load-bearing for fault tolerance: each
            # round's transversal CNOT back-propagates the (unverified)
            # detection ancilla's own prep errors onto the block — the
            # X-sector round deposits Z-type errors (CNOT b->anc), the
            # Z-sector round deposits X-type (CNOT anc->b). The LAST round
            # must therefore be the one whose deposit is benign for the
            # prepared eigenstate (Z onto |0̄⟩, X onto |+̄⟩); the earlier
            # round's fatal-type deposit is still caught by the later
            # check. The reference runs X-then-Z for BOTH eigenstates
            # (reference: css_code.py:334-339,358-364), so a single
            # ancilla prep-network fault can copy a correlated weight-2 X
            # error onto a "verified" |0̄⟩ block — measured here as a
            # first-order logical failure floor of ~2.2p (p_gate2-only
            # channel probe at p=1e-3) before this reordering.
            if plus:
                s, out_a = self._error_detect(s, b, anc, x_sector=True,
                                              include_operators=False)
                s, out_b = self._error_detect(s, b, anc, x_sector=False,
                                              include_operators=True)
            else:
                s, out_a = self._error_detect(s, b, anc, x_sector=False,
                                              include_operators=False)
                s, out_b = self._error_detect(s, b, anc, x_sector=True,
                                              include_operators=True)
            new_flag = out_a | out_b
            # Blocks elsewhere idle for this attempt's duration (committed
            # below only for samples actually re-running it).
            s = self._idle_data(s, busy_data, self._attempt_steps[plus])
            m3 = flag[:, None, None].astype(bool)
            committed = MachineState(
                self.engine.select(flag, s.tab, st_in.tab),
                jnp.where(m3, s.x_frames, st_in.x_frames),
                jnp.where(m3, s.z_frames, st_in.z_frames),
                st_in.votes, st_in.memory, s.key, st_in.prep_fail,
            )
            flag = jnp.where(flag.astype(bool), new_flag, flag)
            return committed, flag, attempts + 1

        def cond(carry):
            _, flag, attempts = carry
            return jnp.any(flag.astype(bool)) & (attempts < self.max_prep_attempts)

        flag0 = jnp.ones((batch,), dtype=jnp.uint8)
        st, flag, _ = jax.lax.while_loop(cond, body, (st, flag0, jnp.int32(0)))
        # Samples still flagged here carry a preparation that never passed
        # verification (the reference loops unboundedly — css_code.py:314-366;
        # a traced program needs a bound). Record rather than silently commit.
        return st._replace(prep_fail=st.prep_fail | flag)

    def _extract_x_syndrome(self, st: MachineState, b, anc1, anc2):
        """One X-sector extraction: verified |+̄⟩ ancilla, CNOT(b→anc),
        measure; returns (state, syndrome of mem relative to b's frame)."""
        from qcss_tpu.ops import gf2_jax

        st = self._encode_ft(st, anc1, anc2, plus=True)
        st = self._transversal_cnot(st, b, anc1)
        st = self._idle_data(st, (b,), 1)      # others idle through the CNOT
        st, mem = self._measure_block(st, anc1)
        st = self._idle_data(st, (), 1)        # every data block idles
        return st, gf2_jax.syndromes_dense(mem ^ st.x_frames[:, b, :], self.h2)

    def _extract_z_syndrome(self, st: MachineState, b, anc1, anc2):
        from qcss_tpu.ops import gf2_jax

        st = self._encode_ft(st, anc1, anc2, plus=False)
        st = self._transversal_cnot(st, anc1, b)
        st = self._idle_data(st, (b,), 1)
        st = self._transversal_1q(st, "H", anc1)
        st, mem = self._measure_block(st, anc1)
        st = self._idle_data(st, (), 2)        # H on the ancilla + measure
        return st, gf2_jax.syndromes_dense(mem ^ st.z_frames[:, b, :], self.h1)

    def _ec_one(self, st: MachineState, b) -> MachineState:
        """Steane EC on block b with its ancilla pair
        (reference: css_code.py:436-470). With ec_extractions=2, each
        sector's correction commits only where two consecutive extractions
        agree (Shor-style; spurious measurement-driven frame entries drop
        to second order)."""
        anc1, anc2 = self._anc_pair(b)

        st, syn_x = self._extract_x_syndrome(st, b, anc1, anc2)
        commit = None
        if self.ec_extractions > 1:
            st, syn_x2 = self._extract_x_syndrome(st, b, anc1, anc2)
            commit = jnp.all(syn_x == syn_x2, axis=-1)
        corr = decode_lut.decode_corrections(syn_x, self.lut2)
        if commit is not None:
            corr = jnp.where(commit[:, None], corr, jnp.zeros_like(corr))
        st = st._replace(
            x_frames=st.x_frames.at[:, b, :].set(st.x_frames[:, b, :] ^ corr)
        )

        st, syn_z = self._extract_z_syndrome(st, b, anc1, anc2)
        commit = None
        if self.ec_extractions > 1:
            st, syn_z2 = self._extract_z_syndrome(st, b, anc1, anc2)
            commit = jnp.all(syn_z == syn_z2, axis=-1)
        corr = decode_lut.decode_corrections(syn_z, self.lut1)
        if commit is not None:
            corr = jnp.where(commit[:, None], corr, jnp.zeros_like(corr))
        return st._replace(
            z_frames=st.z_frames.at[:, b, :].set(st.z_frames[:, b, :] ^ corr)
        )

    # -- flag EC (ec_mode='flag'; frames engine; t=1 codes) ------------------------
    #
    # Chamberland-Beverland distance-3 protocol (arXiv:1708.02246),
    # batched: one FLAGGED extraction of every stabilizer (bare syndrome
    # ancilla + bare flag qubit, sequential CNOTs — 2 ancilla qubits
    # instead of the 2 encoded verifier blocks Steane EC burns per
    # extraction); samples with any syndrome or flag run ONE more
    # unflagged extraction (committed per sample, like the RUS prep
    # bodies) and decode ITS syndrome — with the flag-conditioned hook
    # table where a flag fired, the standard LUT otherwise. Single-fault
    # FT: a measurement flip corrupts only extraction 1 (unused); a hook
    # fires its flag and extraction 2 reads the hook's full syndrome,
    # which the conditional table corrects exactly; a fault inside
    # extraction 2 implies extraction 1 was clean, so the state is clean
    # and any weight<=1 mis-correction is correctable next round.

    def _flag_anc_qubits(self, b):
        """(syndrome-ancilla, flag) bare qubit indices serving block b —
        the first two qubits of the block's anc1 ancilla block."""
        anc1, _ = self._anc_pair(b)
        base = (jnp.asarray(anc1, jnp.int32) * self.engine.stride).reshape(1)
        return base, base + 1

    def _flag_cnot(self, st: MachineState, qc, qt) -> MachineState:
        st, sub = self._split(st)
        return st._replace(tab=self.engine.cnot_qubits(st.tab, qc, qt, sub))

    def _flag_h(self, st: MachineState, q) -> MachineState:
        st, sub = self._split(st)
        return st._replace(tab=self.engine.h_qubits(st.tab, q, sub))

    def _flag_meas(self, st: MachineState, q):
        tab, out = self.engine.measure_qubits(st.tab, q)
        st = st._replace(tab=tab)
        out = out[:, 0]
        if self.noise.p_meas:
            st, sub = self._split(st)
            out = noise_mod.flip_bits(out, self.nv.p_meas, sub)
        return st, out

    def _flag_reset_pair(self, st: MachineState, pair_q) -> MachineState:
        tab = self.engine.reset_blocks(st.tab, pair_q)
        st = st._replace(tab=tab)
        if self.noise.p_reset:
            st, sub = self._split(st)
            B = st.x_frames.shape[0]
            flips = jax.random.bernoulli(
                sub, self.nv.p_reset, (B, 2)).astype(jnp.uint8)
            st = st._replace(tab=self.engine._fr.inject_flips(
                st.tab, pair_q, flips, jnp.zeros_like(flips)))
        return st

    def _flag_idle_block(self, st: MachineState, b, flagged: bool) -> MachineState:
        """Per-qubit idle noise WITHIN block b over one full extraction:
        qubit q idles for (total steps - #stabilizers touching q); the
        per-qubit composed channel is evaluated in closed form, one draw."""
        if not self._idle_on:
            return st
        steps = (self._flag.idle_steps_flagged if flagged
                 else self._flag.idle_steps_unflagged)
        rate = self.nv.rate_idle
        if isinstance(rate, tuple):
            px, py, pz = rate
        else:
            px = py = pz = rate / 3.0
        s = jnp.asarray(steps, jnp.float32)
        lx = jnp.power(1.0 - 2.0 * (py + pz), s)
        ly = jnp.power(1.0 - 2.0 * (px + pz), s)
        lz = jnp.power(1.0 - 2.0 * (px + py), s)
        px2 = jnp.maximum((1.0 + lx - ly - lz) / 4.0, 0.0)
        py2 = jnp.maximum((1.0 - lx + ly - lz) / 4.0, 0.0)
        pz2 = jnp.maximum((1.0 - lx - ly + lz) / 4.0, 0.0)
        st, sub = self._split(st)
        B = st.x_frames.shape[0]
        u = jax.random.uniform(sub, (B, self.n), dtype=jnp.float32)
        xf = (u < (px2 + py2)[None]).astype(jnp.uint8)
        zf = ((u >= px2[None]) & (u < (px2 + py2 + pz2)[None])).astype(jnp.uint8)
        return st._replace(
            tab=self.engine.inject_block_flips(st.tab, b, xf, zf))

    def _flag_extract(self, st: MachineState, b, flagged: bool):
        """One full (both-sector) bare-ancilla syndrome extraction of
        block b. Returns (st, syn_x [B,r2], syn_z [B,r1], flags_z [B,r2],
        flags_x [B,r1]); syndromes are relative to the known frames, flag
        arrays are zeros when flagged=False. Hook directions: the Z-type
        stabilizers (H2 rows, the anc-|0> circuits) hook Z errors, so
        their flags land in flags_z; mirrored for H1."""
        from qcss_tpu.ops import gf2_jax

        B = st.x_frames.shape[0]
        off = jnp.asarray(b, jnp.int32) * self.engine.stride
        anc_q, flag_q = self._flag_anc_qubits(b)
        pair_q = jnp.concatenate([anc_q, flag_q])

        def one_stab(st, sup, x_type: bool):
            """x_type=False: Z-stab (anc |0>, CNOT data->anc, measure Z);
            x_type=True: X-stab (anc |+>, CNOT anc->data, measure X)."""
            st = self._flag_reset_pair(st, pair_q)
            dq = off + jnp.asarray(sup, jnp.int32)
            if x_type:
                st = self._flag_h(st, anc_q)
            elif flagged:
                st = self._flag_h(st, flag_q)      # flag |+> for Z-stabs

            def dcnot(st, j):
                if x_type:
                    return self._flag_cnot(st, anc_q, dq[j:j + 1])
                return self._flag_cnot(st, dq[j:j + 1], anc_q)

            def fcnot(st):
                if x_type:
                    return self._flag_cnot(st, anc_q, flag_q)
                return self._flag_cnot(st, flag_q, anc_q)

            st = dcnot(st, 0)
            if flagged:
                st = fcnot(st)
            for j in range(1, len(sup) - 1):
                st = dcnot(st, j)
            if flagged:
                st = fcnot(st)
            if len(sup) > 1:
                st = dcnot(st, len(sup) - 1)
            if x_type:
                st = self._flag_h(st, anc_q)
            st, bit = self._flag_meas(st, anc_q)
            fb = None
            if flagged:
                if not x_type:
                    st = self._flag_h(st, flag_q)  # X-basis flag readout
                st, fb = self._flag_meas(st, flag_q)
            return st, bit, fb

        syn_x_bits, fz_bits = [], []
        for sup in self._flag.z_sector.supports:
            st, bit, fb = one_stab(st, sup, x_type=False)
            syn_x_bits.append(bit)
            if flagged:
                fz_bits.append(fb)
        syn_z_bits, fx_bits = [], []
        for sup in self._flag.x_sector.supports:
            st, bit, fb = one_stab(st, sup, x_type=True)
            syn_z_bits.append(bit)
            if flagged:
                fx_bits.append(fb)

        syn_x = jnp.stack(syn_x_bits, axis=1) ^ gf2_jax.syndromes_dense(
            st.x_frames[:, b], self.h2)
        syn_z = jnp.stack(syn_z_bits, axis=1) ^ gf2_jax.syndromes_dense(
            st.z_frames[:, b], self.h1)
        r2, r1 = len(syn_x_bits), len(syn_z_bits)
        fz = (jnp.stack(fz_bits, axis=1) if flagged
              else jnp.zeros((B, r2), jnp.uint8))
        fx = (jnp.stack(fx_bits, axis=1) if flagged
              else jnp.zeros((B, r1), jnp.uint8))
        # idle: every OTHER data block waits out the extraction; block b's
        # own off-support qubits idle per the static per-qubit step counts
        steps = (self._flag.steps_flagged if flagged
                 else self._flag.steps_unflagged)
        st = self._idle_data(st, (b,), steps)
        st = self._flag_idle_block(st, b, flagged)
        return st, syn_x, syn_z, fz, fx

    def _ec_one_flag(self, st: MachineState, b) -> MachineState:
        """One flag-EC round on block b (see section comment)."""
        from qcss_tpu.ops import gf2_jax

        st1, sx1, sz1, fz, fx = self._flag_extract(st, b, flagged=True)
        needs2 = (jnp.any(sx1 == 1, axis=1) | jnp.any(sz1 == 1, axis=1)
                  | jnp.any(fz == 1, axis=1) | jnp.any(fx == 1, axis=1)
                  ).astype(jnp.uint8)
        st2, sx2, sz2, _, _ = self._flag_extract(st1, b, flagged=False)
        st2 = self._select_state(needs2, st2, st1)
        m = needs2.astype(bool)[:, None]
        sx2 = jnp.where(m, sx2, jnp.zeros_like(sx2))
        sz2 = jnp.where(m, sz2, jnp.zeros_like(sz2))

        any_fx = jnp.any(fx == 1, axis=1)
        corr_x = jnp.where(
            any_fx[:, None],
            self._flag_cond_x[jnp.argmax(fx, axis=1),
                              gf2_jax.bits_to_index(sx2)],
            decode_lut.decode_corrections(sx2, self.lut2))
        st2 = st2._replace(x_frames=st2.x_frames.at[:, b].set(
            st2.x_frames[:, b] ^ corr_x))

        any_fz = jnp.any(fz == 1, axis=1)
        corr_z = jnp.where(
            any_fz[:, None],
            self._flag_cond_z[jnp.argmax(fz, axis=1),
                              gf2_jax.bits_to_index(sz2)],
            decode_lut.decode_corrections(sz2, self.lut1))
        return st2._replace(z_frames=st2.z_frames.at[:, b].set(
            st2.z_frames[:, b] ^ corr_z))

    # -- parallel EC (ec_schedule='parallel'; frames engine) ----------------------
    #
    # The serial path runs one block's Steane round at a time (the
    # reference's structure — one shared scratch, every other block
    # waiting: ftqc.py:153-171); with idle noise that wait converts
    # directly into data errors. The parallel path runs EVERY block's
    # round simultaneously: all ancilla preps in one multi-window
    # compiled-circuit execution, all transversal CNOTs in one pairwise
    # call, all measurements in one readout — so a wide program pays ONE
    # round of idle exposure instead of n_logical of them.

    def _reset_blocks_par(self, st: MachineState, blocks, qubits) -> MachineState:
        st, _ = self._split(st)
        tab = self.engine.reset_blocks(st.tab, qubits)
        if self.noise.p_reset:
            st, sub = self._split(st)
            flips = jax.random.bernoulli(
                sub, self.nv.p_reset,
                (st.x_frames.shape[0], qubits.size)).astype(jnp.uint8)
            tab = self.engine._fr.inject_flips(
                tab, jnp.asarray(qubits).reshape(-1), flips,
                jnp.zeros_like(flips))
        zeros_f = jnp.zeros(
            (st.x_frames.shape[0], len(blocks), self.n), jnp.uint8)
        return st._replace(
            tab=tab,
            x_frames=st.x_frames.at[:, jnp.asarray(blocks)].set(zeros_f),
            z_frames=st.z_frames.at[:, jnp.asarray(blocks)].set(zeros_f),
        )

    def _prep_blocks_par(self, st: MachineState, windows, plus: bool) -> MachineState:
        st, sub = self._split(st)
        comp = self._prep_plus_comp if plus else self._prep_zero_comp
        return st._replace(
            tab=self.engine.run_compiled_multi(st.tab, comp, windows, sub))

    def _measure_blocks_par(self, st: MachineState, qubits):
        st, _ = self._split(st)
        tab, outs = self.engine.measure_qubits(st.tab, qubits)
        st = st._replace(tab=tab)
        if self.noise.p_meas:
            st, sub = self._split(st)
            outs = noise_mod.flip_bits(outs, self.nv.p_meas, sub)
        B = outs.shape[0]
        return st, outs.reshape(B, self.n_logical, self.n)

    def _detect_par(self, st: MachineState, x_sector: bool,
                    include_operators: bool):
        """All-blocks error detection: verify every anc1 block against its
        anc2 partner (the multi-block `_error_detect`). Returns
        (state, flags [B, L])."""
        p = self._par
        st = self._reset_blocks_par(st, p["anc2_blocks"], p["anc2_q"])
        if x_sector:
            st = self._prep_blocks_par(st, p["anc2_q"],
                                       plus=not include_operators)
            st, sub = self._split(st)
            st = st._replace(tab=self.engine.cnot_qubits(
                st.tab, p["anc1_q"], p["anc2_q"], sub))
        else:
            st = self._prep_blocks_par(st, p["anc2_q"],
                                       plus=include_operators)
            st, sub = self._split(st)
            st = st._replace(tab=self.engine.cnot_qubits(
                st.tab, p["anc2_q"], p["anc1_q"], sub))
            st, sub = self._split(st)
            st = st._replace(tab=self.engine.h_qubits(
                st.tab, p["anc2_q"], sub))
        st, mem = self._measure_blocks_par(st, p["anc2_q"])
        if x_sector:
            check = (self.detect_x_with_ops if include_operators
                     else self.detect_x_plain)
            frame = st.x_frames[:, jnp.asarray(p["anc1_blocks"])]
        else:
            check = (self.detect_z_with_ops if include_operators
                     else self.detect_z_plain)
            frame = st.z_frames[:, jnp.asarray(p["anc1_blocks"])]
        return st, decode_lut.detect_errors(mem, frame, check)

    def _encode_ft_par(self, st: MachineState, plus: bool) -> MachineState:
        """FT-prepare ALL anc1 blocks at once, with per-(sample, block)
        repeat-until-success: a block that verified keeps its state while
        its neighbors retry (possible on frames because block columns are
        independent; a tableau's rows are not block-separable)."""
        p = self._par
        B = st.x_frames.shape[0]
        L = self.n_logical
        # commit columns: each anc pair commits as one unit
        cols = np.concatenate([p["anc1_q"], p["anc2_q"]], axis=1)  # [L, 2n]
        fidx = np.repeat(np.arange(L), 2 * self.n)
        cols_flat = cols.reshape(-1)
        ablocks = np.concatenate([p["anc1_blocks"], p["anc2_blocks"]])
        bidx = np.concatenate([np.arange(L), np.arange(L)])

        def body(carry):
            st_in, flag, attempts = carry
            s = self._reset_blocks_par(st_in, p["anc1_blocks"], p["anc1_q"])
            s = self._prep_blocks_par(s, p["anc1_q"], plus)
            if plus:
                s, out_a = self._detect_par(s, True, False)
                s, out_b = self._detect_par(s, False, True)
            else:
                s, out_a = self._detect_par(s, False, False)
                s, out_b = self._detect_par(s, True, True)
            new_flag = out_a | out_b  # [B, L]
            colmask = flag[:, fidx]
            tab = self.engine.select_qubits(
                st_in.tab, cols_flat, colmask, s.tab, st_in.tab)
            mb = jnp.zeros((B, self.n_blocks), jnp.uint8).at[
                :, jnp.asarray(ablocks)].set(flag[:, bidx]).astype(bool)
            committed = MachineState(
                tab,
                jnp.where(mb[:, :, None], s.x_frames, st_in.x_frames),
                jnp.where(mb[:, :, None], s.z_frames, st_in.z_frames),
                st_in.votes, st_in.memory, s.key, st_in.prep_fail,
            )
            # Idle on the DATA blocks must be charged AFTER the commit:
            # the per-(sample, block) commit above only writes ancilla
            # columns, so an injection inside the body would be silently
            # reverted (a bug caught when a 1-block program showed the
            # parallel schedule "beating" the serial one 6.7x — they
            # charge identical idle for one block).
            committed = self._idle_data(
                committed, (), self._attempt_steps[plus],
                sample_mask=jnp.any(flag.astype(bool), axis=1))
            flag = flag & new_flag
            return committed, flag, attempts + 1

        def cond(carry):
            _, flag, attempts = carry
            return jnp.any(flag.astype(bool)) & (
                attempts < self.max_prep_attempts)

        flag0 = jnp.ones((B, L), jnp.uint8)
        st, flag, _ = jax.lax.while_loop(cond, body, (st, flag0, jnp.int32(0)))
        return st._replace(
            prep_fail=st.prep_fail | jnp.any(flag, axis=1).astype(jnp.uint8))

    def _extract_sector_par(self, st: MachineState, x_sector: bool):
        """One all-blocks syndrome extraction; returns (state, syn [B, L, r])."""
        from qcss_tpu.ops import gf2_jax

        p = self._par
        st = self._encode_ft_par(st, plus=x_sector)
        st, sub = self._split(st)
        if x_sector:
            st = st._replace(tab=self.engine.cnot_qubits(
                st.tab, p["data_q"], p["anc1_q"], sub))
        else:
            st = st._replace(tab=self.engine.cnot_qubits(
                st.tab, p["anc1_q"], p["data_q"], sub))
            st, sub = self._split(st)
            st = st._replace(tab=self.engine.h_qubits(st.tab, p["anc1_q"], sub))
            st = self._idle_data(st, (), 1)  # H layer on the ancillas
        st, mem = self._measure_blocks_par(st, p["anc1_q"])
        st = self._idle_data(st, (), 1)      # readout layer
        L = self.n_logical
        if x_sector:
            frame = st.x_frames[:, :L]
            syn = gf2_jax.syndromes_dense(mem ^ frame, self.h2)
        else:
            frame = st.z_frames[:, :L]
            syn = gf2_jax.syndromes_dense(mem ^ frame, self.h1)
        return st, syn

    def _ec_all_parallel(self, st: MachineState) -> MachineState:
        L = self.n_logical
        for x_sector, lut in ((True, self.lut2), (False, self.lut1)):
            st, syn = self._extract_sector_par(st, x_sector)
            commit = None
            if self.ec_extractions > 1:
                st, syn2 = self._extract_sector_par(st, x_sector)
                commit = jnp.all(syn == syn2, axis=-1)  # [B, L]
            corr = decode_lut.decode_corrections(syn, lut)  # [B, L, n]
            if commit is not None:
                corr = jnp.where(commit[:, :, None], corr,
                                 jnp.zeros_like(corr))
            if x_sector:
                st = st._replace(x_frames=st.x_frames.at[:, :L].set(
                    st.x_frames[:, :L] ^ corr))
            else:
                st = st._replace(z_frames=st.z_frames.at[:, :L].set(
                    st.z_frames[:, :L] ^ corr))
        return st

    # -- macro-op bodies --------------------------------------------------------------

    def _op_prep_zero(self, st: MachineState, a) -> MachineState:
        mask = self._cond_mask(st, a[1])
        anc1, _ = self._anc_pair(a[0])
        new = self._encode_ft(st, a[0], anc1, plus=False, busy_data=(a[0],))
        return self._select_state(mask, new, st)

    def _op_gate(self, st: MachineState, a) -> MachineState:
        gate_id, b0, b1, cond = a[0], a[1], a[2], a[3]
        mask = self._cond_mask(st, cond)
        st = self._apply_gate(st, gate_id, b0, b1, mask)
        if self._idle_on:
            # one transversal layer elsewhere; 1q gates carry b1 = 0 in
            # the lowered row, so mask it to b0 there
            b1_eff = jnp.where(jnp.asarray(gate_id) >= GATE_IDS["CNOT"],
                               b1, b0)
            st = self._idle_data(st, (b0, b1_eff), 1, sample_mask=mask)
        return st

    def _apply_gate(self, st: MachineState, gate_id, b0, b1, mask) -> MachineState:
        """Logical gate dispatch (reference: css_code.py:368-434), masked per
        sample. gate_id may be traced (lax.switch) or a Python int."""

        def pauli_branch(s, x_row, z_row):
            # Logical Pauli = masked frame injection along the operator's
            # support at block b0: conjugating a Pauli through the tableau
            # only flips row signs (reference applies physical gates along
            # the operator — css_code.py:386-407 — which is the same map).
            s2 = s._replace(
                tab=self.engine.pauli_inject(s.tab, b0, x_row, z_row, mask)
            )
            if self.noise.p_gate1:
                s2, sub = self._split(s2)
                s2 = s2._replace(
                    tab=self.engine.depolarize_block(
                        s2.tab, b0, self.nv.rate1, sub
                    )
                )
                # Samples whose conditional gate did not fire get no noise
                # location either (the reference's jump skips the gate).
                s2 = s2._replace(tab=self.engine.select(mask, s2.tab, s.tab))
            return s2

        xop, zop = self.logical_x[0], self.logical_z[0]
        zeros_row = jnp.zeros_like(xop)
        if self.reference_mode:
            # The reference run excludes Paulis (they ride the frame).
            def pauli_branch(s, x_row, z_row):  # noqa: F811
                return s

        def masked(s, apply_fn):
            s2 = apply_fn(s)
            return s2._replace(tab=self.engine.select(mask, s2.tab, s.tab))

        branches = [
            lambda s: s,                                            # I
            lambda s: pauli_branch(s, xop, zeros_row),              # X
            lambda s: pauli_branch(s, xop, zop),                    # Y
            lambda s: pauli_branch(s, zeros_row, zop),              # Z
            lambda s: masked(s, lambda t: self._transversal_1q(t, "H", b0)),   # H
            lambda s: masked(s, lambda t: self._transversal_1q(
                self._transversal_1q(t, "Z", b0), "S", b0)),                   # S
            lambda s: masked(s, lambda t: self._transversal_cnot(t, b0, b1)),  # CNOT
            lambda s: masked(s, lambda t: self._cz(t, b0, b1)),                # CZ
        ]
        return jax.lax.switch(gate_id, branches, st)

    def _cz(self, st: MachineState, b0, b1) -> MachineState:
        st, sub = self._split(st)
        return st._replace(tab=self.engine.transversal_cz(st.tab, b0, b1, sub))

    def _op_ec_all(self, st: MachineState, a) -> MachineState:
        mask = self._cond_mask(st, a[0])
        if self.ec_mode == "flag":
            new = jax.lax.fori_loop(
                0, self.n_logical, lambda b, s: self._ec_one_flag(s, b), st
            )
        elif self.ec_schedule == "parallel":
            new = self._ec_all_parallel(st)
        else:
            new = jax.lax.fori_loop(
                0, self.n_logical, lambda b, s: self._ec_one(s, b), st
            )
        return self._select_state(mask, new, st)

    def _noisy_measure(self, st: MachineState, b):
        """Single (non-FT) logical Z measurement of block b via a fresh |0̄⟩
        ancilla (reference: css_code.py:599-646): transversal CNOT onto the
        ancilla, measure it, opportunistically correct the X frame, outcome
        = Z̄ · corrected bits. Returns (state, outcome[B])."""
        anc1, anc2 = self._anc_pair(b)
        st = self._encode_ft(st, anc1, anc2, plus=False)
        st = self._transversal_cnot(st, b, anc1)
        st = self._idle_data(st, (b,), 1)
        st, mem = self._measure_block(st, anc1)
        st = self._idle_data(st, (), 1)
        corrected, new_x = decode_lut.correct_errors(
            mem, st.x_frames[:, b, :], self.h2, self.lut2
        )
        st = st._replace(x_frames=st.x_frames.at[:, b, :].set(new_x))
        zbar = self.logical_z[0]
        outcome = (
            jnp.sum(corrected.astype(jnp.int32) * zbar.astype(jnp.int32), axis=-1) & 1
        ).astype(jnp.uint8)
        return st, outcome

    def _op_measure_trial(self, st: MachineState, a) -> MachineState:
        b, slot = a[0], a[1]
        if self.reference_mode:
            # Force the trial (deterministic measurement is non-demolition)
            # so its reference outcome gets recorded even inside loops.
            mask = jnp.ones((st.tab.batch,), jnp.uint8)
        else:
            mask = self._cond_mask(st, a[2])
        new, outcome = self._noisy_measure(st, b)
        # a[4]: the reference outcome of this measure site (zero except in
        # frame-engine runs, where `outcome` is a deviation).
        outcome = outcome ^ a[4].astype(jnp.uint8)
        new = new._replace(votes=new.votes.at[:, slot].set(outcome))
        return self._select_state(mask, new, st)  # also reverts the vote slot

    def _op_vote_store(self, st: MachineState, a) -> MachineState:
        trials = self.trials
        mask = self._cond_mask(st, a[1])
        counts = jnp.sum(st.votes[:, :trials].astype(jnp.int32), axis=-1)
        outcome = (counts >= (trials + 1) // 2).astype(jnp.uint8)
        stored = jnp.where(mask.astype(bool), outcome, st.memory[:, a[0]])
        return st._replace(memory=st.memory.at[:, a[0]].set(stored))

    def _op_classical(self, st: MachineState, a) -> MachineState:
        """Classical bit op on memory (reference: quil_classical.py:60-127
        semantics, batched). a = (cop, dst, src_enc, cond)."""
        cop, dst, src, cond = a[0], a[1], a[2], a[3]
        mask = self._cond_mask(st, cond)
        cur = st.memory[:, jnp.maximum(dst, 0)]
        imm = jnp.asarray(-src - 1, jnp.int32).astype(jnp.uint8)
        srcval = jnp.where(src >= 0, st.memory[:, jnp.maximum(src, 0)], imm)
        new = jax.lax.switch(cop, [
            lambda c, s: s,                      # MOVE
            lambda c, s: jnp.uint8(1) ^ c,       # NOT
            lambda c, s: c & s,                  # AND
            lambda c, s: c | s,                  # IOR
            lambda c, s: c ^ s,                  # XOR
        ], cur, srcval)
        stored = jnp.where(mask.astype(bool), new, cur)
        return st._replace(memory=st.memory.at[:, dst].set(stored))

    # -- top level -----------------------------------------------------------------------

    def set_rates(self, vec) -> None:
        """Swap the noise VALUE source to a (traced) `flat_rates()` vector
        for the current trace; pair with `reset_rates()`. Lets the jitted
        row-runner take rates as an argument, so a p-sweep shares one
        compiled executor (see NoiseModel.static_key)."""
        view = self.noise.view(vec)
        self.nv = view
        self.engine.nv = view

    def reset_rates(self) -> None:
        self.nv = self.noise
        self.engine.nv = self.noise

    def run_rows(self, rows: jax.Array, key: jax.Array, batch: int,
                 memory_size: int, capture_votes: bool = False):
        """Execute macro rows ([T, 6] int32: opcode, a0..a3, reference
        outcome) given as a TRACED argument: one compiled executor per
        (config, row-count bucket, memory_size) serves every program —
        the compile-once/run-many form `EncodedProgram` shares across
        programs. Rows may be padded with `OP_NOP`."""
        zeros_f = jnp.zeros((batch, self.n_blocks, self.n), dtype=jnp.uint8)
        st = MachineState(
            tab=self.engine.zero_state(batch),
            x_frames=zeros_f,
            z_frames=zeros_f,
            votes=jnp.zeros((batch, self.trials), dtype=jnp.uint8),
            memory=jnp.zeros((batch, memory_size), dtype=jnp.uint8),
            key=key,
            prep_fail=jnp.zeros((batch,), dtype=jnp.uint8),
        )
        bodies = [
            self._op_prep_zero,
            self._op_gate,
            self._op_ec_all,
            self._op_measure_trial,
            self._op_vote_store,
            self._op_classical,
            lambda st, a: st,  # OP_NOP
        ]

        def step(carry, row):
            new = jax.lax.switch(row[0], bodies, carry, row[1:])
            return new, (new.votes if capture_votes else None)

        st, ys = jax.lax.scan(step, st, jnp.asarray(rows, jnp.int32))
        return (st, ys) if capture_votes else st

    def execute(self, macro: MacroProgram, key: jax.Array, batch: int,
                ref_outs: np.ndarray | None = None,
                capture_votes: bool = False):
        """Run the macro program. ``ref_outs`` ([T] reference measurement
        outcomes) is required by the 'frames' engine (see
        `reference_outcomes`) and zero-filled otherwise.
        ``capture_votes=True`` additionally returns the votes array after
        every op ([T, B, trials]) — the reference-recording hook."""
        rows = macro_rows(macro, ref_outs)
        return self.run_rows(rows, key, batch, macro.memory_size,
                             capture_votes=capture_votes)


# code -> {("ex"/"fn", n_logical): shared reference-outcome recorder};
# weak so test codes don't pin compiled executables
import weakref

_REF_RECORDERS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def macro_rows(macro: MacroProgram, ref_outs: np.ndarray | None = None,
               pad_to: int | None = None) -> np.ndarray:
    """[T, 6] executor rows (ops + reference-outcome column), optionally
    NOP-padded to ``pad_to`` rows (shape-bucketing for shared compiles)."""
    ops = np.asarray(macro.ops)
    ref_col = (
        np.zeros((ops.shape[0], 1), np.int32) if ref_outs is None
        else np.asarray(ref_outs, np.int32).reshape(-1, 1)
    )
    rows = np.concatenate([ops, ref_col], axis=1).astype(np.int32)
    if pad_to is not None and pad_to > rows.shape[0]:
        pad = np.zeros((pad_to - rows.shape[0], 6), np.int32)
        pad[:, 0] = OP_NOP
        rows = np.concatenate([rows, pad], axis=0)
    return rows


def reference_outcomes(macro: MacroProgram, code, *, batch: int = 32,
                       seed: int = 0) -> np.ndarray:
    """Record the reference outcome of every measure site by running the
    macro program ONCE, noiselessly, on the unpacked tableau engine with
    Paulis skipped (`reference_mode`) — the frame engine XORs these into
    its outcome deviations. `batch` independent reference samples double
    as the determinism check (a random outcome disagrees across 32 samples
    with probability 1 - 2^-31): raises `UnsupportedProgramError` if any
    measure site is non-deterministic, the frame engine's soundness
    condition (e.g. a program measuring a block left in |+̄⟩)."""
    from qcss_tpu.errors import UnsupportedProgramError

    # Shared compiled recorders: the reference run's config is fully
    # determined by (code, n_logical), so one compiled row-runner per
    # (code, n_logical, row bucket, memory_size) records EVERY frames
    # program's reference outcomes — without this, each frames program
    # paid its own ~30-60 s recorder compile on top of the shared
    # executor (measured as the dominant suite cost).
    per_code = _REF_RECORDERS.setdefault(code, {})
    ex = per_code.get(("ex", macro.n_logical))
    if ex is None:
        ex = MacroExecutor(code, macro.n_logical, noise=None,
                           tableau_engine="unpacked", reference_mode=True)
        per_code[("ex", macro.n_logical)] = ex
    fn = per_code.get(("fn", macro.n_logical))
    if fn is None:
        def fn(rows, k, batch, memory_size):
            _, votes = ex.run_rows(rows, k, batch, memory_size,
                                   capture_votes=True)
            return votes
        fn = jax.jit(fn, static_argnames=("batch", "memory_size"))
        per_code[("fn", macro.n_logical)] = fn
    t = macro.ops.shape[0]
    pad_to = 8
    while pad_to < t:
        pad_to *= 2
    rows = jnp.asarray(macro_rows(macro, None, pad_to=pad_to))
    votes_t = np.asarray(
        fn(rows, jax.random.key(seed), batch, macro.memory_size)
    )  # [Tpad, B, trials]
    ops = macro.ops
    refs = np.zeros(ops.shape[0], np.int32)
    for t in range(ops.shape[0]):
        if ops[t, 0] == OP_MEASURE_TRIAL:
            vals = votes_t[t][:, ops[t, 2]]
            if not (vals == vals[0]).all():
                raise UnsupportedProgramError(
                    "non-deterministic reference measurement at macro op "
                    f"{t}; the 'frames' engine requires every measured "
                    "block to be in a definite Z̄ eigenstate — use the "
                    "'unpacked' or 'packed' tableau engine for this program"
                )
            refs[t] = int(vals[0])
    return refs
