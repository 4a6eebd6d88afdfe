"""The FT transpiler: rewrite a raw Clifford program into fault-tolerant
encoded form.

`rewrite_program(raw, code)` validates the program and produces an
`EncodedProgram` (reference analogue: ftqc.py:42-120). Execution follows the
reference's structure exactly:

* one code block per program qubit + two shared ancilla blocks (the
  reference shares ancillas to stay simulable on the QVM and notes the
  fault-tolerance cost — reference: ftqc.py:153-160; kept here because it
  also bounds tableau width),
* FT |0̄⟩ preparation of every block up front (reference: ftqc.py:77-78),
* a round of Steane error correction on EVERY block after each logical gate
  (reference: ftqc.py:86),
* FT measurement with error correction interleaved between the 2t+1 trials
  (reference: ftqc.py:91-95),
* structured `if_then` feedback executed as masked gate application — the
  reference routes this through Quil jump instructions with mangled labels
  (reference: ftqc.py:98-103), which have no analogue in a traced program.

Unlike the reference, the result is not an instruction list but a callable
that jits end-to-end over a batch of shots.
"""

from __future__ import annotations

import weakref

import jax
import jax.numpy as jnp
import numpy as np

# code object -> {config tuple -> shared jitted row-runner}; weak so codes
# built in tests don't pin compiled executables (and never keyed by id()
# of temporaries — the code instance itself is the key)
_SCHEDULED_RUNNERS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()

from qcss_tpu.circuits.ir import (
    BitRef,
    ClassicalInst,
    DeclareInst,
    PragmaInst,
    GateInst,
    GuardedInst,
    IfThenInst,
    MeasureInst,
    Program,
    RepeatUntilInst,
    ResetInst,
)
from qcss_tpu.errors import (
    UnsupportedGateError,
    UnsupportedProgramError,
    UnsupportedQECCError,
)
from qcss_tpu.ftqc.executor import ExecState, FTProtocols
from qcss_tpu.sim import noise as noise_mod


class EncodedProgram:
    """A validated FT-encoded program, executable over a batch of shots."""

    def __init__(self, raw: Program, code, noise: noise_mod.NoiseModel | None = None,
                 max_prep_attempts: int = 8, engine: str = "scheduled",
                 tableau: str = "unpacked", ancillas: str = "shared",
                 ec_extractions: int = 1, ec_schedule: str = "serial",
                 ec_mode: str = "steane"):
        if code.k != 1:
            raise UnsupportedQECCError("code must have k = 1")
        if engine not in ("scheduled", "unrolled"):
            raise ValueError("engine must be 'scheduled' or 'unrolled'")
        if tableau not in ("unpacked", "packed", "frames"):
            raise ValueError("tableau must be 'unpacked', 'packed' or 'frames'")
        if engine == "unrolled" and tableau != "unpacked":
            raise ValueError(f"the {tableau} engine requires the scheduled engine")
        if ancillas not in ("shared", "dedicated"):
            raise ValueError("ancillas must be 'shared' or 'dedicated'")
        if engine == "unrolled" and ancillas == "dedicated":
            raise ValueError("dedicated ancillas require the scheduled engine")
        if engine == "unrolled" and ec_extractions != 1:
            raise ValueError("repeated extraction requires the scheduled engine")
        if ec_schedule == "parallel" and engine == "unrolled":
            raise ValueError("parallel EC requires the scheduled engine")
        if ec_schedule == "parallel" and ancillas != "dedicated":
            raise ValueError("ec_schedule='parallel' requires "
                             "ancillas='dedicated'")
        if ec_schedule == "parallel" and tableau != "frames":
            raise ValueError("ec_schedule='parallel' requires "
                             "tableau='frames'")
        if ec_mode not in ("steane", "flag"):
            raise ValueError("ec_mode must be 'steane' or 'flag'")
        if ec_mode == "flag":
            if engine != "scheduled":
                raise ValueError("ec_mode='flag' requires the scheduled engine")
            if tableau != "frames":
                raise ValueError("ec_mode='flag' requires tableau='frames'")
            if ec_extractions != 1:
                raise ValueError("ec_mode='flag' has its own adaptive "
                                 "re-extraction; use ec_extractions=1")
            if ec_schedule != "serial":
                raise ValueError("ec_mode='flag' requires ec_schedule='serial'")
        self.ec_mode = ec_mode
        self.raw = raw
        self.code = code
        self.noise = noise or noise_mod.NoiseModel()
        self.engine = engine
        self.tableau = tableau
        self.ancillas = ancillas
        self.ec_extractions = ec_extractions
        self.ec_schedule = ec_schedule
        self.max_prep_attempts = max_prep_attempts
        self.qubit_map = {q: i for i, q in enumerate(raw.qubits())}
        self.n_logical = len(self.qubit_map)
        # Blocks: one per logical qubit, then two shared EC/measure ancillas.
        self.protocols = FTProtocols(
            code, self.n_logical + 2, self.noise, max_prep_attempts
        )
        self.memory = dict(raw.memory)
        self._compiled = None  # jit wrapper, built once (a fresh jax.jit
        # per run() would retrace and recompile on every call)
        self._scheduled = None  # (macro, executor, ref_outs), built once
        self._validate()

    def _validate(self):
        code = self.code

        def check_gate(name: str, kind: str):
            if name not in ("I", "X", "Y", "Z") and not code.is_transversal(name):
                raise UnsupportedGateError(
                    f"{kind} logical gate {name} not implemented for this code"
                )

        def check_frame_body(g: GateInst, kind: str):
            # Frame-engine soundness: per-sample conditional NON-Pauli
            # gates would make the reference trajectory sample-dependent,
            # invalidating the recorded reference outcomes. Conditional
            # Paulis ride the frame exactly, so they are fine.
            if self.tableau == "frames" and g.name not in ("I", "X", "Y", "Z"):
                raise UnsupportedProgramError(
                    f"{kind} non-Pauli gate {g.name} is not supported by "
                    "the 'frames' engine (sample-dependent reference); use "
                    "a tableau engine"
                )

        def check_guarded(g, kind: str):
            if self.engine != "scheduled":
                raise UnsupportedProgramError(
                    "guarded instructions require the scheduled engine")
            if isinstance(g.inner, GateInst):
                check_gate(g.inner.name, kind)
                check_frame_body(g.inner, kind)

        for inst in self.raw.instructions:
            if isinstance(inst, GateInst):
                check_gate(inst.name, "")
            elif isinstance(inst, IfThenInst):
                for g in inst.body:
                    check_gate(g.name, "conditional")
                    check_frame_body(g, "conditional")
            elif isinstance(inst, GuardedInst):
                check_guarded(inst, "guarded")
            elif isinstance(inst, RepeatUntilInst):
                if self.engine != "scheduled":
                    raise UnsupportedProgramError(
                        "repeat_until requires the scheduled engine"
                    )
                for b in inst.body:
                    if isinstance(b, GateInst):
                        check_gate(b.name, "looped")
                        check_frame_body(b, "looped")
                    elif isinstance(b, GuardedInst):
                        check_guarded(b, "looped guarded")
            elif isinstance(inst, (MeasureInst, ResetInst, DeclareInst,
                                   ClassicalInst, PragmaInst)):
                continue
            else:
                raise UnsupportedProgramError(f"unsupported instruction: {inst}")

    # -- execution ---------------------------------------------------------------

    def _blocks(self):
        p = self.protocols
        data = [p.block(i) for i in range(self.n_logical)]
        anc1 = p.block(self.n_logical)
        anc2 = p.block(self.n_logical + 1)
        return data, anc1, anc2

    def _execute(self, key: jax.Array, batch: int) -> dict[str, jax.Array]:
        p = self.protocols
        data, anc1, anc2 = self._blocks()
        st = p.init_state(batch, key)
        mem = {
            name: jnp.zeros((batch, size), dtype=jnp.uint8)
            for name, size in self.memory.items()
        }

        def ec_all(s: ExecState) -> ExecState:
            for block in data:
                s = p.error_correct(s, block, anc1, anc2)
            return s

        # FT-prepare every logical block in |0̄⟩ (reference: ftqc.py:77-78).
        for block in data:
            st = p.encode_zero(st, block, anc1)

        for inst in self.raw.instructions:
            if isinstance(inst, (DeclareInst, PragmaInst)):
                continue
            if isinstance(inst, GateInst):
                blocks = [data[self.qubit_map[q]] for q in inst.qubits]
                st = p.apply_logical_gate(st, inst.name, blocks)
                st = ec_all(st)
            elif isinstance(inst, IfThenInst):
                mask = mem[inst.condition.name][:, inst.condition.index]
                for g in inst.body:
                    blocks = [data[self.qubit_map[q]] for q in g.qubits]
                    st = p.apply_logical_gate(st, g.name, blocks, mask=mask)
                    st = ec_all(st)
            elif isinstance(inst, MeasureInst):
                block = data[self.qubit_map[inst.qubit]]
                st, outcome = p.measure(st, block, anc1, anc2, ec_between=ec_all)
                reg = mem[inst.target.name]
                mem[inst.target.name] = reg.at[:, inst.target.index].set(outcome)
            elif isinstance(inst, ClassicalInst):
                # Pass-through of user classical instructions
                # (reference: ftqc.py:111-116); op is static here, so this
                # is plain traced memory arithmetic.
                reg = mem[inst.dst.name]
                cur = reg[:, inst.dst.index]
                if isinstance(inst.src, BitRef):
                    src = mem[inst.src.name][:, inst.src.index]
                elif inst.src is None:
                    src = None
                else:
                    src = jnp.full_like(cur, int(inst.src))
                new = {
                    "MOVE": lambda: src,
                    "NOT": lambda: jnp.uint8(1) ^ cur,
                    "AND": lambda: cur & src,
                    "IOR": lambda: cur | src,
                    "XOR": lambda: cur ^ src,
                }[inst.op]()
                mem[inst.dst.name] = reg.at[:, inst.dst.index].set(new)
            elif isinstance(inst, ResetInst):
                block = data[self.qubit_map[inst.qubit]]
                st = p.encode_zero(st, block, anc1)
            else:  # pragma: no cover - validated away
                raise UnsupportedProgramError(str(inst))
        mem["__prep_fail__"] = st.prep_fail[:, None]
        return mem

    def _execute_scheduled(self, key: jax.Array, batch: int) -> dict[str, jax.Array]:
        """Macro-op engine: O(1) compile cost in program length — see
        `qcss_tpu.ftqc.schedule`."""
        macro, executor, ref_outs = self._prepare_scheduled()
        st = executor.execute(macro, key, batch, ref_outs=ref_outs)
        out = {
            name: st.memory[:, off : off + size]
            for name, (off, size) in macro.memory_layout.items()
        }
        out["__prep_fail__"] = st.prep_fail[:, None]
        return out

    def _exec_config_key(self) -> tuple:
        # Noise enters by STRUCTURE only (static_key); the actual rates
        # travel as a traced argument of the shared runner, so sweeps and
        # test matrices over noise values share one compiled executor.
        return (self.tableau, self.ancillas, self.ec_extractions,
                self.ec_schedule, self.ec_mode, self.max_prep_attempts,
                self.noise.static_key(), self.n_logical)

    def _shared_scheduled_runner(self, executor):
        """One compiled executor per (code, config, rows-bucket,
        memory_size, batch) serves EVERY program with that shape: the
        macro rows travel as a traced argument (`MacroExecutor.run_rows`),
        so re-encoding a new program costs a lowering pass, not an XLA
        compile — compile-once/run-many, the serving-path property the
        per-program jit lacked (and the fix for the round-2 test-suite
        compile-cost creep)."""
        per_code = _SCHEDULED_RUNNERS.setdefault(self.code, {})
        cfg = self._exec_config_key()
        fn = per_code.get(cfg)
        if fn is None:
            def run(rows, rates, key, batch, memory_size):
                executor.set_rates(rates)
                try:
                    st = executor.run_rows(rows, key, batch, memory_size)
                finally:
                    executor.reset_rates()
                return st.memory, st.prep_fail
            fn = jax.jit(run, static_argnames=("batch", "memory_size"))
            per_code[cfg] = fn
        return fn

    def _prepare_scheduled(self):
        """Lower once and (for the 'frames' engine) record the reference
        measurement outcomes — host-side work that must happen OUTSIDE the
        jitted execution body."""
        if self._scheduled is None:
            from qcss_tpu.ftqc import schedule

            macro = schedule.lower(self.raw, self.code)
            executor = schedule.MacroExecutor(
                self.code, self.n_logical, self.noise, self.max_prep_attempts,
                tableau_engine=self.tableau, ancillas=self.ancillas,
                ec_extractions=self.ec_extractions,
                ec_schedule=self.ec_schedule,
                ec_mode=self.ec_mode,
            )
            ref_outs = (
                schedule.reference_outcomes(macro, self.code)
                if self.tableau == "frames" else None
            )
            self._scheduled = (macro, executor, ref_outs)
        return self._scheduled

    def run(self, batch: int, key: jax.Array | None = None) -> dict[str, np.ndarray]:
        """Execute `batch` shots; returns classical registers as numpy
        arrays [batch, size] — the analogue of the reference's
        ``qvm.run(prog)`` result matrix (reference: test/test_ftqc.py:153-156),
        but produced by one jitted device program instead of an external
        simulator process.

        The reserved register ``"__prep_fail__"`` ([batch, 1] uint8) flags
        samples where some FT preparation exhausted ``max_prep_attempts``
        without passing verification; callers can discard those shots or
        bound the unverified fraction."""
        key = jax.random.key(0) if key is None else key
        if self.engine == "scheduled":
            from qcss_tpu.ftqc import schedule

            macro, executor, ref_outs = self._prepare_scheduled()
            # bucket the row count so programs share compiled executors
            t = macro.ops.shape[0]
            pad_to = 8
            while pad_to < t:
                pad_to *= 2
            rows = jnp.asarray(
                schedule.macro_rows(macro, ref_outs, pad_to=pad_to))
            fn = self._shared_scheduled_runner(executor)
            memory, prep_fail = fn(rows, self.noise.flat_rates(), key,
                                   batch, macro.memory_size)
            memory = np.asarray(memory)
            out = {
                name: memory[:, off:off + size]
                for name, (off, size) in macro.memory_layout.items()
            }
            out["__prep_fail__"] = np.asarray(prep_fail)[:, None]
            return out
        if self._compiled is None:
            self._compiled = jax.jit(self._execute, static_argnames=("batch",))
        out = self._compiled(key, batch)
        return {name: np.asarray(v) for name, v in out.items()}


def rewrite_program(raw: Program, code, *,
                    noise: noise_mod.NoiseModel | None = None,
                    max_prep_attempts: int = 8,
                    engine: str = "scheduled",
                    tableau: str = "unpacked",
                    ancillas: str = "shared",
                    ec_extractions: int = 1,
                    ec_schedule: str = "serial",
                    ec_mode: str = "steane") -> EncodedProgram:
    """Validate and FT-encode a raw Clifford program — the framework's
    flagship entry point (reference analogue: ftqc.py:42).

    engine: 'scheduled' (macro-op scan, O(1) compile in program length) or
    'unrolled' (trace every protocol occurrence; simpler graph, useful for
    debugging).
    tableau: 'unpacked' (byte-per-bit, best for small codes) or 'packed'
    (uint32 words, word-aligned blocks; best for surface-code-scale blocks).
    ancillas: 'shared' (one EC/measure ancilla pair for all blocks — the
    reference's QVM-ceiling compromise, reference: ftqc.py:153-160) or
    'dedicated' (an ancilla pair per logical block; statistically identical
    under this noise model, structurally ceiling-free).
    ec_extractions: 1 (single noisy extraction per EC sector, the
    reference's scheme) or 2 (Shor-style repeated extraction: a correction
    commits only when both syndromes agree — wins the readout-dominated
    regime, see BASELINE.md).
    ec_schedule: 'serial' (one block's Steane round at a time, the
    reference's shared-scratch structure — ftqc.py:153-171) or 'parallel'
    (every block's round simultaneously; requires ancillas='dedicated' and
    tableau='frames'; under idle noise this removes the n_logical-fold
    idle exposure the serial schedule charges to waiting blocks).
    ec_mode: 'steane' (encoded-ancilla transversal extraction, the
    reference's protocol — css_code.py:436-470) or 'flag' (bare
    ancilla+flag qubit per stabilizer, sequential CNOTs, adaptive
    re-extraction with flag-conditioned hook decoding — Chao-Reichardt/
    Chamberland-Beverland; t=1 codes, frames engine; 2 bare ancillas
    replace the 2n-qubit verified ancilla blocks per EC extraction).
    """
    return EncodedProgram(raw, code, noise, max_prep_attempts, engine,
                          tableau, ancillas, ec_extractions, ec_schedule,
                          ec_mode)


def run_program(raw: Program, code, batch: int = 1, *,
                key: jax.Array | None = None,
                noise: noise_mod.NoiseModel | None = None) -> dict[str, np.ndarray]:
    """Convenience: rewrite then run."""
    return rewrite_program(raw, code, noise=noise).run(batch, key)
