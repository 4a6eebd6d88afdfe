"""Batched fault-tolerant protocol primitives on the tableau simulator.

Implements the reference's FT machinery (reference: css_code.py:314-646,
qecc.py:14-42) as batched array programs:

* `CodeBlock` — a logical qubit: n physical qubit indices plus a row in the
  batched known-error frames. Corrections are never applied to qubits, only
  tracked classically and folded into measurement post-processing — the
  reference's load-bearing Pauli-frame design (reference: qecc.py:14-31),
  kept here as per-sample frame bit arrays.
* Repeat-until-success FT preparation (|0̄⟩ / |+̄⟩): the reference's
  ``while_do`` on a classical flag (reference: css_code.py:314-366) becomes
  a `lax.while_loop` whose body executes batch-wide but only commits
  (state, frames, flag) for still-flagged samples.
* Steane error correction (reference: css_code.py:436-470) and FT logical
  measurement by 2t+1-fold repetition + majority vote (reference:
  css_code.py:542-589), with the caller-interleaved-EC contract of the
  reference's generator preserved via a callback.

The reference's scratch-buffer discipline (MemoryChunk slicing, minimum
scratch sizes — reference: css_code.py:535-540) has no analogue here:
classical temporaries are SSA values inside the traced program, so the
whole scratch-management layer dissolves by construction.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from qcss_tpu.circuits.ir import Circuit
from qcss_tpu.decode import lut as decode_lut
from qcss_tpu.sim import noise as noise_mod
from qcss_tpu.sim import tableau as tb


@dataclass(frozen=True)
class CodeBlock:
    """A logical qubit: physical qubit indices + frame row index."""

    index: int  # frame row
    qubits: tuple[int, ...]

    @property
    def n(self) -> int:
        return len(self.qubits)


class ExecState(NamedTuple):
    """The complete per-batch execution state threaded through protocols."""

    tab: tb.Tableau
    x_frames: jax.Array  # [B, n_blocks, n] known X errors per block
    z_frames: jax.Array  # [B, n_blocks, n] known Z errors per block
    key: jax.Array


def _split(st: ExecState) -> tuple[ExecState, jax.Array]:
    key, sub = jax.random.split(st.key)
    return st._replace(key=key), sub


def _select_state(mask: jax.Array, new: ExecState, old: ExecState) -> ExecState:
    """Commit `new` only for samples where mask[b] (keys always advance)."""
    m3 = mask[:, None, None].astype(bool)
    return ExecState(
        tb.select(mask, new.tab, old.tab),
        jnp.where(m3, new.x_frames, old.x_frames),
        jnp.where(m3, new.z_frames, old.z_frames),
        new.key,
    )


class FTProtocols:
    """FT protocol implementations for one CSS code over a fixed block
    layout. All methods are pure (state in, state out) and traceable."""

    def __init__(self, code, n_blocks: int, noise: noise_mod.NoiseModel | None = None,
                 max_prep_attempts: int = 8):
        if code.k != 1:
            raise ValueError("FT protocols require k = 1 codes")
        self.code = code
        self.n = code.n
        self.n_blocks = n_blocks
        self.noise = noise or noise_mod.NoiseModel()
        self.max_prep_attempts = max_prep_attempts
        dev = code.device
        self.h1, self.h2 = dev.h1, dev.h2
        self.lut1, self.lut2 = dev.lut_c1, dev.lut_c2
        self.logical_x, self.logical_z = dev.logical_x, dev.logical_z
        # Detection check matrices, with and without logical operator rows
        # (reference: css_code.py:498-501, 530-533).
        self.detect_x_plain = dev.h2
        self.detect_x_with_ops = jnp.concatenate([dev.h2, dev.logical_z], axis=0)
        self.detect_z_plain = dev.h1
        self.detect_z_with_ops = jnp.concatenate([dev.h1, dev.logical_x], axis=0)
        self._circ_cache: dict[int, tuple] = {}
        # Prep networks per block, built once (offset copies of the code's
        # encoding circuits).
        self._prep_zero = [
            code.noisy_encode_zero(self.block(i).qubits) for i in range(n_blocks)
        ]
        self._prep_plus = [
            code.noisy_encode_plus(self.block(i).qubits) for i in range(n_blocks)
        ]

    def block(self, index: int) -> CodeBlock:
        n = self.n
        return CodeBlock(index, tuple(range(index * n, (index + 1) * n)))

    def init_state(self, batch: int, key: jax.Array) -> ExecState:
        n_qubits = self.n_blocks * self.n
        zeros = jnp.zeros((batch, self.n_blocks, self.n), dtype=jnp.uint8)
        return ExecState(tb.zero_state(batch, n_qubits), zeros, zeros, key)

    # -- low-level helpers -----------------------------------------------------
    #
    # Circuits are lowered to opcode arrays once and executed by lax.scan;
    # block-wide measurement/reset use scanned kernels; transversal layers
    # use the vectorized disjoint-pair forms. This keeps the traced graph of
    # a full FT protocol O(#protocol-steps), not O(#physical gates).

    def _lowered(self, circ: Circuit):
        # Keyed by id() with the circuit kept alive in the value — a freed
        # circuit's id may be reused, so the cache must pin its keys.
        cached = self._circ_cache.get(id(circ))
        if cached is None or cached[0] is not circ:
            cached = (circ, circ.to_arrays())
            self._circ_cache[id(circ)] = cached
        return cached[1]

    def _run_circuit(self, st: ExecState, circ: Circuit) -> ExecState:
        ops, q0, q1 = self._lowered(circ)
        st, sub = _split(st)
        tab = noise_mod.run_arrays_noisy(st.tab, ops, q0, q1, self.noise, sub)
        return st._replace(tab=tab)

    def _measure_block(self, st: ExecState, block: CodeBlock) -> tuple[ExecState, jax.Array]:
        """Measure all block qubits in Z; returns [B, n] bits."""
        st, sub = _split(st)
        tab, outs = tb.measure_many(st.tab, block.qubits, sub)
        st = st._replace(tab=tab)
        if self.noise.p_meas:
            st, sub = _split(st)
            outs = noise_mod.flip_bits(outs, self.noise.p_meas, sub)
        return st, outs

    def _reset_block(self, st: ExecState, block: CodeBlock) -> ExecState:
        """Physical reset of every block qubit + zeroed frames
        (reference: qecc.py:33-42)."""
        st, sub = _split(st)
        tab = tb.reset_many(st.tab, block.qubits, sub)
        if self.noise.p_reset:
            st, sub = _split(st)
            flips = jax.random.bernoulli(
                sub, self.noise.p_reset, (tab.batch, self.n)
            ).astype(jnp.uint8)
            qcols = jnp.asarray(block.qubits, jnp.int32)
            zeros = jnp.zeros((tab.batch, tab.n), dtype=jnp.uint8)
            tab = tb.apply_pauli_frame(
                tab, zeros.at[:, qcols].set(flips), zeros
            )
        zeros_frame = jnp.zeros((st.tab.batch, self.n), dtype=jnp.uint8)
        return ExecState(
            tab,
            st.x_frames.at[:, block.index, :].set(zeros_frame),
            st.z_frames.at[:, block.index, :].set(zeros_frame),
            st.key,
        )

    def _transversal_cnot(self, st: ExecState, ctrl: CodeBlock, tgt: CodeBlock) -> ExecState:
        tab = tb.apply_cnot_many(st.tab, ctrl.qubits, tgt.qubits)
        st = st._replace(tab=tab)
        if self.noise.p_gate2:
            st, sub = _split(st)
            tab = noise_mod.depolarize2_many(
                st.tab, ctrl.qubits, tgt.qubits, self.noise.p_gate2, sub
            )
            st = st._replace(tab=tab)
        return st

    def _transversal_1q(self, st: ExecState, gate: str, block: CodeBlock) -> ExecState:
        fn = {"H": tb.apply_h_many, "X": tb.apply_x_many,
              "Z": tb.apply_z_many, "S": tb.apply_s_many}[gate]
        st = st._replace(tab=fn(st.tab, block.qubits))
        if self.noise.p_gate1:
            st, sub = _split(st)
            tab = noise_mod.depolarize1_many(
                st.tab, block.qubits, self.noise.p_gate1, sub
            )
            st = st._replace(tab=tab)
        return st

    def _frame(self, st: ExecState, block: CodeBlock, sector: str) -> jax.Array:
        frames = st.x_frames if sector == "x" else st.z_frames
        return frames[:, block.index, :]

    def _set_frame(self, st: ExecState, block: CodeBlock, sector: str,
                   value: jax.Array) -> ExecState:
        if sector == "x":
            return st._replace(x_frames=st.x_frames.at[:, block.index, :].set(value))
        return st._replace(z_frames=st.z_frames.at[:, block.index, :].set(value))

    # -- error detection (reference: css_code.py:472-533) -----------------------

    def _error_detect_x(self, st: ExecState, data: CodeBlock, anc: CodeBlock,
                        include_operators: bool) -> tuple[ExecState, jax.Array]:
        """Detect X errors on `data` against a noisily prepared ancilla.
        Returns outcome[B]: 1 where any error detected."""
        st = self._reset_block(st, anc)
        prep = (self._prep_zero[anc.index] if include_operators
                else self._prep_plus[anc.index])
        st = self._run_circuit(st, prep)
        st = self._transversal_cnot(st, data, anc)
        st, mem = self._measure_block(st, anc)
        check = self.detect_x_with_ops if include_operators else self.detect_x_plain
        outcome = decode_lut.detect_errors(mem, self._frame(st, data, "x"), check)
        return st, outcome

    def _error_detect_z(self, st: ExecState, data: CodeBlock, anc: CodeBlock,
                        include_operators: bool) -> tuple[ExecState, jax.Array]:
        st = self._reset_block(st, anc)
        prep = (self._prep_plus[anc.index] if include_operators
                else self._prep_zero[anc.index])
        st = self._run_circuit(st, prep)
        st = self._transversal_cnot(st, anc, data)
        st = self._transversal_1q(st, "H", anc)
        st, mem = self._measure_block(st, anc)
        check = self.detect_z_with_ops if include_operators else self.detect_z_plain
        outcome = decode_lut.detect_errors(mem, self._frame(st, data, "z"), check)
        return st, outcome

    # -- fault-tolerant preparation (reference: css_code.py:314-366) -------------

    def _encode_ft(self, st: ExecState, block: CodeBlock, ancilla: CodeBlock,
                   plus: bool) -> ExecState:
        """Repeat-until-success |0̄⟩ (or |+̄⟩) preparation: noisy-prepare,
        error-detect against a second noisy block, retry flagged samples.

        The loop is a `lax.while_loop` gated on ``any(flag)`` with a bounded
        attempt count; the body runs batch-wide and commits only flagged
        samples' state (the batched form of the reference's per-shot
        ``while_do`` — reference: css_code.py:329-342)."""
        batch = st.tab.batch
        prep = (self._prep_plus[block.index] if plus
                else self._prep_zero[block.index])

        def body(carry):
            st_in, flag, attempts = carry
            s = self._reset_block(st_in, block)
            s = self._run_circuit(s, prep)
            s, out_x = self._error_detect_x(s, block, ancilla,
                                            include_operators=not plus)
            s, out_z = self._error_detect_z(s, block, ancilla,
                                            include_operators=plus)
            new_flag = out_x | out_z
            committed = _select_state(flag, s, st_in)
            flag = jnp.where(flag.astype(bool), new_flag, flag)
            return committed, flag, attempts + 1

        def cond(carry):
            _, flag, attempts = carry
            return jnp.any(flag.astype(bool)) & (attempts < self.max_prep_attempts)

        flag0 = jnp.ones((batch,), dtype=jnp.uint8)
        st, _, _ = jax.lax.while_loop(cond, body, (st, flag0, jnp.int32(0)))
        return st

    def encode_zero(self, st: ExecState, block: CodeBlock, ancilla: CodeBlock) -> ExecState:
        return self._encode_ft(st, block, ancilla, plus=False)

    def encode_plus(self, st: ExecState, block: CodeBlock, ancilla: CodeBlock) -> ExecState:
        return self._encode_ft(st, block, ancilla, plus=True)

    # -- Steane error correction (reference: css_code.py:436-470) ----------------

    def error_correct(self, st: ExecState, data: CodeBlock,
                      anc1: CodeBlock, anc2: CodeBlock) -> ExecState:
        # X sector: propagate data X errors onto a |+̄⟩ ancilla, measure Z.
        st = self.encode_plus(st, anc1, anc2)
        st = self._transversal_cnot(st, data, anc1)
        st, mem = self._measure_block(st, anc1)
        _, new_x = decode_lut.correct_errors(
            mem, self._frame(st, data, "x"), self.h2, self.lut2
        )
        st = self._set_frame(st, data, "x", new_x)

        # Z sector: propagate data Z errors onto a |0̄⟩ ancilla, measure X.
        st = self.encode_zero(st, anc1, anc2)
        st = self._transversal_cnot(st, anc1, data)
        st = self._transversal_1q(st, "H", anc1)
        st, mem = self._measure_block(st, anc1)
        _, new_z = decode_lut.correct_errors(
            mem, self._frame(st, data, "z"), self.h1, self.lut1
        )
        return self._set_frame(st, data, "z", new_z)

    # -- logical measurement (reference: css_code.py:542-646) --------------------

    def noisy_measure(self, st: ExecState, data: CodeBlock,
                      anc1: CodeBlock, anc2: CodeBlock) -> tuple[ExecState, jax.Array]:
        """Single (non-FT) logical Z measurement via a fresh |0̄⟩ ancilla:
        transversal CNOT data→anc, measure anc, opportunistically correct
        X errors, outcome = Z̄ · corrected bits (Steane §3 technique)."""
        st = self.encode_zero(st, anc1, anc2)
        st = self._transversal_cnot(st, data, anc1)
        st, mem = self._measure_block(st, anc1)
        corrected, new_x = decode_lut.correct_errors(
            mem, self._frame(st, data, "x"), self.h2, self.lut2
        )
        st = self._set_frame(st, data, "x", new_x)
        zbar = self.logical_z[0]
        outcome = (
            jnp.sum(corrected.astype(jnp.int32) * zbar.astype(jnp.int32), axis=-1) & 1
        ).astype(jnp.uint8)
        return st, outcome

    def measure(self, st: ExecState, data: CodeBlock,
                anc1: CodeBlock, anc2: CodeBlock,
                ec_between: Callable[[ExecState], ExecState] | None = None,
                ) -> tuple[ExecState, jax.Array]:
        """FT logical Z measurement: 2t+1 noisy measurements with a round of
        (caller-supplied) global error correction after each — the batched
        form of the reference's generator-yield contract (reference:
        css_code.py:576-579, ftqc.py:91-95) — then a majority vote."""
        trials = 2 * self.code.t + 1
        outcomes = []
        for _ in range(trials):
            st, o = self.noisy_measure(st, data, anc1, anc2)
            outcomes.append(o)
            if ec_between is not None:
                st = ec_between(st)
        votes = jnp.sum(jnp.stack(outcomes, axis=0).astype(jnp.int32), axis=0)
        majority = (votes >= (trials + 1) // 2).astype(jnp.uint8)
        return st, majority

    # -- logical gates (reference: css_code.py:368-434) ---------------------------

    def apply_logical_gate(self, st: ExecState, name: str,
                           blocks: Sequence[CodeBlock],
                           mask: jax.Array | None = None) -> ExecState:
        """Dispatch: Pauli-frame ops → transversal → unsupported
        (no non-Clifford support, matching reference: css_code.py:433-434).
        With `mask`, the gate applies only to flagged samples (classical
        feedback)."""
        from qcss_tpu.errors import UnsupportedGateError

        code = self.code
        old_tab = st.tab
        if name in ("X", "Y", "Z"):
            # Physical gates along the logical operator's support
            # (reference: css_code.py:386-407).
            assert len(blocks) == 1
            op = {"X": code.x_operators, "Y": code.y_operators,
                  "Z": code.z_operators}[name]()[0]
            assert op.coefficient == 1
            circ = Circuit()
            for q, letter in op.letters():
                circ.gate(letter, blocks[0].qubits[q])
            st = self._run_circuit(st, circ)
        elif not code.is_transversal(name):
            raise UnsupportedGateError(f"logical gate {name} not implemented")
        elif name == "I":
            pass
        elif name == "CNOT":
            st = self._transversal_cnot(st, blocks[0], blocks[1])
        elif name == "H":
            st = self._transversal_1q(st, "H", blocks[0])
        elif name == "CZ":
            tab = tb.apply_cz_many(st.tab, blocks[0].qubits, blocks[1].qubits)
            st = st._replace(tab=tab)
            if self.noise.p_gate2:
                st, sub = _split(st)
                tab = noise_mod.depolarize2_many(
                    st.tab, blocks[0].qubits, blocks[1].qubits,
                    self.noise.p_gate2, sub,
                )
                st = st._replace(tab=tab)
        elif name in ("S", "PHASE"):
            # S̄ = qubit-wise (Z then S) (reference: css_code.py:428-430).
            st = self._transversal_1q(st, "Z", blocks[0])
            st = self._transversal_1q(st, "S", blocks[0])
        else:  # pragma: no cover
            raise UnsupportedGateError(f"logical gate {name} not implemented")
        if mask is not None:
            st = st._replace(tab=tb.select(mask, st.tab, old_tab))
        return st
