"""Quil text front-end: run reference-ecosystem programs unmodified.

The reference's input language is a pyQuil ``Program`` fed to its
transpiler (reference: ftqc.py:42-120); this framework's native input is
`circuits.ir.Program`. This module parses the Quil subset those programs
actually use — Clifford gates, DECLARE/MEASURE/RESET, classical bit ops,
and the structured jump idioms pyQuil's ``if_then`` / ``while_do``
emit — into the IR, so a reference user can paste their Quil source and
run it FT-encoded on the device.

Control flow is STRUCTURED by pattern-matching the jump graph rather than
translated jump-for-jump (the reference mangles labels and keeps the
gotos — ftqc.py:98-107,147-151; a traced batched executor needs reducible
control flow):

* ``JUMP-WHEN @THEN c`` / ``JUMP @END`` / ``LABEL @THEN`` / body /
  ``LABEL @END``  →  ``if_then(c, body)``   (pyQuil's if_then shape)
* ``JUMP-UNLESS @SKIP c`` / body / ``LABEL @SKIP``  →  ``if_then(c, body)``
* ``LABEL @S`` / ``JUMP-WHEN @E c`` / body / ``JUMP @S`` / ``LABEL @E``
  →  ``repeat_until(c, body)``              (loop while c == 0)
* the ``JUMP-UNLESS`` loop head (loop while c == 1) lowers via a
  synthesized negation register kept in sync at the end of each
  iteration.

Semantic deltas vs a real Quil machine, both documented limits of the
traced substrate: loops are bounded by ``max_loop_iters`` (the IR's
`RepeatUntilInst` contract), and the loop condition is re-checked before
every body instruction rather than only at the head (per-sample masking;
indistinguishable for bodies that set their flag last, which is every
repeat-until-success protocol in the reference).

Unsupported constructs (DEFGATE, arbitrary irreducible gotos, non-Clifford
gates, REAL/OCTET memory) raise ``UnsupportedProgramError`` with the
offending line.
"""

from __future__ import annotations

import math
import re

from qcss_tpu.circuits.ir import Block, Circuit, Program
from qcss_tpu.errors import UnsupportedProgramError

_GATES_1Q = {"I", "X", "Y", "Z", "H", "S"}
_GATES_2Q = {"CNOT", "CZ"}

_PHASE_RE = re.compile(r"^PHASE\((?P<arg>[^)]+)\)$")


def _phase_angle(expr: str) -> float:
    """Evaluate the tiny arithmetic grammar pyQuil prints for angles
    (numbers, pi, * / + - and unary minus)."""
    expr = expr.strip().lower().replace("pi", repr(math.pi))
    if not re.fullmatch(r"[0-9eE().+\-*/ ]+", expr):
        raise UnsupportedProgramError(f"unsupported PHASE angle {expr!r}")
    try:
        return float(eval(expr, {"__builtins__": {}}, {}))  # noqa: S307
    except Exception as exc:  # pragma: no cover
        raise UnsupportedProgramError(
            f"cannot evaluate PHASE angle {expr!r}") from exc


class _Atom:
    __slots__ = ("kind", "args", "line")

    def __init__(self, kind, args, line):
        self.kind = kind
        self.args = args
        self.line = line

    def __repr__(self):  # pragma: no cover
        return f"_Atom({self.kind}, {self.args})"


def _tokenize(text: str) -> list[_Atom]:
    atoms: list[_Atom] = []
    for lineno, raw_line in enumerate(text.splitlines(), 1):
        line = raw_line.split("#", 1)[0].strip()
        if not line or line == "NOP":
            continue
        parts = line.split()
        head = parts[0].upper()
        atoms.append(_Atom(head, parts[1:], f"line {lineno}: {raw_line.strip()}"))
    return atoms


def _bit_ref(prog: Program, regs: dict, token: str, line: str):
    m = re.fullmatch(r"(\w+)(?:\[(\d+)\])?", token)
    if not m:
        raise UnsupportedProgramError(f"bad memory reference at {line}")
    name, idx = m.group(1), int(m.group(2) or 0)
    if name not in regs:
        raise UnsupportedProgramError(f"undeclared register {name!r} at {line}")
    return regs[name][idx]


def parse_quil(text: str, *, max_loop_iters: int = 8) -> Program:
    """Parse Quil source into a `circuits.ir.Program` (see module
    docstring for the supported subset and jump-idiom structuring)."""
    atoms = _tokenize(text)
    prog = Program()
    regs: dict[str, list] = {}
    neg_count = [0]

    # DECLAREs may appear anywhere; hoist them (Quil semantics).
    rest: list[_Atom] = []
    for a in atoms:
        if a.kind == "DECLARE":
            if len(a.args) < 2:
                raise UnsupportedProgramError(f"bad DECLARE at {a.line}")
            name = a.args[0]
            m = re.fullmatch(r"(\w+)(?:\[(\d+)\])?", a.args[1])
            if not m or m.group(1) not in ("BIT", "INTEGER"):
                raise UnsupportedProgramError(
                    f"only BIT/INTEGER memory is supported, at {a.line}")
            size = int(m.group(2) or 1)
            regs[name] = prog.declare(name, size)
        elif a.kind == "HALT" or a.kind == "PRAGMA":
            if a.kind == "PRAGMA":
                prog.pragma(*a.args)
        else:
            rest.append(a)

    def emit_gate(sink, a: _Atom):
        head = a.kind
        m = _PHASE_RE.fullmatch(head)
        if m is not None:
            ang = _phase_angle(m.group("arg"))
            if not math.isclose(ang % (2 * math.pi), math.pi / 2,
                                abs_tol=1e-9):
                raise UnsupportedProgramError(
                    f"PHASE supported only at pi/2 (= S), at {a.line}")
            head = "S"
        if head in _GATES_1Q:
            if len(a.args) != 1:
                raise UnsupportedProgramError(f"bad gate arity at {a.line}")
            sink.gate(head, int(a.args[0]))
        elif head in _GATES_2Q:
            if len(a.args) != 2:
                raise UnsupportedProgramError(f"bad gate arity at {a.line}")
            sink.gate(head, int(a.args[0]), int(a.args[1]))
        else:
            raise UnsupportedProgramError(
                f"unsupported instruction at {a.line} (Clifford subset: "
                f"{sorted(_GATES_1Q | _GATES_2Q)}, PHASE(pi/2))")

    def emit_plain(sink, a: _Atom, *, in_loop: bool):
        k = a.kind
        if k == "MEASURE":
            if len(a.args) != 2:
                raise UnsupportedProgramError(
                    f"MEASURE needs a target register, at {a.line}")
            sink.measure(int(a.args[0]), _bit_ref(prog, regs, a.args[1], a.line))
        elif k == "RESET":
            if len(a.args) != 1:
                raise UnsupportedProgramError(
                    f"global RESET is unsupported, at {a.line}")
            sink.reset(int(a.args[0]))
        elif k in ("MOVE", "NOT", "AND", "IOR", "XOR"):
            dst = _bit_ref(prog, regs, a.args[0], a.line)
            if k == "NOT":
                sink.not_(dst)
            else:
                src_tok = a.args[1]
                src = (int(src_tok) if re.fullmatch(r"[01]", src_tok)
                       else _bit_ref(prog, regs, src_tok, a.line))
                getattr(sink, {"MOVE": "move", "AND": "and_", "IOR": "ior",
                               "XOR": "xor"}[k])(dst, src)
        elif k == "DEFGATE":
            raise UnsupportedProgramError(f"DEFGATE is unsupported ({a.line})")
        else:
            emit_gate(sink, a)

    def find_label(seq, name, start):
        name = name.lstrip("@")
        for j in range(start, len(seq)):
            if seq[j].kind == "LABEL" and seq[j].args[0].lstrip("@") == name:
                return j
        return -1

    def build(seq: list[_Atom], sink, depth: int):
        i = 0
        while i < len(seq):
            a = seq[i]
            if a.kind == "LABEL":
                # loop head?  LABEL @S ; JUMP-WHEN/UNLESS @E c ; body ;
                # JUMP @S ; LABEL @E
                s_name = a.args[0].lstrip("@")
                if (i + 1 < len(seq)
                        and seq[i + 1].kind in ("JUMP-WHEN", "JUMP-UNLESS")):
                    e_name = seq[i + 1].args[0].lstrip("@")
                    # find the back jump
                    back = next(
                        (j for j in range(i + 2, len(seq))
                         if seq[j].kind == "JUMP"
                         and seq[j].args[0].lstrip("@") == s_name), -1)
                    end = find_label(seq, e_name, i + 2)
                    if back >= 0 and end == back + 1:
                        if depth > 0:
                            raise UnsupportedProgramError(
                                f"nested loops are unsupported ({a.line})")
                        cond = _bit_ref(prog, regs, seq[i + 1].args[1], a.line)
                        body_atoms = seq[i + 2:back]
                        blk = Block()
                        for b_at in body_atoms:
                            if b_at.kind in ("LABEL", "JUMP", "JUMP-WHEN",
                                             "JUMP-UNLESS"):
                                raise UnsupportedProgramError(
                                    "control flow inside a loop body is "
                                    f"unsupported ({b_at.line})")
                            emit_plain(blk, b_at, in_loop=True)
                        if seq[i + 1].kind == "JUMP-WHEN":
                            # exits when c == 1: the IR's native form
                            prog.repeat_until(cond, blk, max_loop_iters)
                        else:
                            # exits when c == 0 (pyQuil while_do): loop on
                            # a synthesized negation kept fresh per
                            # iteration
                            neg_count[0] += 1
                            aux = prog.declare(
                                f"__quil_neg_{neg_count[0]}", 1)[0]
                            prog.move(aux, cond).not_(aux)
                            blk.move(aux, cond).not_(aux)
                            prog.repeat_until(aux, blk, max_loop_iters)
                        i = end + 1
                        continue
                i += 1  # plain label (jump target of a structured idiom)
                continue
            if a.kind == "JUMP-WHEN":
                tgt = a.args[0].lstrip("@")
                cond = _bit_ref(prog, regs, a.args[1], a.line)
                # pyQuil if_then: JUMP-WHEN @THEN c ; JUMP @END ;
                # LABEL @THEN ; body ; LABEL @END
                if (i + 2 < len(seq) and seq[i + 1].kind == "JUMP"
                        and seq[i + 2].kind == "LABEL"
                        and seq[i + 2].args[0].lstrip("@") == tgt):
                    e_name = seq[i + 1].args[0]
                    end = find_label(seq, e_name, i + 3)
                    if end < 0:
                        raise UnsupportedProgramError(
                            f"unmatched {e_name} ({a.line})")
                    body = Circuit()
                    for b_at in seq[i + 3:end]:
                        emit_gate(body, b_at)
                    prog.if_then(cond, body)
                    i = end + 1
                    continue
                raise UnsupportedProgramError(
                    f"irreducible JUMP-WHEN ({a.line})")
            if a.kind == "JUMP-UNLESS":
                # JUMP-UNLESS @SKIP c ; body ; LABEL @SKIP  =>  if c: body
                tgt = a.args[0].lstrip("@")
                end = find_label(seq, tgt, i + 1)
                if end < 0:
                    raise UnsupportedProgramError(
                        f"unmatched @{tgt} ({a.line})")
                cond = _bit_ref(prog, regs, a.args[1], a.line)
                body = Circuit()
                for b_at in seq[i + 1:end]:
                    emit_gate(body, b_at)
                prog.if_then(cond, body)
                i = end + 1
                continue
            if a.kind == "JUMP":
                raise UnsupportedProgramError(
                    f"irreducible JUMP ({a.line})")
            emit_plain(sink, a, in_loop=False)
            i += 1

    build(rest, prog, 0)
    return prog


def loads(text: str, **kwargs) -> Program:
    """Alias for `parse_quil`."""
    return parse_quil(text, **kwargs)
