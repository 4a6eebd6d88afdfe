"""Native (C++) host kernels, loaded via ctypes.

The reference is pure Python (SURVEY.md §2: zero native components), so the
only native-code obligation here is self-imposed: syndrome-table
enumeration is exponential in code distance and dominates construction time
for large codes, so it runs as a compiled depth-first XOR enumeration
(`syndrome_table.cc`). The library is built on demand with g++ into a cache
directory; every entry point has a pure-Python fallback
(`qcss_tpu.ops.gf2`), so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "syndrome_table.cc")
_LIB_NAME = "libqcss.so"
_lib = None
_load_attempted = False


def _build_dir() -> str:
    d = os.environ.get("QCSS_NATIVE_CACHE")
    if d:
        return d
    return os.path.join(tempfile.gettempdir(), "qcss_tpu_native")


def _try_load() -> ctypes.CDLL | None:
    """Load the native library, building it with g++ on first use."""
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True

    candidates = [
        os.path.join(os.path.dirname(__file__), _LIB_NAME),
        os.path.join(_build_dir(), _LIB_NAME),
    ]
    for path in candidates:
        if os.path.exists(path) and os.path.getmtime(path) >= os.path.getmtime(_SRC):
            try:
                _lib = _bind(ctypes.CDLL(path))
                return _lib
            except OSError:
                pass

    # Build into the cache dir.
    out_dir = _build_dir()
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, _LIB_NAME)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        _lib = _bind(ctypes.CDLL(out))
    except (OSError, subprocess.SubprocessError):
        _lib = None
    return _lib


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    lib.qcss_syndrome_table.restype = ctypes.c_int32
    lib.qcss_syndrome_table.argtypes = [
        u8p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32,
        u64p, u64p, u8p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.qcss_rref.restype = ctypes.c_int32
    lib.qcss_rref.argtypes = [u8p, ctypes.c_int32, ctypes.c_int32]
    return lib


def available() -> bool:
    return _try_load() is not None


def syndrome_table_native(
    parity_check: np.ndarray,
    max_weight: int,
    stop_on_collision: bool,
    capacity: int | None = None,
):
    """Run the native enumerator. Returns (t, syndromes int array,
    errors [k, n] uint8) or None if the library is unavailable or r > 128.
    Semantics match `ops.gf2.syndrome_table` / `min_weight_table` exactly.
    """
    lib = _try_load()
    if lib is None:
        return None
    h = np.ascontiguousarray(parity_check, dtype=np.uint8) & 1
    r, n = h.shape
    if r > 128:
        return None
    cap = capacity if capacity is not None else min(1 << min(r, 26), 1 << 26)
    syn_lo = np.zeros(cap, dtype=np.uint64)
    syn_hi = np.zeros(cap, dtype=np.uint64)
    errors = np.zeros((cap, n), dtype=np.uint8)
    n_out = ctypes.c_int64(0)
    t_out = ctypes.c_int32(0)
    rc = lib.qcss_syndrome_table(
        h, r, n, max_weight, 1 if stop_on_collision else 0,
        syn_lo, syn_hi, errors.reshape(-1), cap,
        ctypes.byref(n_out), ctypes.byref(t_out),
    )
    if rc != 0:
        return None
    k = n_out.value
    if r <= 64:
        keys = syn_lo[:k].astype(object)
    else:
        keys = (syn_hi[:k].astype(object) << 64) | syn_lo[:k].astype(object)
    return t_out.value, [int(s) for s in keys], errors[:k].copy()


def rref_native(mat: np.ndarray):
    """Native GF(2) RREF; returns (rref matrix, rank) or None."""
    lib = _try_load()
    if lib is None:
        return None
    m = np.ascontiguousarray(mat, dtype=np.uint8) & 1
    m = m.copy()
    rank = lib.qcss_rref(m, m.shape[0], m.shape[1])
    return m, int(rank)
