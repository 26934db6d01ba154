"""Native runtime components (C, built on demand with the system cc).

`cabac_finalize(ops, ctx_store)` drives the C arithmetic-coder finalizer
(native/cabac.c) over a recorded bin-op stream and returns the terminated
slice payload (end_of_slice bit + finish + rbsp stop bit + alignment),
byte-exact vs the Python BinEncoder. Falls back to None when no compiler
is available; callers keep the Python path as reference/fallback.
"""
from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import tempfile

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_LIB = None
_TRIED = False


def _build() -> pathlib.Path | None:
    """Build keyed on a content hash of cabac.c: git does not preserve
    mtimes, so an mtime check could trust a stale binary after checkout."""
    import hashlib
    src = _DIR / "cabac.c"
    tag = hashlib.sha256(src.read_bytes()).hexdigest()[:16]
    out = _DIR / f"libcabac-{tag}.so"
    if out.exists():
        return out
    for stale in _DIR.glob("libcabac*.so"):
        stale.unlink(missing_ok=True)
    for cc in ("cc", "gcc", "clang"):
        try:
            r = subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", str(src), "-o", str(out)],
                capture_output=True, timeout=120)
            if r.returncode == 0:
                return out
        except (OSError, subprocess.TimeoutExpired):
            continue
    return None


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("PMP_NO_NATIVE"):
        return None
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        return None
    lib.cabac_run.restype = ctypes.c_long
    lib.cabac_run.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_long]
    _LIB = lib
    if not _self_test():
        _LIB = None
    return _LIB


def _self_test() -> bool:
    """Known-answer check: a small randomized op stream must match the
    Python BinEncoder byte-for-byte, else the library is rejected."""
    import random

    from ..codec.cabac import BinEncoder, ContextStore

    rng = random.Random(20260818)
    ops = []
    for _ in range(256):
        k = rng.randrange(4)
        if k == 0:
            ops.append(("b", rng.randrange(2), rng.randrange(300)))
        elif k == 1:
            ops.append(("ep", rng.randrange(2)))
        elif k == 2:
            n = rng.randrange(1, 12)
            ops.append(("eps", rng.randrange(1 << n), n))
        else:
            ops.append(("rem", rng.randrange(4000), rng.randrange(4), 5, 15))
    got = cabac_finalize(ops, ContextStore.standard_init(32, 2))
    enc = BinEncoder(ContextStore.standard_init(32, 2))
    for op in ops:
        k = op[0]
        if k == "b":
            enc.encode_bin(op[1], op[2])
        elif k == "ep":
            enc.encode_bin_ep(op[1])
        elif k == "eps":
            enc.encode_bins_ep(op[1], op[2])
        else:
            enc.encode_rem_abs_ep(op[1], op[2], op[3], op[4])
    enc.encode_bin_trm(1)
    enc.finish()
    return got == enc.write_stop_bit_and_align()


def cabac_finalize(ops, ctx_store) -> bytes | None:
    """Run the native finalizer over RecordingEncoder ops.

    ``ctx_store``: a fresh codec.cabac.ContextStore (state lists are
    consumed). Returns the slice payload or None if unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    n = len(ops)
    kind = np.empty(n, np.int8)
    a = np.empty(n, np.int64)
    b = np.zeros(n, np.int32)
    c = np.zeros(n, np.int32)
    d = np.zeros(n, np.int32)
    for i, op in enumerate(ops):
        t = op[0]
        if t == "b":
            kind[i] = 0
            a[i] = op[1]
            b[i] = op[2]
        elif t == "ep":
            kind[i] = 1
            a[i] = op[1]
        elif t == "eps":
            kind[i] = 2
            a[i] = op[1]
            b[i] = op[2]
        else:                       # "rem"
            kind[i] = 3
            a[i] = op[1]
            b[i] = op[2]
            c[i] = op[3]
            d[i] = op[4]
    s0 = np.asarray(ctx_store.state0, np.int32)
    s1 = np.asarray(ctx_store.state1, np.int32)
    rate = np.asarray(ctx_store.rate, np.int32)
    cap = 4 * n + 4096
    out = np.empty(cap, np.uint8)
    r = lib.cabac_run(
        kind.ctypes.data, a.ctypes.data, b.ctypes.data, c.ctypes.data,
        d.ctypes.data, n, s0.ctypes.data, s1.ctypes.data,
        rate.ctypes.data, out.ctypes.data, cap)
    if r < 0:
        return None
    return out[:r].tobytes()
