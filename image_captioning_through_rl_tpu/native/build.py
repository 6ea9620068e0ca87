"""Build + load the native fastmetrics library.

Compiles ``fastmetrics.cpp`` with the system ``g++`` into a cached
shared object (keyed by source hash, under the user cache dir) and
binds it with ctypes. Thread-safe enough for test use: compilation goes
to a temp file then an atomic rename.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

_SRC = os.path.join(os.path.dirname(__file__), "fastmetrics.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    d = os.path.join(base, "icrl_tpu_native")
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> Optional[str]:
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        so_path = os.path.join(_cache_dir(), f"fastmetrics-{digest}.so")
        if os.path.exists(so_path):
            return so_path
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_cache_dir())
        os.close(fd)
    except OSError:
        # unwritable/invalid cache dir (read-only $HOME, sandbox): the
        # contract is None -> callers fall back to pure Python, never raise
        return None
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None
    os.replace(tmp, so_path)
    return so_path


def load_fastmetrics() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the library; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so_path = _build()
    if so_path is None:
        return None
    lib = ctypes.CDLL(so_path)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.bleu_stats.argtypes = [
        i32p, i64p, ctypes.c_int64,  # hyps
        i32p, i64p, i64p,            # refs + group offsets
        i64p, i64p, i64p, i64p,      # correct, guess, testlen, reflen
    ]
    lib.bleu_stats.restype = None
    lib.cider_scores.argtypes = [
        i32p, i64p, ctypes.c_int64,
        i32p, i64p, i64p,
        f64p,
    ]
    lib.cider_scores.restype = None
    lib.rouge_scores.argtypes = [
        i32p, i64p, ctypes.c_int64,
        i32p, i64p, i64p,
        f64p,
    ]
    lib.rouge_scores.restype = None
    lib.meteor_scores.argtypes = [
        i32p, i64p, ctypes.c_int64,
        i32p, i64p, i64p,
        i32p, f64p,              # per-word-id stem ids + delta weights
        f64p,
    ]
    lib.meteor_scores.restype = None
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return load_fastmetrics() is not None
