"""Native (C++) host kernels, loaded via ctypes with lazy compilation.

The shared library is built on first use with g++ -O3 into
``native/_build/`` and cached; all callers degrade gracefully to the
pure-python implementations when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "tracks.cpp"
_BUILD_DIR = _REPO_ROOT / "native" / "_build"
_LIB_PATH = _BUILD_DIR / "libsfd2_native.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _compile() -> bool:
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        str(_SRC), "-o", str(_LIB_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not _LIB_PATH.exists() or (
            _SRC.exists() and _SRC.stat().st_mtime > _LIB_PATH.stat().st_mtime
        ):
            if not _compile():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.uf_build.restype = ctypes.c_int64
            lib.uf_build.argtypes = [
                ctypes.c_int64,
                ctypes.c_int64,
                np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ]
            _lib = lib
        except OSError:
            _load_failed = True
    return _lib


def union_find_roots(n_nodes: int, edges: np.ndarray) -> Optional[np.ndarray]:
    """Root id per node for the given [E, 2] int64 edge list, or None if
    the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    edges = np.ascontiguousarray(edges, np.int64)
    a = np.ascontiguousarray(edges[:, 0])
    b = np.ascontiguousarray(edges[:, 1])
    out = np.empty(n_nodes, np.int64)
    lib.uf_build(n_nodes, len(edges), a, b, out)
    return out
