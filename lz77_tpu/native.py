"""ctypes bindings for the native host runtime (native/lz77host.cpp).

Builds the shared library on demand with g++ (no pybind11 in this
environment; the C ABI + ctypes keeps the dependency surface at zero).
The native backend emits byte-identical streams to the JAX and numpy
backends (same exact-longest-match, smallest-offset semantics), so it doubles
as a differential-testing anchor and as the fast serial fallback for hosts
without an accelerator.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from . import spec

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_ROOT, "native", "lz77host.cpp")
_LIB = os.path.join(_ROOT, "native", "liblz77host.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-Wall", "-shared", "-fPIC", "-o", _LIB, _SRC],
        check=True,
        capture_output=True,
    )


def load():
    """Load (building if needed) the native library; raises if unavailable."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            _build()
        lib = ctypes.CDLL(_LIB)
        for name, argtypes in {
            "lz77_encode": [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int64,
            ],
            "lz77_decode": [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64,
            ],
            "lz77_decode_bound": [ctypes.c_void_p, ctypes.c_int64],
            "lz77_encode_bound": [ctypes.c_int64, ctypes.c_int, ctypes.c_int],
        }.items():
            fn = getattr(lib, name)
            fn.argtypes = argtypes
            fn.restype = ctypes.c_int64
        _lib = lib
        return lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def encode(data: bytes, params: spec.Params | None = None) -> bytes:
    params = params or spec.Params()
    lib = load()
    n = len(data)
    cap = lib.lz77_encode_bound(n, params.la, params.sb)
    if cap < 0:
        raise ValueError("invalid parameters")
    src = np.frombuffer(data, np.uint8) if n else np.zeros(1, np.uint8)
    out = np.zeros(cap, np.uint8)
    size = lib.lz77_encode(
        src.ctypes.data, n, params.la, params.sb, out.ctypes.data, cap
    )
    if size < 0:
        raise RuntimeError(f"native encode failed: {size}")
    return out[:size].tobytes()


def decode(stream: bytes) -> bytes:
    lib = load()
    n = len(stream)
    src = np.frombuffer(stream, np.uint8) if n else np.zeros(1, np.uint8)
    cap = lib.lz77_decode_bound(src.ctypes.data, n)
    if cap < 0:
        raise ValueError(f"corrupt or truncated stream: {cap}")
    out = np.zeros(max(cap, 1), np.uint8)
    size = lib.lz77_decode(src.ctypes.data, n, out.ctypes.data, cap)
    if size < 0:
        raise RuntimeError(f"native decode failed: {size}")
    return out[:size].tobytes()
