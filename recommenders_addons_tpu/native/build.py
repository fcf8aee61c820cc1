"""Compile-and-cache loader for the native library (ctypes, no pybind11)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "host_kv.cc")


def _so_path() -> str:
    tag = f"cpy{sys.version_info.major}{sys.version_info.minor}"
    return os.path.join(os.path.dirname(__file__), f"_host_kv_{tag}.so")


def _compile(so: str) -> bool:
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", _SRC, "-o", so + ".tmp",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(so + ".tmp", so)
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    c = ctypes
    i64, p = c.c_int64, c.c_void_p
    lib.hkv_create.restype = p
    lib.hkv_create.argtypes = [i64, i64]
    lib.hkv_destroy.argtypes = [p]
    lib.hkv_size.restype = i64
    lib.hkv_size.argtypes = [p]
    lib.hkv_capacity.restype = i64
    lib.hkv_capacity.argtypes = [p]
    lib.hkv_put.argtypes = [p, i64, p, p, p]
    lib.hkv_get.argtypes = [p, i64, p, p, p, p, c.c_int]
    lib.hkv_erase.argtypes = [p, i64, p]
    lib.hkv_export.restype = i64
    lib.hkv_export.argtypes = [p, p, p, p]
    lib.hkv_write_gathered.restype = i64
    lib.hkv_write_gathered.argtypes = [c.c_char_p, p, i64, p, i64, i64]
    lib.hkv_fnv1a64_batch.restype = i64
    lib.hkv_fnv1a64_batch.argtypes = [p, p, i64, p, c.c_int]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """The compiled library, building it on first call; None if no
    toolchain (callers fall back to numpy)."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("TFRA_TPU_DISABLE_NATIVE", "0") == "1":
            return None
        so = _so_path()
        stale = (not os.path.exists(so)
                 or os.path.getmtime(so) < os.path.getmtime(_SRC))
        if stale and not _compile(so) and not os.path.exists(so):
            return None
        try:
            _LIB = _bind(ctypes.CDLL(so))
        except OSError:
            _LIB = None
        return _LIB


def native_available() -> bool:
    return get_lib() is not None
