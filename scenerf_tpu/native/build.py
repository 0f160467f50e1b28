"""Build + load the native C++ library (meshing, ICP) via g++ and ctypes.

The shared object is compiled on first use and cached next to the sources.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SOURCES = ["meshing.cpp", "icp.cpp"]
_LIB = os.path.join(_HERE, "libscenerf_native.so")
_lock = threading.Lock()
_lib = None


def _needs_build() -> bool:
    if not os.path.exists(_LIB):
        return True
    lib_mtime = os.path.getmtime(_LIB)
    return any(
        os.path.getmtime(os.path.join(_HERE, s)) > lib_mtime
        for s in _SOURCES
        if os.path.exists(os.path.join(_HERE, s))
    )


def build() -> str:
    srcs = [os.path.join(_HERE, s) for s in _SOURCES
            if os.path.exists(os.path.join(_HERE, s))]
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", *srcs, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _LIB


def load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            if _needs_build():
                build()
            _lib = ctypes.CDLL(_LIB)
    return _lib
