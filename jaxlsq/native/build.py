"""Compile-and-load for the native reference library.

Builds ``lsq_ref.cpp`` into a shared object under a per-source-hash cache dir
(so edits rebuild and stale caches never load), using plain ``g++`` — the
JAX analogue of the reference's setup.py extension build (setup.py:68-112),
minus the CUDA/torch machinery that XLA makes unnecessary (SURVEY.md §3.5).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

_SRC = os.path.join(os.path.dirname(__file__), "lsq_ref.cpp")
_LIB: Optional[ctypes.CDLL] = None
_BUILD_ERROR: Optional[str] = None


def _cache_dir(tag: str) -> str:
    base = os.environ.get("JAXLSQ_CACHE",
                          os.path.join(tempfile.gettempdir(), "jaxlsq_native"))
    path = os.path.join(base, tag)
    os.makedirs(path, exist_ok=True)
    return path


def build_library(force: bool = False) -> str:
    """Compile lsq_ref.cpp; returns the .so path (cached by source hash)."""
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_cache_dir(tag), "liblsqref.so")
    if os.path.exists(out) and not force:
        return out
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", out]
    # OpenMP if the toolchain has it (compile probe, like setup_utils.py:5-25
    # in the reference — ours just tries and falls back)
    probe = subprocess.run(cmd[:1] + ["-fopenmp", "-E", "-x", "c++",
                                      "/dev/null", "-o", "/dev/null"],
                           capture_output=True)
    if probe.returncode == 0:
        cmd.insert(1, "-fopenmp")
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(f"native build failed:\n{res.stderr}")
    return out


def load_library() -> ctypes.CDLL:
    """Build (if needed) and load the library; caches the handle."""
    global _LIB, _BUILD_ERROR
    if _LIB is not None:
        return _LIB
    if _BUILD_ERROR is not None:
        raise RuntimeError(_BUILD_ERROR)
    try:
        lib = ctypes.CDLL(build_library())
    except Exception as e:  # remember the failure; don't retry per call
        _BUILD_ERROR = f"jaxlsq.native unavailable: {e}"
        raise RuntimeError(_BUILD_ERROR) from e
    assert lib.lsq_native_abi_version() == 1
    _LIB = lib
    return lib


def is_available() -> bool:
    try:
        load_library()
        return True
    except Exception:
        return False
