"""NativeShardLoader: ctypes wrapper over the C++ prefetching shard loader.

The native runtime IO component of the framework (the reference ships no
input pipeline at all — users bring a torch DataLoader).  Worker threads in
``loader.cpp`` gather shuffled rows from memory-mapped ``.npy`` shards into a
ring of prefetched batch buffers; this wrapper drains the ring into numpy
arrays (and optionally onto the device).

Determinism contract: for a given ``seed``, batch ``k`` always contains rows
``perm_epoch[k*B:(k+1)*B]`` of the global (shard, row) index — independent of
``workers``/``prefetch`` (the ring delivers in order).

Usage::

    with NativeShardLoader([("x0.npy", "y0.npy"), ...], batch=128,
                           seed=0, workers=4) as ld:
        for _ in range(steps):
            x, y = ld.next()          # numpy views of fresh buffers
            state, m = step(state, {"input": jnp.asarray(x),
                                    "label": jnp.asarray(y)})
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional, Sequence, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "loader.cpp")
_LIB: Optional[ctypes.CDLL] = None
_BUILD_ERROR: Optional[str] = None


def _build() -> str:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    base = os.environ.get("JAXLSQ_CACHE",
                          os.path.join(tempfile.gettempdir(), "jaxlsq_native"))
    path = os.path.join(base, tag)
    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, "libjlloader.so")
    if os.path.exists(out):
        return out
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", out]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(f"native loader build failed:\n{res.stderr}")
    return out


def _load() -> ctypes.CDLL:
    global _LIB, _BUILD_ERROR
    if _LIB is not None:
        return _LIB
    if _BUILD_ERROR is not None:
        raise RuntimeError(_BUILD_ERROR)
    try:
        lib = ctypes.CDLL(_build())
    except Exception as e:
        _BUILD_ERROR = f"jaxlsq.native loader unavailable: {e}"
        raise RuntimeError(_BUILD_ERROR) from e
    assert lib.jl_loader_abi_version() == 1
    lib.jl_open.restype = ctypes.c_void_p
    lib.jl_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ctypes.c_ulonglong, ctypes.c_char_p, ctypes.c_long]
    for name in ("jl_x_row_bytes", "jl_y_row_bytes", "jl_num_examples",
                 "jl_batches_per_epoch", "jl_delivered"):
        getattr(lib, name).restype = ctypes.c_long
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.jl_next.restype = ctypes.c_int
    lib.jl_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.jl_close.restype = None
    lib.jl_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def is_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _npy_meta(path: str) -> Tuple[np.dtype, Tuple[int, ...]]:
    with open(path, "rb") as f:
        version = np.lib.format.read_magic(f)
        shape, fortran, dtype = np.lib.format._read_array_header(f, version)
    if fortran:
        raise ValueError(f"fortran-order npy unsupported: {path}")
    return dtype, shape


class NativeShardLoader:
    """Prefetching shuffled batch stream over .npy shard pairs."""

    def __init__(self, shards: Sequence, batch: int, *, seed: int = 0,
                 workers: int = 2, prefetch: int = 4):
        lib = _load()
        pairs = [(s, None) if isinstance(s, str) else tuple(s) for s in shards]
        if not pairs:
            raise ValueError("no shards given")
        self._has_y = pairs[0][1] is not None
        if any((p[1] is not None) != self._has_y for p in pairs):
            raise ValueError("either all shards have labels or none do")

        x_dtype, x_shape = _npy_meta(pairs[0][0])
        self.x_shape = (batch,) + tuple(x_shape[1:])
        self.x_dtype = x_dtype
        if self._has_y:
            y_dtype, y_shape = _npy_meta(pairs[0][1])
            self.y_shape = (batch,) + tuple(y_shape[1:])
            self.y_dtype = y_dtype
        # Every shard must match shard 0's dtype AND inner shape — the native
        # layer only checks row BYTE sizes, which would silently reinterpret
        # e.g. int32 rows as float32.
        for xp_path, yp_path in pairs[1:]:
            d, sh = _npy_meta(xp_path)
            if d != x_dtype or tuple(sh[1:]) != tuple(x_shape[1:]):
                raise ValueError(
                    f"shard {xp_path}: dtype/shape {d}{sh[1:]} != shard0 "
                    f"{x_dtype}{tuple(x_shape[1:])}")
            if self._has_y:
                d, sh = _npy_meta(yp_path)
                if d != y_dtype or tuple(sh[1:]) != tuple(y_shape[1:]):
                    raise ValueError(
                        f"shard {yp_path}: dtype/shape {d}{sh[1:]} != shard0 "
                        f"{y_dtype}{tuple(y_shape[1:])}")

        xp = (ctypes.c_char_p * len(pairs))(
            *[p[0].encode() for p in pairs])
        yp = None
        if self._has_y:
            yp = (ctypes.c_char_p * len(pairs))(
                *[p[1].encode() for p in pairs])
        err = ctypes.create_string_buffer(512)
        self._h = lib.jl_open(xp, yp, len(pairs), batch, prefetch, workers,
                              seed, err, len(err))
        if not self._h:
            raise RuntimeError(f"NativeShardLoader: {err.value.decode()}")
        self._lib = lib
        self.batch = batch
        self.num_examples = lib.jl_num_examples(self._h)
        self.batches_per_epoch = lib.jl_batches_per_epoch(self._h)
        # sanity: native row bytes must match the numpy header view
        assert lib.jl_x_row_bytes(self._h) == int(
            np.prod(self.x_shape[1:], dtype=np.int64)) * x_dtype.itemsize

    def next(self):
        """Next batch as fresh numpy arrays: x or (x, y)."""
        if self._h is None:
            # jl_next's c_void_p argtype would happily pass NULL into the C
            # library (unconditional deref = segfault); fail as a Python error
            raise RuntimeError("NativeShardLoader is closed")
        x = np.empty(self.x_shape, self.x_dtype)
        y = np.empty(self.y_shape, self.y_dtype) if self._has_y else None
        rc = self._lib.jl_next(
            self._h, x.ctypes.data_as(ctypes.c_void_p),
            y.ctypes.data_as(ctypes.c_void_p) if y is not None else None)
        if rc != 0:
            raise RuntimeError("loader stopped")
        return (x, y) if self._has_y else x

    def __iter__(self):
        while True:
            yield self.next()

    @property
    def delivered(self) -> int:
        if self._h is None:
            raise RuntimeError("NativeShardLoader is closed")
        return self._lib.jl_delivered(self._h)

    def close(self):
        if self._h:
            self._lib.jl_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
