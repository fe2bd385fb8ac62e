"""ctypes wrappers over the native reference library (numpy in/out).

These mirror the golden jnp functions (jaxlsq/core/golden.py) exactly:
same (x, scale, shift, spec) signature, same reduced (dX, dS, dB) outputs,
same grad-scale resolution — so tests can compare the two oracles directly.
"""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

from ..core.golden import effective_grad_scale
from ..core.spec import QuantSpec
from .build import load_library

__all__ = ["native_forward", "native_backward", "native_quantize_i8"]


class _LsqParams(ctypes.Structure):
    _fields_ = [
        ("qmin", ctypes.c_double),
        ("qmax", ctypes.c_double),
        ("tmin", ctypes.c_double),
        ("tmax", ctypes.c_double),
        ("grad_scaler", ctypes.c_double),
        ("symmetric", ctypes.c_int32),
        ("eval_mode", ctypes.c_int32),
        ("init_mode", ctypes.c_int32),
    ]


def _layout(x: np.ndarray, spec: QuantSpec) -> Tuple[int, int, int]:
    """(n, channels, inner) for the channel(i) = (i/inner) % C convention."""
    if not spec.per_channel:
        return x.size, 1, 1
    c = x.shape[spec.axis]
    inner = int(np.prod(x.shape[spec.axis + 1:], dtype=np.int64)) \
        if spec.axis + 1 < x.ndim else 1
    return x.size, c, max(inner, 1)


def _params(spec: QuantSpec, gs: float, eval_mode: bool,
            init_mode: bool) -> _LsqParams:
    return _LsqParams(
        qmin=float(spec.quant_min), qmax=float(spec.quant_max),
        tmin=float(spec.type_min), tmax=float(spec.type_max),
        grad_scaler=float(gs),
        symmetric=int(spec.symmetric),
        eval_mode=int(eval_mode), init_mode=int(init_mode))


def _f32c(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float32)


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def native_forward(x: np.ndarray, scale: np.ndarray, shift: np.ndarray,
                   spec: QuantSpec, *, init_mode: bool = False) -> np.ndarray:
    lib = load_library()
    x = _f32c(x)
    n, c, inner = _layout(x, spec)
    scale = np.broadcast_to(_f32c(scale), (c,)).copy()
    shift = np.broadcast_to(_f32c(shift), (c,)).copy()
    out = np.empty_like(x)
    p = _params(spec, 1.0, False, init_mode)
    lib.lsq_forward_f32(_ptr(x), _ptr(scale), _ptr(shift), _ptr(out),
                        ctypes.c_int64(n), ctypes.c_int64(c),
                        ctypes.c_int64(inner), ctypes.byref(p))
    return out


def native_backward(grad: np.ndarray, x: np.ndarray, scale: np.ndarray,
                    shift: np.ndarray, spec: QuantSpec, *,
                    eval_mode: bool = False, init_mode: bool = False,
                    numel: Optional[int] = None):
    lib = load_library()
    grad, x = _f32c(grad), _f32c(x)
    n, c, inner = _layout(x, spec)
    scale_b = np.broadcast_to(_f32c(scale), (c,)).copy()
    shift_b = np.broadcast_to(_f32c(shift), (c,)).copy()
    dx = np.empty_like(x)
    ds = np.zeros((c,), np.float32)
    db = np.zeros((c,), np.float32)
    gs = effective_grad_scale(spec, numel if numel is not None else x.size, c)
    p = _params(spec, gs, eval_mode, init_mode)
    lib.lsq_backward_f32(_ptr(grad), _ptr(x), _ptr(scale_b), _ptr(shift_b),
                         _ptr(dx), _ptr(ds), _ptr(db),
                         ctypes.c_int64(n), ctypes.c_int64(c),
                         ctypes.c_int64(inner), ctypes.byref(p))
    # Output shape matches golden_backward: per-channel always returns (C,)
    # (even for size-1->C broadcast qparams, lsq.cpp:122-129); per-tensor
    # returns the qparam's own shape.
    if c > 1:
        return dx, ds, db
    qshape = np.asarray(scale).shape
    return dx, ds[:1].reshape(qshape), db[:1].reshape(qshape)


def native_quantize_i8(w: np.ndarray, scale: np.ndarray, shift: np.ndarray,
                       spec: QuantSpec) -> np.ndarray:
    lib = load_library()
    w = _f32c(w)
    n, c, inner = _layout(w, spec)
    scale = np.broadcast_to(_f32c(scale), (c,)).copy()
    shift = np.broadcast_to(_f32c(shift), (c,)).copy()
    out = np.empty(w.shape, np.int8)
    p = _params(spec, 1.0, False, False)
    lib.lsq_quantize_i8(_ptr(w), _ptr(scale), _ptr(shift),
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                        ctypes.c_int64(n), ctypes.c_int64(c),
                        ctypes.c_int64(inner), ctypes.byref(p))
    return out
