"""Golden (pure-jnp) implementation of the LSQ/LSQ+ fake-quant forward/backward math.

This module is the *specification* for every other compute path in the framework:
the Pallas kernels (jaxlsq/ops/pallas_kernels.py) and the native C++ cross-check
library must agree with it bit-for-bit in f32.

It transcribes the single authoritative math header of the reference,
``torchlsq/csrc/ops/kernels/lsq_kernel.h`` (see SURVEY.md §0):

Forward (lsq_kernel.h:6-14)::

    s   = max(eps, |scale|)
    zp  = nearbyint(clamp(-shift/s, tmin, tmax))       # float-held rounded zero-point
    out = init_mode ? x : (nearbyint(clamp(x/s + zp, qmin, qmax)) - zp) * s

Backward (combined kernel, lsq_kernel.h:94-123)::

    xq   = clamp(x/s + zp, qmin, qmax)                 # NOT rounded for the mask
    mask = (qmin < xq) & (xq < qmax)                   # strict inequalities
    xfq  = (nearbyint(xq) - zp) * s
    dX   = init_mode ? g : g * mask                    # STE
    geff = init_mode ? 2*(xfq - x) : g                 # LSQ+ backprop-init trick
    dB   = sym ? 0 : (!mask) * geff
    dS   = mask ? geff*(xfq - x)/s
               : (xq <= qmin ? geff*(qmin - zp) : geff*(qmax - zp))
    dS  *= grad_scaler ; dB *= grad_scaler

Eval mode (lsq_kernel.h:126-145): forward unchanged, backward returns the STE dX
with dS = dB = 0.

``nearbyint`` in the default FP environment is round-half-to-even, which is exactly
``jnp.round``.

Scale clamping: the reference clamps ``s = max(eps, |scale|)`` with
eps = machine epsilon of the compute dtype, both per-tensor (host-side,
lsq_cpu.cpp:45-46) and per-channel (in-kernel, lsq_kernel.h:157-158).  We apply the
same formula uniformly.

Gradient scaling (LSQ paper §"gradient scale"): effective multiplier
``grad_scaler / sqrt(numel * qmax)`` per-tensor (lsq_cpu.cpp:103-104) and
``grad_scaler / sqrt(numel * qmax / C)`` per-channel.  We adopt the CPU
(per-channel-corrected) form (lsq_cpu.cpp:250-251); the reference's CUDA
per-channel path omits the ``/C`` (lsq_cuda.cu:274-275) — a documented reference
inconsistency we deliberately do not replicate.  Under data parallelism ``numel``
should be the *global* (logical) element count; callers can override it via
``numel`` (see SURVEY.md §2c).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp

from .spec import QuantSpec

__all__ = [
    "effective_grad_scale",
    "clamp_scale",
    "broadcast_qparams",
    "golden_forward",
    "golden_backward",
    "golden_forward_traced",
    "golden_backward_traced",
]


def clamp_scale(scale: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """``s = max(eps, |scale|)`` (lsq_kernel.h:157-158, lsq_cpu.cpp:45-46)."""
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype=dtype)
    return jnp.maximum(jnp.abs(scale.astype(dtype)), eps)


def effective_grad_scale(spec: QuantSpec, numel: int, num_channels: int = 1) -> float:
    """LSQ gradient scale: user_scaler / sqrt(N * qmax [/ C]) (lsq_cpu.cpp:103,250)."""
    if not spec.use_grad_scaling:
        return float(spec.grad_scaler)
    n = float(numel) * float(spec.quant_max)
    if spec.per_channel:
        n = n / float(num_channels)
    return float(spec.grad_scaler) / math.sqrt(n)


def broadcast_qparams(q: jnp.ndarray, x_ndim: int, axis: int) -> jnp.ndarray:
    """Reshape a 1-D per-channel qparam for broadcasting against x along ``axis``
    (the jnp analogue of the reference's ``_unsafe_view`` broadcast at
    lsq_cpu.cpp:168-177)."""
    shape = [1] * x_ndim
    shape[axis] = q.shape[0] if q.ndim > 0 else 1
    return q.reshape(shape)


def _prep(x, scale, shift, spec: QuantSpec):
    """Common preamble: clamp scale, broadcast qparams, compute zp.

    Returns (s, b, zp) broadcast-compatible with x."""
    cdt = x.dtype
    s = clamp_scale(scale, cdt)
    b = shift.astype(cdt)
    if spec.per_channel:
        s = broadcast_qparams(s, x.ndim, spec.axis)
        b = broadcast_qparams(b, x.ndim, spec.axis)
    zp = jnp.round(jnp.clip(-b / s, spec.type_min, spec.type_max))
    return s, b, zp


def golden_forward(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    shift: jnp.ndarray,
    spec: QuantSpec,
    *,
    init_mode: bool = False,
) -> jnp.ndarray:
    """Fake-quantize forward (lsq_kernel.h:6-14).  ``init_mode`` ⇒ identity."""
    if init_mode:
        return x
    s, _, zp = _prep(x, scale, shift, spec)
    xq = jnp.round(jnp.clip(x / s + zp, spec.quant_min, spec.quant_max))
    return (xq - zp) * s


def golden_backward(
    grad: jnp.ndarray,
    x: jnp.ndarray,
    scale: jnp.ndarray,
    shift: jnp.ndarray,
    spec: QuantSpec,
    *,
    eval_mode: bool = False,
    init_mode: bool = False,
    numel: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fake-quantize backward (lsq_kernel.h:94-145).

    Returns (dX, dS, dB) where dS/dB have the shape of scale/shift (per-tensor:
    shape (1,); per-channel: shape (C,)) — i.e. the elementwise contributions are
    already reduced over all non-channel axes (lsq_cpu.cpp:138-139, 287-293).
    """
    s, _, zp = _prep(x, scale, shift, spec)
    qmin, qmax = float(spec.quant_min), float(spec.quant_max)

    xq = jnp.clip(x / s + zp, qmin, qmax)  # unrounded for the mask
    mask = (qmin < xq) & (xq < qmax)  # strict (lsq_kernel.h:109)
    dX = grad if init_mode else grad * mask  # init_mode is a static Python bool here

    if eval_mode:
        # lsq_kernel.h:126-145: STE dX (init_mode passthrough), zero param grads.
        return (dX,
                jnp.zeros_like(scale, dtype=x.dtype),
                jnp.zeros_like(shift, dtype=x.dtype))

    xfq = (jnp.round(xq) - zp) * s
    if init_mode:
        dX = grad  # identity forward → pass grad through (lsq_kernel.h:112)
        geff = 2.0 * (xfq - x)  # d||x_fq - x||² / dx_fq (lsq_kernel.h:116)
    else:
        geff = grad

    dB_elem = jnp.where(mask, 0.0, geff)
    if spec.symmetric:
        dB_elem = jnp.zeros_like(dB_elem)
    border = jnp.where(xq <= qmin, geff * (qmin - zp), geff * (qmax - zp))
    dS_elem = jnp.where(mask, geff * (xfq - x) / s, border)

    n = numel if numel is not None else x.size
    if spec.per_channel:
        gs = effective_grad_scale(spec, n, x.shape[spec.axis])
        red_axes = tuple(a for a in range(x.ndim) if a != spec.axis)
        dS = jnp.sum(dS_elem, axis=red_axes) * gs
        dB = jnp.sum(dB_elem, axis=red_axes) * gs
    else:
        gs = effective_grad_scale(spec, n)
        dS = jnp.sum(dS_elem).reshape(scale.shape) * gs
        dB = jnp.sum(dB_elem).reshape(shift.shape) * gs
    return dX, dS.astype(scale.dtype), dB.astype(shift.dtype)


# ---------------------------------------------------------------------------
# Traced-flag variants
# ---------------------------------------------------------------------------
#
# The reference flips eval_mode/init_mode from Python attribute state mid-
# training (observers.py:424-462), which retraces under jit.  These variants
# take the two mode flags as TRACED 0/1 float scalars so one compiled program
# covers the whole QAT schedule (observer window → full LSQ) with no retrace —
# the jnp.where selects are free relative to the op's HBM-bound cost.
# Semantics are identical to the static functions above for flag ∈ {0, 1}.

def golden_forward_traced(x, scale, shift, spec: QuantSpec,
                          eval_flag, init_flag):
    """Forward with traced mode flags: out = init ? x : fake_quant(x).

    ``eval_flag`` does not affect the forward (lsq_kernel.h:126-145 changes only
    the backward); it is accepted for signature symmetry.
    """
    del eval_flag
    s, _, zp = _prep(x, scale, shift, spec)
    xq = jnp.round(jnp.clip(x / s + zp, spec.quant_min, spec.quant_max))
    fq = (xq - zp) * s
    init = jnp.asarray(init_flag, x.dtype).reshape(())
    return init * x + (1.0 - init) * fq


def golden_backward_traced(grad, x, scale, shift, spec: QuantSpec,
                           eval_flag, init_flag,
                           numel: Optional[int] = None):
    """Backward with traced mode flags; returns (dX, dS, dB)."""
    s, _, zp = _prep(x, scale, shift, spec)
    qmin, qmax = float(spec.quant_min), float(spec.quant_max)
    ev = jnp.asarray(eval_flag, jnp.float32).reshape(())
    ini = jnp.asarray(init_flag, jnp.float32).reshape(())

    xq = jnp.clip(x / s + zp, qmin, qmax)
    mask = (qmin < xq) & (xq < qmax)
    # dX: init → passthrough; else STE mask (both eval and full modes)
    dX = jnp.where(ini > 0, grad, grad * mask)

    xfq = (jnp.round(xq) - zp) * s
    geff = jnp.where(ini > 0, 2.0 * (xfq - x), grad)
    dB_elem = jnp.where(mask, 0.0, geff)
    if spec.symmetric:
        dB_elem = jnp.zeros_like(dB_elem)
    border = jnp.where(xq <= qmin, geff * (qmin - zp), geff * (qmax - zp))
    dS_elem = jnp.where(mask, geff * (xfq - x) / s, border)

    n = numel if numel is not None else x.size
    live = 1.0 - ev  # eval zeroes the param grads (lsq_kernel.h:142-144)
    if spec.per_channel:
        gs = effective_grad_scale(spec, n, x.shape[spec.axis])
        red = tuple(a for a in range(x.ndim) if a != spec.axis)
        dS = jnp.sum(dS_elem, axis=red) * (gs * live)
        dB = jnp.sum(dB_elem, axis=red) * (gs * live)
    else:
        gs = effective_grad_scale(spec, n)
        dS = jnp.sum(dS_elem).reshape(scale.shape) * (gs * live)
        dB = jnp.sum(dB_elem).reshape(shift.shape) * (gs * live)
    return dX, dS.astype(scale.dtype), dB.astype(shift.dtype)
