"""Public functional fake-quant API with a custom VJP.

This layer replaces, in one place, the reference's entire L2-L4 stack
(SURVEY.md §1): the Python functional wrapper (torchlsq/functional.py:8-97), the
C++ composite op + dispatcher registration (torchlsq/csrc/ops/lsq.cpp:104-146)
and the autograd bridge (torchlsq/csrc/ops/autograd/lsq_autograd.cpp:18-303).
Under JAX none of that machinery exists: tracing replaces dispatch keys, and
``jax.custom_vjp`` replaces the autograd Function classes.

Two compute paths sit behind the same interface:

* ``impl='reference'`` — the pure-jnp golden model (jaxlsq/core/golden.py).
  Runs anywhere; XLA fuses it reasonably well.  This is also the double-check
  oracle for the Pallas path.
* ``impl='pallas'``   — fused Pallas TPU kernels (jaxlsq/ops/pallas_kernels.py):
  one forward pass; one *single-pass* backward kernel emitting the dX tile plus
  per-tile partial sums for dS/dB (vs the reference CUDA backward's 3 separate
  full-size-buffer kernel launches, lsq_cuda.cu:91-141 — see BASELINE.md).
* ``impl='auto'``     — the XLA-fused golden path (measured faster than the
  Pallas kernels on v5e — see ``_default_impl``); 'pallas' is opt-in.

Double backward: the reference hard-errors (lsq_autograd.cpp:106,208).  Here
the 'reference' (golden jnp) path's backward is itself differentiable jnp, so
second-order reverse-mode works as the gradient of the LSQ backward formula;
the 'pallas' path has no VJP-of-backward and raises like the reference.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.golden import golden_backward, golden_forward
from ..core.spec import QuantSpec

__all__ = ["fake_quant", "fake_quant_traced", "lsq"]


def _default_impl() -> str:
    """Default compute path.

    Measured on TPU v5e (see bench.py): with output↔input aliasing on both
    kernels, the Pallas path and the XLA-fused golden path are at parity on
    the isolated op (within ~4% of each other at ~0.8 of the HBM roofline —
    both at the chip's achievable stream ceiling).  The golden path stays the
    default because INSIDE real models XLA additionally fuses the fake-quant
    into neighboring elementwise ops (bias/activation/norm), which an opaque
    custom call cannot.  Measured in-model (steady-state QAT step,
    interleaved min-of-rounds — docs/measurements/impl_auto_inmodel_tpu.json):
    ResNet18-CIFAR B=64 6.29 ms (golden) vs 9.01 ms (pallas); transformer LM
    d512×4 B=16 4.76 vs 4.85 ms.  ``impl='pallas'`` remains the explicit
    option and the blueprint for ops XLA cannot fuse (the serving-path
    quantized matmul epilogues, where Pallas DOES win — bench.py serve legs).
    """
    return "reference"


@functools.lru_cache(maxsize=None)
def _build(spec: QuantSpec, eval_mode: bool, init_mode: bool,
           numel: Optional[int], impl: str):
    """Build (and cache) a custom_vjp fake-quant function for a static config.

    The cache is keyed on everything static; JAX's own jit cache then keys on
    shapes/dtypes.  This mirrors how the reference bakes its scalar args into the
    TensorIterator loops per call (lsq_cpu.cpp:88-104) — but resolved at trace
    time instead of per kernel launch (no host↔device ``.item()`` syncs,
    cf. lsq_cpu.cpp:44-46).
    """
    if impl == "pallas":
        from . import pallas_kernels as pk

        fwd_impl = functools.partial(pk.pallas_forward, spec=spec, init_mode=init_mode)
        bwd_impl = functools.partial(
            pk.pallas_backward, spec=spec, eval_mode=eval_mode,
            init_mode=init_mode, numel=numel)
    else:
        fwd_impl = functools.partial(golden_forward, spec=spec, init_mode=init_mode)
        bwd_impl = functools.partial(
            golden_backward, spec=spec, eval_mode=eval_mode,
            init_mode=init_mode, numel=numel)

    @jax.custom_vjp
    def _fq(x, scale, shift):
        return fwd_impl(x, scale, shift)

    def _fq_fwd(x, scale, shift):
        # Residuals = raw inputs, like the reference ctx->save_for_backward of
        # {input, scale, shift} (lsq_autograd.cpp:33-42).
        return fwd_impl(x, scale, shift), (x, scale, shift)

    def _fq_bwd(res, g):
        x, scale, shift = res
        dX, dS, dB = bwd_impl(g, x, scale, shift)
        return dX, dS, dB

    _fq.defvjp(_fq_fwd, _fq_bwd)
    return _fq


def fake_quant(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    shift: jnp.ndarray,
    spec: QuantSpec,
    *,
    eval_mode: bool = False,
    init_mode: bool = False,
    numel: Optional[int] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """LSQ/LSQ+ fake quantization with learned scale/shift.

    Args:
      x: input array (any shape; any float dtype — math runs in x.dtype like the
        reference's AT_DISPATCH, but prefer f32 for exact parity).
      scale, shift: 1-D qparams — shape (1,) per-tensor or (C,) per-channel,
        matching the reference's strict 1-D contract (lsq.cpp:119-120).  Size-1
        qparams are broadcast to C in per-channel mode (lsq.cpp:122-129).
      spec: static QuantSpec.
      eval_mode: behave like a plain FakeQuantize — forward unchanged, STE dX,
        dS = dB = 0 (lsq_kernel.h:126-145).
      init_mode: LSQ+ backprop-init — identity forward, grads train scale/shift
        on ||x_fq − x||² (lsq_kernel.h:112-116).
      numel: logical (global) element count for grad scaling; defaults to
        x.size.  Under data-parallel sharding pass the *global* count
        (SURVEY.md §2c).
      impl: 'auto' | 'pallas' | 'reference'.
    """
    if scale.ndim != 1 or shift.ndim != 1:
        raise ValueError(
            "scale/shift must be 1-D, even per-tensor (reference lsq.cpp:119-120); "
            f"got scale.ndim={scale.ndim}, shift.ndim={shift.ndim}")
    if spec.per_channel:
        c = x.shape[spec.axis]
        # Broadcast size-1 qparams to the channel count (lsq.cpp:122-129).
        if scale.shape[0] == 1 and c > 1:
            scale = jnp.broadcast_to(scale, (c,))
        if shift.shape[0] == 1 and c > 1:
            shift = jnp.broadcast_to(shift, (c,))
        if scale.shape[0] != c or shift.shape[0] != c:
            raise ValueError(
                f"per-channel qparams must have size {c} (axis {spec.axis}); "
                f"got {scale.shape[0]}/{shift.shape[0]}")
    if impl == "auto":
        impl = _default_impl()
    fn = _build(spec, bool(eval_mode), bool(init_mode), numel, impl)
    return fn(x, scale, shift)


def lsq(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    shift: jnp.ndarray,
    quant_min: int = 0,
    quant_max: int = 255,
    type_min: Optional[int] = None,
    type_max: Optional[int] = None,
    axis: int = 1,
    use_grad_scaling: bool = True,
    grad_scaler: float = 1.0,
    is_affine: bool = True,
    is_perchannel: bool = False,
    eval_mode: bool = False,
    init_mode: bool = False,
    *,
    numel: Optional[int] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Drop-in signature-compatible port of the reference functional entry point
    ``torchlsq.functional.lsq`` (torchlsq/functional.py:8-19), including its
    defaults (quint8 range 0..255, axis=1, affine, per-tensor)."""
    spec = QuantSpec(
        quant_min=quant_min,
        quant_max=quant_max,
        type_min=type_min,
        type_max=type_max,
        symmetric=not is_affine,
        per_channel=is_perchannel,
        axis=axis,
        use_grad_scaling=use_grad_scaling,
        grad_scaler=grad_scaler,
    )
    return fake_quant(
        x, scale, shift, spec,
        eval_mode=eval_mode, init_mode=init_mode, numel=numel, impl=impl)


# ---------------------------------------------------------------------------
# Traced-mode-flag variant (single program over the whole QAT phase schedule)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _build_traced(spec: QuantSpec, numel: Optional[int], impl: str):
    if impl == "pallas":
        from . import pallas_kernels as pk

        fwd_impl = functools.partial(pk.pallas_forward_traced, spec=spec)
        bwd_impl = functools.partial(pk.pallas_backward_traced, spec=spec,
                                     numel=numel)
    else:
        from ..core.golden import golden_backward_traced, golden_forward_traced

        fwd_impl = functools.partial(golden_forward_traced, spec=spec)
        bwd_impl = functools.partial(golden_backward_traced, spec=spec,
                                     numel=numel)

    @jax.custom_vjp
    def _fq(x, scale, shift, eval_flag, init_flag):
        return fwd_impl(x, scale, shift, eval_flag=eval_flag,
                        init_flag=init_flag)

    def _fq_fwd(x, scale, shift, eval_flag, init_flag):
        out = fwd_impl(x, scale, shift, eval_flag=eval_flag,
                       init_flag=init_flag)
        return out, (x, scale, shift, eval_flag, init_flag)

    def _fq_bwd(res, g):
        x, scale, shift, eval_flag, init_flag = res
        dX, dS, dB = bwd_impl(g, x, scale, shift, eval_flag=eval_flag,
                              init_flag=init_flag)
        return dX, dS, dB, jnp.zeros_like(eval_flag), jnp.zeros_like(init_flag)

    _fq.defvjp(_fq_fwd, _fq_bwd)
    return _fq


def fake_quant_traced(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    shift: jnp.ndarray,
    spec: QuantSpec,
    *,
    eval_flag,
    init_flag,
    numel: Optional[int] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """``fake_quant`` with TRACED eval/init mode flags (f32 0/1 scalars).

    One compiled program covers the reference's whole mode schedule
    (observers.py:424-462: observer window → backprop-init → full LSQ → eval)
    with no retracing — the flags select behavior with elementwise jnp.where,
    which is free for this HBM-bound op.  Use this inside jit/scan train steps;
    use ``fake_quant`` when the phase is known statically.
    """
    if scale.ndim != 1 or shift.ndim != 1:
        raise ValueError("scale/shift must be 1-D (reference lsq.cpp:119-120)")
    if spec.per_channel:
        c = x.shape[spec.axis]
        if scale.shape[0] == 1 and c > 1:
            scale = jnp.broadcast_to(scale, (c,))
        if shift.shape[0] == 1 and c > 1:
            shift = jnp.broadcast_to(shift, (c,))
    if impl == "auto":
        impl = _default_impl()
    ev = jnp.asarray(eval_flag, jnp.float32).reshape(())
    ini = jnp.asarray(init_flag, jnp.float32).reshape(())
    fn = _build_traced(spec, numel, impl)
    return fn(x, scale, shift, ev, ini)
