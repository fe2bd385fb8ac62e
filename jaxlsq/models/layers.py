"""Flax QAT layers: FakeQuantize module + quantized Dense/Conv wrappers.

The model-integration layer the reference delegates to ``torch.quantization``'s
prepare_qat machinery (module hooks inserting LSQFakeQuantizer instances,
SURVEY.md §3.1 top frame).  In flax, quantizers are explicit submodules with
two variable collections:

* ``qparams``     — the learnable scale/shift (give this collection to the
                    optimizer together with 'params'; gradients flow through
                    the fake-quant custom VJP).
* ``quant_state`` — counters, mode flags, observer min/max (mutable,
                    non-trainable; pass ``mutable=['quant_state', 'qparams']``
                    during training so the init-window schedule and observer
                    writes persist).

Observer writes land in the mutated ``qparams`` output.  Train-step contract:
apply the optimizer updates ON TOP of the mutated qparams::

    (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(
        {"params": params["params"], "qparams": mut["qparams"]}, updates)

This is sound because the two update sources are mutually exclusive phases:
parameter gradients are exactly zero while the observer drives (eval_mode
backward, lsq_kernel.h:142-144), and the observer stops writing once LSQ
learning starts — together equivalent to the reference's
copy-into-Parameter-each-step behavior (observers.py:446-449 + requires_grad
gating at :455-456).  See jaxlsq/parallel/train.py for a ready-made step.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..observers.quantizer import LSQQuantizer, QuantizerState
from .qconfig import QConfig

__all__ = ["FakeQuantize", "QuantDense", "QuantDenseGeneral", "QuantConv",
           "QuantEmbed", "dense_apply", "densegeneral_apply", "conv_apply",
           "embed_apply"]


def _dummy_packed(kernel_shape, wspec, axis, bits=None):
    """Zero-filled PackedWeight template so a serve-mode model can ``init()``
    standalone; real values come from ``jaxlsq.serve.convert``."""
    from ..serve.convert import serving_bits
    from ..serve.pack import PackedWeight

    bits = serving_bits(wspec) if bits is None else bits
    k_axis = 0 if len(kernel_shape) == 2 else len(kernel_shape) - 2
    dshape = list(kernel_shape)
    if bits == 4:
        dshape[k_axis] = (dshape[k_axis] + 1) // 2  # odd K zero-pads one row
    c = kernel_shape[axis] if wspec.per_channel else 1
    return PackedWeight(
        data=jnp.zeros(dshape, jnp.int8),
        scale=jnp.ones((c,), jnp.float32),
        zero_point=jnp.zeros((c,), jnp.int32),
        bits=bits, axis=axis, k_axis=k_axis,
        orig_shape=tuple(kernel_shape))


def _static_act_quant(x, scale, zp, aspec):
    """Frozen fake-quant with converted activation qparams — the serving-side
    analogue of eval-mode fake-quant (lsq_kernel.h:6-14 with fixed zp)."""
    per_channel = scale.shape[0] > 1
    s = (scale.reshape((1,) * (x.ndim - 1) + (-1,)) if per_channel
         else scale.reshape(()))
    z = zp.astype(x.dtype).reshape(s.shape)
    xq = jnp.round(jnp.clip(x / s + z, aspec.quant_min, aspec.quant_max))
    return ((xq - z) * s).astype(x.dtype)

_QSTATE_FIELDS = ("current_batch", "n_batches", "fake_quant_enabled",
                  "observer_enabled", "learning_enabled", "obs")


class FakeQuantize(nn.Module):
    """One LSQ fake-quantizer as a flax module (LSQFakeQuantizer equivalent)."""

    cfg: LSQQuantizer

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        if self.cfg.debug_mode:
            return x
        full0 = self.cfg.init(x)  # cheap: a few reductions, traced at init only
        qp = self.variable(
            "qparams", "qp",
            lambda: {"scale": full0.scale, "shift": full0.shift})
        qs = self.variable(
            "quant_state", "qs",
            lambda: {f: getattr(full0, f) for f in _QSTATE_FIELDS})
        state = QuantizerState(scale=qp.value["scale"],
                               shift=qp.value["shift"],
                               **qs.value)
        out, new_state = self.cfg(state, x, training=training)
        if self.is_mutable_collection("quant_state"):
            qs.value = {f: getattr(new_state, f) for f in _QSTATE_FIELDS}
        if self.is_mutable_collection("qparams"):
            qp.value = {"scale": new_state.scale, "shift": new_state.shift}
        return out


def dense_apply(mod: nn.Module, x, qconfig: QConfig, *, features: int,
                use_bias: bool = True, dtype: Any = None,
                kernel_init: Callable = nn.initializers.lecun_normal(),
                bias_init: Callable = nn.initializers.zeros_init(),
                training: bool = False):
    """The quantized-dense forward, parameterized by its HOST module.

    ``mod`` provides the flax plumbing (``param``/``variable``/``path``) and
    nothing else, so the same body serves two hosts: :class:`QuantDense`
    (explicitly authored models) and a stock ``nn.Dense`` intercepted by
    :func:`jaxlsq.models.quantize.quantize_model` (the prepare_qat-style
    drop-in path, reference README.md:103-126) — bit-parity between the two
    is by construction, not by test alone."""
    qc = qconfig.resolve(mod.path)  # mixed-precision overrides
    if qc.mode == "serve":
        y = _dense_serve(mod, x, qc, features)
    else:
        acfg = qc.activation_for_axis(x.ndim - 1)
        if acfg is not None:
            x = FakeQuantize(acfg, name="act_fq", parent=mod)(
                x, training=training)
        kernel = mod.param("kernel", kernel_init, (x.shape[-1], features))
        wcfg = qc.weight_for_axis(1)
        if wcfg is not None:
            kernel = FakeQuantize(wcfg, name="weight_fq", parent=mod)(
                kernel, training=training)
        y = jnp.matmul(x, kernel, preferred_element_type=jnp.float32)
    if use_bias:
        bias = mod.param("bias", bias_init, (features,))
        y = y + bias
    return y.astype(dtype or x.dtype)


def _dense_serve(mod: nn.Module, x, qc: QConfig, features: int):
    """Frozen inference on packed weights: the fused weight-only matmul
    (jaxlsq/serve/matmul.py) replaces fake-quant + float matmul."""
    from ..serve.matmul import (dynamic_int8_matmul, static_int8_matmul,
                                wo_matmul)

    wspec = qc.required_weight_for_axis(1).spec
    kshape = (x.shape[-1], features)
    packed = mod.variable("quantized", "kernel",
                          lambda: _dummy_packed(kshape, wspec, 1)).value
    ascale = azp = None
    if qc.activation is not None:
        c = x.shape[-1] if qc.activation.spec.per_channel else 1
        ascale = mod.variable("quantized", "act_scale",
                              lambda: jnp.ones((c,), jnp.float32)).value
        azp = mod.variable("quantized", "act_zp",
                           lambda: jnp.zeros((c,), jnp.int32)).value
        aspec = qc.activation.spec
        if qc.act_mode == "static_int8":
            # true int8*int8 MXU path with the frozen act qparams
            return static_int8_matmul(x, packed, ascale, azp,
                                      aspec.quant_min, aspec.quant_max)
        if qc.act_mode == "static":
            x = _static_act_quant(x, ascale, azp, aspec)
    if qc.act_mode == "dynamic":
        return dynamic_int8_matmul(x, packed)
    return wo_matmul(x, packed, impl=qc.serve_impl,
                     precision=qc.serve_precision)


def densegeneral_apply(mod: nn.Module, x, qconfig: QConfig, *,
                       features, axis=-1, use_bias: bool = True,
                       dtype: Any = None,
                       kernel_init: Callable = nn.initializers.lecun_normal(),
                       bias_init: Callable = nn.initializers.zeros_init(),
                       training: bool = False):
    """Quantized ``nn.DenseGeneral`` forward (multi-axis contraction),
    parameterized by its HOST module (same two-host contract as
    :func:`dense_apply`; the second host is quantize_model's interceptor —
    stock flax attention projects q/k/v/out through DenseGeneral).

    Parameters keep the STOCK layout — kernel ``(*in_axes, *features)``
    initialized at the flat 2-D shape then reshaped, bias ``features`` —
    so float DenseGeneral checkpoints restore directly.  The quantized
    compute runs on the FLATTENED ``(K, N)`` view: activations fake-quant
    on the flattened input, weights per-channel over the flattened output
    features (axis 1), exactly a :class:`QuantDense` on the 2-D view.  A
    ``quant_state/dg_flat`` marker records the flattening so
    :func:`jaxlsq.serve.convert` packs the 2-D view (serving then runs the
    same fused weight-only / static-int8 matmuls as dense layers, and
    group-wise int4 + TP sharding apply unchanged).

    ``batch_dims`` is not supported (the quantized kernels have no batched
    weights) — the quantize_model interceptor rejects it.
    """
    features = ((features,) if isinstance(features, int)
                else tuple(features))
    axis = (axis,) if isinstance(axis, int) else tuple(axis)
    axis = tuple(a % x.ndim for a in axis)
    if len(set(axis)) != len(axis):
        raise ValueError(f"densegeneral_apply: duplicate axis in {axis}")
    n_axis = len(axis)
    in_dims = tuple(x.shape[a] for a in axis)
    K = math.prod(in_dims)
    N = math.prod(features)
    kshape = in_dims + features

    # Contracted axes to the back (in the given order), then flatten: the
    # remaining dims keep their relative order, matching dot_general's
    # output layout in stock DenseGeneral.
    x2 = jnp.moveaxis(x, axis, tuple(range(x.ndim - n_axis, x.ndim)))
    lead = x2.shape[:x.ndim - n_axis]
    x2 = x2.reshape(lead + (K,))

    qc = qconfig.resolve(mod.path)
    if qc.mode == "serve":
        y2 = _dense_serve(mod, x2, qc, N)
    else:
        acfg = qc.activation_for_axis(x2.ndim - 1)
        if acfg is not None:
            x2 = FakeQuantize(acfg, name="act_fq", parent=mod)(
                x2, training=training)

        def kernel_init_wrap(rng, shape, dtype=jnp.float32):
            # stock DenseGeneral initializes at the flat 2-D shape and
            # reshapes — reproduced so init streams match bit-for-bit
            return jnp.reshape(kernel_init(rng, (K, N), dtype), shape)

        kernel = mod.param("kernel", kernel_init_wrap, kshape)
        k2 = kernel.reshape(K, N)
        wcfg = qc.weight_for_axis(1)
        if wcfg is not None:
            k2 = FakeQuantize(wcfg, name="weight_fq", parent=mod)(
                k2, training=training)
        # layout marker for serve.convert: pack this kernel's (K, N) view
        mod.variable("quant_state", "dg_flat",
                     lambda: jnp.asarray((K, N), jnp.int32))
        y2 = jnp.matmul(x2, k2, preferred_element_type=jnp.float32)
    y = y2.reshape(lead + features)
    if use_bias:
        def bias_init_wrap(rng, shape, dtype=jnp.float32):
            return jnp.reshape(bias_init(rng, (N,), dtype), shape)

        bias = mod.param("bias", bias_init_wrap, features)
        y = y + bias
    return y.astype(dtype or x.dtype)


class QuantDense(nn.Module):
    """Dense layer with LSQ weight + input-activation fake-quantizers.

    Kernel layout is (in_features, features) so the weight per-channel axis is
    1 (output features) — the flax analogue of torch Linear's axis-0
    (out_features-first) convention."""

    features: int
    qconfig: QConfig
    use_bias: bool = True
    dtype: Any = None
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        return dense_apply(
            self, x, self.qconfig, features=self.features,
            use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=self.kernel_init, bias_init=self.bias_init,
            training=training)


class QuantDenseGeneral(nn.Module):
    """``nn.DenseGeneral`` with LSQ quantizers: multi-axis contraction on a
    flattened (K, N) quantized view (see :func:`densegeneral_apply`)."""

    features: Union[int, Sequence[int]]
    qconfig: QConfig
    axis: Union[int, Sequence[int]] = -1
    use_bias: bool = True
    dtype: Any = None
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        return densegeneral_apply(
            self, x, self.qconfig, features=self.features, axis=self.axis,
            use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=self.kernel_init, bias_init=self.bias_init,
            training=training)


def conv_apply(mod: nn.Module, x, qconfig: QConfig, *, features: int,
               kernel_size: Sequence[int],
               strides: Union[int, Sequence[int]] = 1,
               padding: Union[str, Sequence[Tuple[int, int]]] = "SAME",
               use_bias: bool = True, feature_group_count: int = 1,
               dtype: Any = None,
               kernel_init: Callable = nn.initializers.lecun_normal(),
               bias_init: Callable = nn.initializers.zeros_init(),
               training: bool = False):
    """The quantized 2-D conv forward, parameterized by its HOST module
    (see :func:`dense_apply` — same two-host contract).  NHWC inputs; kernel
    layout (kh, kw, in, out) → weight per-channel axis 3."""
    kh, kw = kernel_size
    in_feat = x.shape[-1] // feature_group_count
    qc = qconfig.resolve(mod.path)  # mixed-precision overrides
    if qc.mode == "serve":
        # Weight-only conv: int-packed kernel dequantized on the fly (the
        # HBM win is the 4-8x smaller weight stream).  act_mode
        # 'static_int8' instead runs the true int8*int8 integer conv
        # with the dequant epilogue (serve/matmul.static_int8_conv).
        from ..serve.matmul import static_int8_conv
        from ..serve.pack import dequantize_weight

        if qc.act_mode == "dynamic":
            raise ValueError(
                "act_mode='dynamic' is not supported for conv layers; "
                "use 'static' or 'none' for models containing QuantConv")
        wspec = qc.required_weight_for_axis(3).spec
        kshape = (kh, kw, in_feat, features)
        packed = mod.variable(
            "quantized", "kernel",
            lambda: _dummy_packed(kshape, wspec, 3)).value
        strides2 = ((strides, strides) if isinstance(strides, int)
                    else tuple(strides))
        if qc.activation is not None:
            c = x.shape[-1] if qc.activation.spec.per_channel else 1
            ascale = mod.variable("quantized", "act_scale",
                                  lambda: jnp.ones((c,), jnp.float32)).value
            azp = mod.variable("quantized", "act_zp",
                               lambda: jnp.zeros((c,), jnp.int32)).value
            aspec = qc.activation.spec
            if (qc.act_mode == "static_int8"
                    and packed.bits == 8 and wspec.symmetric
                    and not aspec.per_channel):
                y = static_int8_conv(
                    x, packed, ascale, azp, aspec.quant_min,
                    aspec.quant_max, strides=strides2,
                    padding=padding,
                    feature_group_count=feature_group_count)
                if use_bias:
                    bias = mod.param("bias", bias_init, (features,))
                    y = y + bias
                return y.astype(dtype or x.dtype)
            if qc.act_mode in ("static", "static_int8"):
                # float-simulated fallback (per-channel act qparams,
                # affine or int4 weights)
                x = _static_act_quant(x, ascale, azp, aspec)
        kernel = dequantize_weight(packed, x.dtype)
    else:
        acfg = qc.activation_for_axis(x.ndim - 1)
        if acfg is not None:
            x = FakeQuantize(acfg, name="act_fq", parent=mod)(
                x, training=training)
        kernel = mod.param("kernel", kernel_init,
                           (kh, kw, in_feat, features))
        wcfg = qc.weight_for_axis(3)
        if wcfg is not None:
            kernel = FakeQuantize(wcfg, name="weight_fq", parent=mod)(
                kernel, training=training)
    strides2 = ((strides, strides) if isinstance(strides, int)
                else tuple(strides))
    y = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=strides2,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.float32,
    )
    if use_bias:
        bias = mod.param("bias", bias_init, (features,))
        y = y + bias
    return y.astype(dtype or x.dtype)


class QuantConv(nn.Module):
    """2-D convolution with LSQ weight + input-activation fake-quantizers.

    NHWC inputs; kernel layout (kh, kw, in, out) → weight per-channel axis 3."""

    features: int
    kernel_size: Sequence[int]
    qconfig: QConfig
    strides: Union[int, Sequence[int]] = 1
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    use_bias: bool = True
    feature_group_count: int = 1
    dtype: Any = None
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        return conv_apply(
            self, x, self.qconfig, features=self.features,
            kernel_size=self.kernel_size, strides=self.strides,
            padding=self.padding, use_bias=self.use_bias,
            feature_group_count=self.feature_group_count, dtype=self.dtype,
            kernel_init=self.kernel_init, bias_init=self.bias_init,
            training=training)


def _embed_serve_gather(packed, tokens, dtype):
    """Serving-side embedding lookup: gather int8 rows, dequantize only the
    gathered rows (per-row qparams travel with the gather)."""
    rows = jnp.take(packed.data, tokens, axis=0).astype(jnp.float32)
    c = packed.scale.shape[0]
    if c > 1:
        s = jnp.take(packed.scale, tokens, axis=0)[..., None]
        z = jnp.take(packed.zero_point, tokens, axis=0)[..., None]
    else:
        s, z = packed.scale, packed.zero_point
    return ((rows - z.astype(jnp.float32)) * s).astype(dtype)


def embed_apply(mod: nn.Module, tokens, qconfig: QConfig, *,
                num_embeddings: int, features: int, dtype: Any = jnp.float32,
                embedding_init: Callable = nn.initializers.normal(0.02),
                training: bool = False):
    """The quantized embedding forward, parameterized by its HOST module
    (see :func:`dense_apply` — same two-host contract)."""
    kshape = (num_embeddings, features)
    qc = qconfig.resolve(mod.path)  # mixed-precision overrides
    if qc.mode == "serve":
        wspec = qc.required_weight_for_axis(0).spec
        # int8 always: int4 nibble packing would break row gathers
        packed = mod.variable(
            "quantized", "embedding",
            lambda: _dummy_packed(kshape, wspec, 0, bits=8)).value
        return _embed_serve_gather(packed, tokens, dtype)
    table = mod.param("embedding", embedding_init, kshape)
    wcfg = qc.weight_for_axis(0)
    if wcfg is not None:
        table = FakeQuantize(wcfg, name="weight_fq", parent=mod)(
            table, training=training)
    return jnp.take(table, tokens, axis=0).astype(dtype)


class QuantEmbed(nn.Module):
    """Embedding with an LSQ weight-quantized table.

    Per-row qparams (per-channel axis 0 over the vocab axis — the standard
    embedding layout: one scale per token row, like torch's quantized
    EmbeddingBag).  QAT fake-quants the whole table; serving keeps the table
    as int8 in HBM (4x smaller — embedding tables dominate LM weight bytes)
    and dequantizes only the gathered rows.
    """

    num_embeddings: int
    features: int
    qconfig: QConfig
    dtype: Any = jnp.float32
    embedding_init: Callable = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, tokens, *, training: bool = False):
        return embed_apply(
            self, tokens, self.qconfig, num_embeddings=self.num_embeddings,
            features=self.features, dtype=self.dtype,
            embedding_init=self.embedding_init, training=training)
