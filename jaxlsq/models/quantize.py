"""``quantize_model``: prepare_qat-style drop-in quantization of STOCK flax
models.

The reference's integration story is that ``LSQFakeQuantizer`` subclasses
``torch.quantization.ObserverBase`` (observers.py:69-70) precisely so
``torch.quantization.prepare_qat`` / ``convert`` can insert it into ANY user
model without a rewrite (README.md:103-126).  jaxlsq's explicit layers
(:class:`QuantDense` etc.) cover models authored in-repo; this module closes
the drop-in gap for THIRD-PARTY models built from stock ``nn.Dense`` /
``nn.Conv`` / ``nn.Embed``:

    qmodel = quantize_model(model, default_qconfig(8, 8))
    variables = qmodel.init(key, x, training=False)   # float ckpt loads too
    ...train with jaxlsq.parallel.make_train_step...
    served = jaxlsq.serve.convert(variables, qc)
    smodel = quantize_model(model, qc.for_serving("static", "xla"))

Mechanics (flax-idiomatic, no module rewriting): ``QuantizedModel`` wraps the
user model sharing its SCOPE (``nn.share_scope``), and applies it under an
``nn.intercept_methods`` interceptor that reroutes every stock
``nn.Dense``/``nn.Conv``/``nn.Embed`` ``__call__`` through the SAME forward
bodies the explicit layers use (``layers.dense_apply`` / ``conv_apply`` /
``embed_apply``) — parameters are created under the stock module's own scope
with the stock names, so:

* the parameter tree is IDENTICAL to the unquantized model's (a pretrained
  float checkpoint restores directly into the quantized model — the
  prepare_qat semantics);
* quantizer state lands at ``qparams/<layer>/{act_fq,weight_fq}`` — exactly
  where :func:`jaxlsq.serve.convert` looks, so QAT → convert → serving works
  unchanged;
* numerics are bit-identical to a hand-built Quant* model, by construction
  (same code path, not a reimplementation) — pinned in
  tests/test_quantize_model.py.

Mixed precision composes: QConfig ``overrides`` patterns match the stock
module paths.  Layers matching ``skip`` patterns stay float.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import conv_apply, dense_apply, densegeneral_apply
from .qconfig import QConfig

__all__ = ["quantize_model", "QuantizedModel"]

# Parametric stock modules with no quantized equivalent (yet).  These RAISE
# instead of silently running float — a user calling quantize_model believes
# the model is quantized; a silent fallback would ship an unquantized layer.
# Any of them can be kept float explicitly via `skip`.
_UNSUPPORTED = tuple(
    getattr(nn, name) for name in
    ("ConvTranspose", "ConvLocal", "Einsum")
    if hasattr(nn, name))


def _path_of(mod: nn.Module) -> str:
    return "/".join(str(p) for p in mod.path)


def _conv_kwargs(mod: nn.Conv, path: str) -> dict:
    """Map a stock nn.Conv's fields onto conv_apply's (2-D NHWC) contract,
    rejecting configurations the quantized conv does not implement."""
    ks = mod.kernel_size
    if isinstance(ks, int) or len(tuple(ks)) != 2:
        raise ValueError(
            f"quantize_model: only 2-D convolutions are supported; layer "
            f"'{path}' has kernel_size={ks!r}.  Add the path to skip=() to "
            "keep it float.")
    ks = tuple(ks)

    def _is_one(dilation):
        if dilation is None:
            return True
        if isinstance(dilation, int):
            return dilation == 1
        return all(d == 1 for d in dilation)

    if not _is_one(mod.kernel_dilation) or not _is_one(mod.input_dilation):
        raise ValueError(
            f"quantize_model: dilated convolutions are not supported "
            f"(layer '{path}').  Add the path to skip=() to keep it float.")
    if getattr(mod, "mask", None) is not None:
        raise ValueError(f"quantize_model: masked convolutions are not "
                         f"supported (layer '{path}').")
    padding = mod.padding
    if isinstance(padding, str):
        if padding.upper() not in ("SAME", "VALID"):
            raise ValueError(
                f"quantize_model: padding={padding!r} is not supported "
                f"(layer '{path}'); only 'SAME'/'VALID'/explicit pairs.")
    elif isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    strides = mod.strides
    if strides is None:
        strides = 1
    return dict(features=mod.features, kernel_size=ks, strides=strides,
                padding=padding, use_bias=mod.use_bias,
                feature_group_count=mod.feature_group_count,
                dtype=mod.dtype, kernel_init=mod.kernel_init,
                bias_init=mod.bias_init)


def _embed_intercept(mod: nn.Embed, tokens, qconfig: QConfig,
                     training: bool):
    """nn.Embed creates its table in ``setup()`` (not a compact method), so
    the module-level ``param``/submodule APIs are unavailable at interception
    time — this branch goes through the SCOPE API instead (the interceptor
    also swallows Embed's own setup, see _make_interceptor): the table is
    created under the stock name 'embedding' with the stock initializer
    (float checkpoints restore directly), and the weight quantizer lands at
    '<embed>/weight_fq' — the same layout as QuantEmbed/embed_apply."""
    from .layers import FakeQuantize, _dummy_packed, _embed_serve_gather

    kshape = (mod.num_embeddings, mod.features)
    qc = qconfig.resolve(mod.path)
    dtype = mod.dtype or jnp.float32
    if qc.mode == "serve":
        wspec = qc.required_weight_for_axis(0).spec
        packed = mod.scope.variable(
            "quantized", "embedding",
            lambda: _dummy_packed(kshape, wspec, 0, bits=8)).value
        return _embed_serve_gather(packed, tokens, dtype)
    table = mod.scope.param("embedding", mod.embedding_init, kshape,
                            mod.param_dtype)
    wcfg = qc.weight_for_axis(0)
    if wcfg is not None:
        table = FakeQuantize(wcfg, parent=mod.scope.push("weight_fq"))(
            table, training=training)
    return jnp.take(table, tokens, axis=0).astype(dtype)


def _make_interceptor(qconfig: QConfig, training: bool,
                      skip: Tuple[str, ...]):
    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        t = type(mod)
        if t not in (nn.Dense, nn.DenseGeneral, nn.Conv,
                     nn.Embed) and not isinstance(mod, _UNSUPPORTED):
            return next_fun(*args, **kwargs)
        path = _path_of(mod)
        if any(pat in path for pat in skip):
            return next_fun(*args, **kwargs)
        if t is nn.Embed and context.method_name == "setup":
            # Embed eagerly creates its table in setup; the __call__ branch
            # below creates it itself (same name/init), so swallow this —
            # in serve mode the float table must not exist at all (convert
            # drops packed kernels from 'params').
            return None
        if context.method_name != "__call__":
            return next_fun(*args, **kwargs)
        if t is nn.Dense:
            if (getattr(mod, "dot_general", None) is not None
                    or getattr(mod, "dot_general_cls", None) is not None):
                raise ValueError(
                    f"quantize_model: nn.Dense with a custom dot_general is "
                    f"not supported (layer '{path}').")
            return dense_apply(
                mod, args[0], qconfig, features=mod.features,
                use_bias=mod.use_bias, dtype=mod.dtype,
                kernel_init=mod.kernel_init, bias_init=mod.bias_init,
                training=training)
        if t is nn.DenseGeneral:
            if (getattr(mod, "dot_general", None) is not None
                    or getattr(mod, "dot_general_cls", None) is not None):
                raise ValueError(
                    f"quantize_model: nn.DenseGeneral with a custom "
                    f"dot_general is not supported (layer '{path}').")
            if tuple(mod.batch_dims or ()):
                raise ValueError(
                    f"quantize_model: nn.DenseGeneral with batch_dims is "
                    f"not supported — quantized kernels have no batched "
                    f"weights (layer '{path}').  Add the path to skip=() "
                    "to keep it float.")
            return densegeneral_apply(
                mod, args[0], qconfig, features=mod.features, axis=mod.axis,
                use_bias=mod.use_bias, dtype=mod.dtype,
                kernel_init=mod.kernel_init, bias_init=mod.bias_init,
                training=training)
        if t is nn.Embed:
            return _embed_intercept(mod, args[0], qconfig, training)
        if t is nn.Conv:
            return conv_apply(mod, args[0], qconfig, training=training,
                              **_conv_kwargs(mod, path))
        # exact-type subclasses of Dense/Conv/Embed fall through above;
        # known-parametric unsupported types must not silently stay float
        raise ValueError(
            f"quantize_model: layer '{path}' ({t.__name__}) has parameters "
            "but no quantized equivalent; add a skip=() pattern to keep it "
            "float explicitly, or rewrite it with jaxlsq.models layers.")

    return interceptor


class QuantizedModel(nn.Module):
    """A stock flax model applied with LSQ quantizers injected into every
    ``nn.Dense``/``nn.Conv``/``nn.Embed`` call (see module docstring).

    Shares the wrapped model's scope, so variable paths are UNPREFIXED —
    identical to applying ``model`` directly, plus the quantizer
    collections.  Use exactly like a hand-built Quant* model:
    ``init(key, *args, training=False)`` / ``apply(variables, *args,
    training=..., mutable=['quant_state', 'qparams', ...])``.
    """

    model: nn.Module
    qconfig: QConfig
    skip: Tuple[str, ...] = ()

    def setup(self):
        nn.share_scope(self, self.model)

    def __call__(self, *args, training: bool = False, **kwargs):
        with nn.intercept_methods(
                _make_interceptor(self.qconfig, training, self.skip)):
            return self.model(*args, **kwargs)


def quantize_model(model: nn.Module, qconfig: QConfig, *,
                   skip: Sequence[str] = ()) -> QuantizedModel:
    """Wrap a STOCK flax model so every ``nn.Dense``/``nn.Conv``/``nn.Embed``
    runs with LSQ weight + activation fake-quantizers (QAT) or the packed
    serving kernels (``qconfig.for_serving(...)``), without rewriting it.

    Args:
      model: any flax module built from stock layers (setup or compact).
      qconfig: the same QConfig the explicit Quant* layers take — including
        ``with_overrides`` mixed precision (patterns match the stock module
        paths) and serving mode.
      skip: path patterns (substring match on the '/'-joined module path)
        to leave in float — e.g. ``skip=('head',)``.

    Returns a :class:`QuantizedModel` whose variables are layout-compatible
    with the bare model's ('params' identical — float checkpoints restore
    directly) and with :func:`jaxlsq.serve.convert`.
    """
    return QuantizedModel(model=model, qconfig=qconfig, skip=tuple(skip))
