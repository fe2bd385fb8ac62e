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

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..observers.quantizer import LSQQuantizer, QuantizerState
from .qconfig import QConfig

__all__ = ["FakeQuantize", "QuantDense", "QuantConv"]

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
        acfg = self.qconfig.activation_for_axis(x.ndim - 1)
        if acfg is not None:
            x = FakeQuantize(acfg, name="act_fq")(x, training=training)
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        wcfg = self.qconfig.weight_for_axis(1)
        if wcfg is not None:
            kernel = FakeQuantize(wcfg, name="weight_fq")(
                kernel, training=training)
        y = jnp.matmul(x, kernel, preferred_element_type=jnp.float32)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias
        return y.astype(self.dtype or x.dtype)


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
        acfg = self.qconfig.activation_for_axis(x.ndim - 1)
        if acfg is not None:
            x = FakeQuantize(acfg, name="act_fq")(x, training=training)
        kh, kw = self.kernel_size
        in_feat = x.shape[-1] // self.feature_group_count
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, in_feat, self.features))
        wcfg = self.qconfig.weight_for_axis(3)
        if wcfg is not None:
            kernel = FakeQuantize(wcfg, name="weight_fq")(
                kernel, training=training)
        strides = ((self.strides, self.strides)
                   if isinstance(self.strides, int) else tuple(self.strides))
        y = jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=strides,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count,
            preferred_element_type=jnp.float32,
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias
        return y.astype(self.dtype or x.dtype)
