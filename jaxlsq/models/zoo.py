"""Model zoo: quantized reference architectures for QAT parity runs.

The reference ships no models (it is a pure quantizer extension); these cover
the BASELINE.json configs — "small CNN (ResNet-18-class) with LSQ+ observers in
all conv/linear layers" — as flax modules built from QuantDense/QuantConv.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import QuantConv, QuantDense
from .qconfig import QConfig

__all__ = ["QuantMLP", "QuantCNN", "QuantResNet", "resnet18_cifar"]


class QuantMLP(nn.Module):
    """2-layer MLP — the minimum end-to-end QAT slice (SURVEY.md §7)."""

    features: Sequence[int]
    qconfig: QConfig

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        for i, f in enumerate(self.features[:-1]):
            x = QuantDense(f, self.qconfig, name=f"dense_{i}")(
                x, training=training)
            x = nn.relu(x)
        return QuantDense(self.features[-1], self.qconfig,
                          name="head")(x, training=training)


class QuantCNN(nn.Module):
    """Small conv net (CIFAR-scale) with quantized conv/linear layers."""

    num_classes: int
    qconfig: QConfig
    widths: Sequence[int] = (32, 64)

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        for i, w in enumerate(self.widths):
            x = QuantConv(w, (3, 3), self.qconfig, name=f"conv_{i}")(
                x, training=training)
            x = nn.relu(x)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape((x.shape[0], -1))
        return QuantDense(self.num_classes, self.qconfig,
                          name="head")(x, training=training)


class BasicBlock(nn.Module):
    """ResNet-v1 basic block with quantized convs + BatchNorm."""

    features: int
    qconfig: QConfig
    strides: int = 1

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        residual = x
        y = QuantConv(self.features, (3, 3), self.qconfig,
                      strides=self.strides, use_bias=False,
                      name="conv1")(x, training=training)
        y = nn.BatchNorm(use_running_average=not training, name="bn1")(y)
        y = nn.relu(y)
        y = QuantConv(self.features, (3, 3), self.qconfig, use_bias=False,
                      name="conv2")(y, training=training)
        y = nn.BatchNorm(use_running_average=not training, name="bn2")(y)
        if residual.shape != y.shape:
            residual = QuantConv(self.features, (1, 1), self.qconfig,
                                 strides=self.strides, use_bias=False,
                                 name="downsample")(x, training=training)
            residual = nn.BatchNorm(use_running_average=not training,
                                    name="bn_down")(residual)
        return nn.relu(y + residual)


class QuantResNet(nn.Module):
    """ResNet-18-class network (CIFAR stem) with LSQ quantizers everywhere."""

    num_classes: int
    qconfig: QConfig
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    widths: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        x = QuantConv(self.widths[0], (3, 3), self.qconfig, use_bias=False,
                      name="stem")(x, training=training)
        x = nn.BatchNorm(use_running_average=not training, name="bn_stem")(x)
        x = nn.relu(x)
        for si, (n_blocks, w) in enumerate(zip(self.stage_sizes, self.widths)):
            for bi in range(n_blocks):
                strides = 2 if (si > 0 and bi == 0) else 1
                x = BasicBlock(w, self.qconfig, strides=strides,
                               name=f"stage{si}_block{bi}")(
                    x, training=training)
        x = jnp.mean(x, axis=(1, 2))
        return QuantDense(self.num_classes, self.qconfig,
                          name="head")(x, training=training)


def resnet18_cifar(num_classes: int, qconfig: QConfig) -> QuantResNet:
    return QuantResNet(num_classes=num_classes, qconfig=qconfig)
