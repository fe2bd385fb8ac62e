"""Model zoo: quantized reference architectures for QAT parity runs.

The reference ships no models (it is a pure quantizer extension); these cover
the BASELINE.json configs — "small CNN (ResNet-18-class) with LSQ+ observers in
all conv/linear layers" — as flax modules built from QuantDense/QuantConv.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import QuantConv, QuantDense, QuantEmbed
from .qconfig import QConfig

__all__ = ["QuantMLP", "QuantCNN", "QuantResNet", "resnet18_cifar",
           "QuantMobileNetV2", "mobilenetv2_cifar",
           "QuantTransformerBlock", "QuantTransformerLM"]


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


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted-residual block: 1x1 expand → 3x3 depthwise →
    1x1 project, all LSQ-quantized.  Depthwise = QuantConv with
    feature_group_count == channels (per-channel weight axis still 3/HWIO)."""

    features: int
    qconfig: QConfig
    strides: int = 1
    expand: int = 6

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        cin = x.shape[-1]
        hidden = cin * self.expand
        y = x
        if self.expand != 1:
            y = QuantConv(hidden, (1, 1), self.qconfig, use_bias=False,
                          name="expand")(y, training=training)
            y = nn.BatchNorm(use_running_average=not training,
                             name="bn_expand")(y)
            y = nn.relu6(y)
        y = QuantConv(hidden, (3, 3), self.qconfig, strides=self.strides,
                      use_bias=False, feature_group_count=hidden,
                      name="depthwise")(y, training=training)
        y = nn.BatchNorm(use_running_average=not training, name="bn_dw")(y)
        y = nn.relu6(y)
        y = QuantConv(self.features, (1, 1), self.qconfig, use_bias=False,
                      name="project")(y, training=training)
        y = nn.BatchNorm(use_running_average=not training, name="bn_proj")(y)
        if self.strides == 1 and cin == self.features:
            y = y + x
        return y


class QuantMobileNetV2(nn.Module):
    """MobileNetV2-class network (CIFAR stem) with LSQ quantizers throughout
    (BASELINE.md accuracy configs name "ResNet/MobileNet-class")."""

    num_classes: int
    qconfig: QConfig
    # (expand, features, repeats, stride) per stage — a slim CIFAR variant
    stages: Sequence[Tuple[int, int, int, int]] = (
        (1, 16, 1, 1), (6, 24, 2, 1), (6, 32, 2, 2), (6, 64, 2, 2))
    stem_width: int = 32
    head_width: int = 256

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        x = QuantConv(self.stem_width, (3, 3), self.qconfig, use_bias=False,
                      name="stem")(x, training=training)
        x = nn.BatchNorm(use_running_average=not training, name="bn_stem")(x)
        x = nn.relu6(x)
        for si, (e, f, r, s) in enumerate(self.stages):
            for bi in range(r):
                x = InvertedResidual(
                    f, self.qconfig, strides=s if bi == 0 else 1, expand=e,
                    name=f"stage{si}_block{bi}")(x, training=training)
        x = QuantConv(self.head_width, (1, 1), self.qconfig, use_bias=False,
                      name="head_conv")(x, training=training)
        x = nn.BatchNorm(use_running_average=not training, name="bn_head")(x)
        x = nn.relu6(x)
        x = jnp.mean(x, axis=(1, 2))
        return QuantDense(self.num_classes, self.qconfig,
                          name="classifier")(x, training=training)


def mobilenetv2_cifar(num_classes: int, qconfig: QConfig) -> QuantMobileNetV2:
    return QuantMobileNetV2(num_classes=num_classes, qconfig=qconfig)


def _rope(x, pos, base: float = 10000.0):
    """Rotary position embedding over the head dim (half-split layout).

    x: (B, H, t, hd); pos: (t,) shared positions or (B, t) per-slot
    positions (continuous batching).  k is stored ROTATED in the KV cache —
    each key rotated by its own absolute write position — so the QK dot
    yields relative-position attention with no extra decode-time work."""
    hd = x.shape[-1]
    half = hd // 2
    inv = 1.0 / (base ** (jnp.arange(half, dtype=jnp.float32) / half))
    ang = pos.astype(jnp.float32)[..., None] * inv     # (t, half)|(B, t, half)
    if ang.ndim == 2:
        ang = ang[None]                                 # (1, t, half)
    cos = jnp.cos(ang)[:, None]                         # (B|1, 1, t, half)
    sin = jnp.sin(ang)[:, None]
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([x1 * cos - x2 * sin,
                            x1 * sin + x2 * cos], -1).astype(x.dtype)


class QuantTransformerBlock(nn.Module):
    """Pre-LN transformer block with every matmul LSQ-quantized (QKV/out
    projections + MLP).  The block whose dense layers the INT8/INT4 serving
    path accelerates — "tokens/s" in BASELINE.json means these matmuls.

    Autoregressive serving: pass ``kv_cache=(k, v)`` (shape (B, H, L, hd))
    and a traced ``cache_index`` to run prefill (t = prompt length) or decode
    (t = 1) against the cache.  The new keys/values are written with
    ``lax.dynamic_update_slice`` (static shapes — one compiled program serves
    every position) and the call returns ``(x, (k, v))``.

    INT8 KV cache: when a cache entry is a ``(data int8 (B, H, L, hd),
    scale f32 (B, H, L))`` pair (from ``init_kv_cache(dtype=jnp.int8)``),
    keys/values are quantized symmetrically PER ROW (per (b, h, position)
    abs-max over head_dim) on write, and dequantization folds into the
    attention dots for free: the per-key-position scale multiplies the
    (B, H, q, kpos) score matrix after the QK dot, and the value scale
    multiplies the softmax weights BEFORE the AV dot — so the int8 arrays
    stream at 1/4 (vs f32) or 1/2 (vs bf16) the cache bandwidth and no
    dequantized copy ever exists in HBM.  An INT4 layout halves that again:
    ``(data uint8 (B, H, L, hd // 2), scale f32 (B, H, L))`` from
    ``init_kv_cache(dtype=jnp.int4)`` — the same per-row symmetric scheme
    clipped to [-7, 7] with two values nibble-packed per byte, unpacked in
    registers (i32 shifts) inside the dots.  Extends the framework's
    weight-quantization thesis to the decode-time cache stream (the
    reference has no serving runtime to compare — SURVEY.md §5).

    GROUPED-QUERY ATTENTION (``num_kv_heads < num_heads``): k/v are
    projected to ``num_kv_heads`` heads shared by groups of
    ``num_heads/num_kv_heads`` query heads — the cache (and its decode-time
    stream) shrinks by the same ratio, composing with the int8 cache.  The
    dots run GROUPED (5-D einsums with q reshaped (B, KVH, G, t, hd)) so no
    repeated k/v copy is materialized.  ``num_kv_heads=None`` (default) is
    exact MHA — same parameters, same numerics as before (the q|k|v column
    split of the fused projection is layout-identical).
    """

    dim: int
    num_heads: int
    qconfig: QConfig
    mlp_ratio: int = 4
    num_kv_heads: Optional[int] = None
    rope: bool = False  # rotary position embeddings on q/k
    # Decode-attention implementation for the kv_cache branch:
    #   'xla'    — the inline einsum formulation below (bit-exact default);
    #   'pallas' — serve/attention.py's fused flash-decoding kernel (one
    #              cache pass, online softmax, in-kernel int8/int4 dequant);
    #   'auto'   — pallas on TPU for decode-shaped calls (t <= 8) over
    #              cache-bound lengths (max_len >= 1024), xla otherwise
    #              (prefill's big matmuls and short caches belong to XLA).
    # Prefill (no cache) and training always use the einsum path.
    attn_impl: str = "xla"
    # Sliding-window attention (Mistral-style): each query attends only to
    # its last `attn_window` keys (positions in (qpos-W, qpos]); None = full
    # causal prefix.  Applies identically in training, prefill, and decode,
    # so QAT and serving see the same attention pattern.  With the paged
    # engine, pages that slide out of every query's window can be freed.
    attn_window: Optional[int] = None
    # TRAINING-path attention (the no-cache branch):
    #   'xla'   — the inline einsum below (default; materializes (B, H, t, t)
    #             score tensors — fastest on v5e up to at least t=4096);
    #   'flash' — the flat-score-memory long-context path: the upstream
    #             fused Pallas flash-attention kernel (fwd+bwd custom_vjp,
    #             O(t) scores) for full-causal attention, or the banded
    #             chunked-einsum formulation (O(t·W) scores) when a sliding
    #             window < t is set.  Measured d512 depth2 B·t=8192 on v5e:
    #             1.7x/3.3x less temp memory at t=2048/4096 for a 13-19%
    #             step-time cost (docs/measurements/flash_train_tpu.json);
    #             switch when the einsum's scores stop fitting.  GQA
    #             supported (kv heads repeated — scores dominate memory);
    #             interpret mode off-TPU keeps CPU tests green.
    train_attn_impl: str = "xla"
    # MoE MLP (models/moe.py): replaces the dense 2-layer MLP with top-k
    # routed quantized experts; the block's residual absorbs capacity drops
    moe_experts: Optional[int] = None
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25

    @nn.compact
    def __call__(self, x, *, training: bool = False,
                 kv_cache=None, cache_index=None):
        b, t, d = x.shape
        h = self.num_heads
        hd = d // h
        if self.attn_window is not None and self.attn_window < 1:
            raise ValueError(f"attn_window must be >= 1 or None, got "
                             f"{self.attn_window}")
        kvh = self.num_kv_heads or h
        if h % kvh:
            raise ValueError(f"num_heads {h} not divisible by num_kv_heads "
                             f"{kvh}")
        g = h // kvh

        y = nn.LayerNorm(name="ln1")(x)
        # fused projection: columns [q | k | v].  For kvh == h this is the
        # historical 3d-wide "qkv" dense with an identical column layout
        # (reshape(b, t, 3, h, hd) splits the SAME contiguous thirds).
        qkv = QuantDense(d + 2 * kvh * hd, self.qconfig,
                         name="qkv")(y, training=training)
        q = qkv[..., :d].reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        k = qkv[..., d:d + kvh * hd].reshape(b, t, kvh, hd).transpose(
            0, 2, 1, 3)
        v = qkv[..., d + kvh * hd:].reshape(b, t, kvh, hd).transpose(
            0, 2, 1, 3)
        if self.rope:
            if kv_cache is None:
                rpos = jnp.arange(t)
            else:
                ridx = jnp.asarray(cache_index, jnp.int32)
                rpos = (ridx + jnp.arange(t) if ridx.ndim == 0
                        else ridx[:, None] + jnp.arange(t))
            q = _rope(q, rpos)
            k = _rope(k, rpos)
        new_kv = None
        if kv_cache is None:
            if self.train_attn_impl not in ("xla", "flash"):
                raise ValueError(
                    f"train_attn_impl must be 'xla' or 'flash', "
                    f"got {self.train_attn_impl!r}")
            if self.train_attn_impl == "flash":
                # 'flash' = the flat-score-memory long-context path.  With a
                # sliding window (< t) it runs the banded chunked-einsum
                # formulation (O(t*W) scores — the window IS the flatness);
                # otherwise the upstream fused Pallas kernel (O(t) scores).
                # Both support GQA (see the helpers).  VERDICT r3 next-#6.
                if self.attn_window is not None and self.attn_window < t:
                    y = _banded_train_attention(q, k, v, hd,
                                                self.attn_window)
                else:
                    y = _flash_train_attention(q, k, v, hd)
            else:
                mask = jnp.tril(jnp.ones((t, t), bool))
                if self.attn_window is not None:  # drop out-of-window keys
                    span = (jnp.arange(t)[:, None] - jnp.arange(t)[None, :])
                    mask = mask & (span < self.attn_window)
                if g == 1:
                    att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
                        float(hd))
                    att = jnp.where(mask, att, -1e9)
                    att = jax.nn.softmax(att, axis=-1)
                    y = jnp.einsum("bhqk,bhkd->bhqd", att, v)
                else:
                    q5 = q.reshape(b, kvh, g, t, hd)
                    att = jnp.einsum("bkgqd,bkld->bkgql", q5, k) / jnp.sqrt(
                        float(hd))
                    att = jnp.where(mask[None, None, None], att, -1e9)
                    att = jax.nn.softmax(att, axis=-1)
                    y = jnp.einsum("bkgql,bkld->bkgqd", att, v).reshape(
                        b, h, t, hd)
        else:
            y, new_kv = _cached_attention(q, k, v, kv_cache, cache_index,
                                          self.attn_impl, self.attn_window)
        y = y.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + QuantDense(d, self.qconfig, name="proj")(y, training=training)

        y = nn.LayerNorm(name="ln2")(x)
        if self.moe_experts:
            from .moe import QuantMoE
            y = QuantMoE(hidden=self.mlp_ratio * d,
                         num_experts=self.moe_experts,
                         qconfig=self.qconfig, top_k=self.moe_top_k,
                         capacity_factor=self.moe_capacity_factor,
                         name="moe")(y, training=training)
        else:
            y = QuantDense(self.mlp_ratio * d, self.qconfig,
                           name="mlp_up")(y, training=training)
            y = nn.gelu(y)
            y = QuantDense(d, self.qconfig, name="mlp_down")(y,
                                                             training=training)
        out = x + y
        if kv_cache is None:
            return out
        return out, new_kv


def _banded_train_attention(q, k, v, hd, window):
    """Sliding-window training attention with FLAT score memory: keys are
    chunked into window-sized blocks and each query block attends only its
    own and the previous block — with block size == window, every key in
    (qpos - W, qpos] lives in exactly those two blocks, so the band covers
    the sliding-window mask exactly.  Score memory is (B, H, t/W, W, 2W) =
    2·t·W per head instead of the einsum path's t² — the windowed
    long-context QAT answer (the upstream flash kernel has no window
    support).  Pure einsums: XLA autodiff gives the backward, the MXU gets
    (W, 2W) tiles, GQA folds in by repeating kv heads (scores dominate the
    memory, so the repeat does not change the asymptotics).  Same semantics
    as the einsum mask `kpos <= qpos & qpos - kpos < W` — pinned in
    tests/test_flash_train.py."""
    b, h, t, _ = q.shape
    kvh = k.shape[1]
    if kvh != h:  # GQA: each query head attends its group's kv head
        k = jnp.repeat(k, h // kvh, axis=1)
        v = jnp.repeat(v, h // kvh, axis=1)
    W = int(window)
    nb = -(-t // W)
    pt = nb * W
    if pt != t:
        pad = [(0, 0), (0, 0), (0, pt - t), (0, 0)]
        q, k, v = (jnp.pad(a, pad) for a in (q, k, v))
        # padded KEYS are only reachable from padded queries (kpos <= qpos
        # and every real qpos < t), and padded queries' outputs are sliced
        # away below, so no extra masking is needed
    qb = q.reshape(b, h, nb, W, hd)
    kb = k.reshape(b, h, nb, W, hd)
    vb = v.reshape(b, h, nb, W, hd)

    def with_prev(x):  # (B, H, nb, 2W, hd): [block i-1 | block i]
        prev = jnp.pad(x[:, :, :-1], [(0, 0), (0, 0), (1, 0), (0, 0),
                                      (0, 0)])
        return jnp.concatenate([prev, x], axis=3)

    k2, v2 = with_prev(kb), with_prev(vb)
    att = jnp.einsum("bhnqd,bhnkd->bhnqk", qb, k2) / jnp.sqrt(float(hd))
    qpos = jnp.arange(W)[:, None]                  # within-block query pos
    kpos = jnp.arange(2 * W)[None, :] - W          # relative to block start
    # global: qpos_g = i*W + q, kpos_g = i*W + (k - W); the difference
    # qpos_g - kpos_g = q - (k - W) is block-independent, and kpos_g >= 0
    # only needs checking for block 0 (the zero-padded 'previous' block)
    diff = qpos - kpos
    ok = (diff >= 0) & (diff < W)
    ok = ok[None] & (jnp.arange(nb)[:, None, None] * W + kpos[None] >= 0)
    att = jnp.where(ok[None, None], att, -1e9)
    att = jax.nn.softmax(att, axis=-1)
    y = jnp.einsum("bhnqk,bhnkd->bhnqd", att, v2).reshape(b, h, pt, hd)
    return y[:, :, :t] if pt != t else y


def _flash_train_attention(q, k, v, hd):
    """Training-path causal attention via the UPSTREAM fused Pallas
    flash-attention kernel (fwd + bwd `custom_vjp`,
    jax.experimental.pallas.ops.tpu.flash_attention) — O(t) score memory
    instead of the einsum path's (B, H, t, t) materialization, for
    long-context QAT.  Off-TPU the kernel runs in TPU-interpret mode so the
    CPU test suite exercises the same program.  Same causal semantics as
    the einsum mask (strict lower-triangular + diagonal); agreement pinned
    at f32 tolerance in tests/test_flash_train.py.  GQA folds in by
    repeating kv heads to the query head count (exact: each query head
    attends its group's kv head; the t² → t score-memory win is what
    'flash' exists for, and the repeated K/V is O(t))."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention)

    if k.shape[1] != q.shape[1]:
        g = q.shape[1] // k.shape[1]
        k = jnp.repeat(k, g, axis=1)
        v = jnp.repeat(v, g, axis=1)

    # The kernel needs t to cover its 128-row blocks; pad with zeros and
    # slice back.  Sound under causality: real queries (pos < t) never
    # attend padded keys (kpos <= qpos), padded queries' outputs are sliced
    # away, and their cotangents are zero in the backward.
    t = q.shape[2]
    pt = -(-t // 128) * 128
    if pt != t:
        pad = [(0, 0), (0, 0), (0, pt - t), (0, 0)]
        q, k, v = (jnp.pad(a, pad) for a in (q, k, v))

    sm = 1.0 / float(hd) ** 0.5
    if jax.default_backend() == "tpu":
        out = flash_attention(q, k, v, causal=True, sm_scale=sm)
    else:
        out = _flash_interpret(q, k, v, sm)
    return out[:, :, :t] if pt != t else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_interpret(q, k, v, sm):
    """Off-TPU wrapper of the upstream flash kernel in TPU-interpret mode.

    ``force_tpu_interpret_mode`` only covers pallas_calls TRACED inside the
    context — with the upstream custom_vjp the BACKWARD kernels are traced
    later, during the outer grad, so a context around the forward call is
    not enough (the bwd then hits "Only interpret mode is supported on CPU
    backend").  This custom_vjp re-enters the context inside BOTH rules,
    around the upstream fwd/bwd internals."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.experimental.pallas.ops.tpu import flash_attention as _fa

    with pltpu.force_tpu_interpret_mode():
        return _fa.flash_attention(q, k, v, causal=True, sm_scale=sm)


def _flash_interpret_fwd(q, k, v, sm):
    from jax.experimental.pallas import tpu as pltpu
    from jax.experimental.pallas.ops.tpu import flash_attention as _fa

    b, h, t, d = q.shape
    with pltpu.force_tpu_interpret_mode():
        out, res = _fa._flash_attention_fwd(
            q, k, v, None, None, save_residuals=False, causal=True,
            sm_scale=sm,
            block_sizes=_fa.BlockSizes.get_default(b, h, t, k.shape[2], d),
            debug=False)
    return out, res


def _flash_interpret_bwd(sm, res, do):
    from jax.experimental.pallas import tpu as pltpu
    from jax.experimental.pallas.ops.tpu import flash_attention as _fa

    q, k = res[0], res[1]
    b, h, t, d = q.shape
    with pltpu.force_tpu_interpret_mode():
        grads = _fa._flash_attention_bwd(
            False, True, sm,
            _fa.BlockSizes.get_default(b, h, t, k.shape[2], d),
            False, res, do)
    return grads[:3]


_flash_interpret.defvjp(_flash_interpret_fwd, _flash_interpret_bwd)


def _auto_uses_fused(t: int, max_len: int, int4_carrier: bool,
                     backend: str) -> bool:
    """The attn_impl='auto' gate, carrier-aware (see the measured table in
    _cached_attention and docs/measurements/paged_pagesize_inmodel_tpu.json):
    fused for decode-shaped calls (t <= 8) over cache-bound lengths
    (max_len >= 1024) — and at EVERY length for the int4 carrier, whose XLA
    unpack path never meaningfully wins."""
    return backend == "tpu" and t <= 8 and (max_len >= 1024 or int4_carrier)


def _cached_attention(q, k, v, kv_cache, cache_index, attn_impl,
                      attn_window=None):
    """Decode-path attention of fresh q/k/v against a cache entry, returning
    ``(y, new_cache_entry)``.  Dispatches on the entry's layout:

    * dense float array / (data, scales) quantized pair — write at
      ``cache_index`` then the einsum or fused-Pallas formulation;
    * :class:`jaxlsq.serve.paged.PagedKVLayer` — block-table paged pools:
      quantize-on-write scatter through the table + paged attention (XLA
      gather oracle or the scalar-prefetch Pallas kernel).
    """
    from ..serve.paged import PagedKVLayer, paged_attention, paged_update

    b, h, t, hd = q.shape
    kvh = k.shape[1]
    g = h // kvh
    if attn_impl not in ("xla", "pallas", "auto"):
        raise ValueError(f"attn_impl must be 'xla', 'pallas' or "
                         f"'auto', got {attn_impl!r}")
    if isinstance(kv_cache, PagedKVLayer):
        L = kv_cache.table.shape[1] * kv_cache.page_size
    else:
        ck0 = kv_cache[0]
        L = (ck0[0] if isinstance(ck0, (tuple, list)) else ck0).shape[2]
    # 'auto' is CARRIER-AWARE (VERDICT r3 next-#2).  The fused kernel wins
    # when decode is CACHE-BOUND — long caches, one HBM pass at carrier
    # width.  At short max_len each (batch, kv-head) program is one tiny
    # block with no DMA pipelining and XLA's batched einsum wins for float /
    # int8 carriers (measured B=8: int8 L=240 19.4k fused vs 55.0k xla;
    # L=512 19.4k vs 32.1k; L=2048 9.7k vs 8.4k — fused wins).  For the INT4
    # carrier the XLA path's nibble unpack materializes an f32 cache copy
    # and is never meaningfully faster (L=240: 18.3k fused vs 19.0k xla —
    # within noise; L=512: 17.3k vs 17.4k; L=2048: 8.2k vs 4.9k — fused
    # 1.66x), so int4 routes to the fused kernel at every length.
    if isinstance(kv_cache, PagedKVLayer):
        int4_carrier = kv_cache.int4
    else:
        lead = kv_cache[0]
        int4_carrier = (isinstance(lead, (tuple, list))
                        and lead[0].dtype == jnp.uint8)
    use_fused = (attn_impl == "pallas"
                 or (attn_impl == "auto"
                     and _auto_uses_fused(t, L, int4_carrier,
                                          jax.default_backend())))
    idx = jnp.asarray(cache_index, jnp.int32)

    if isinstance(kv_cache, PagedKVLayer):
        new_kv = paged_update(kv_cache, k, v, idx)
        y = paged_attention(q, new_kv, idx, window=attn_window,
                            impl="pallas" if use_fused else "xla")
        return y, new_kv

    # dense-cache path
    ck, cv = kv_cache
    quantized = isinstance(ck, (tuple, list))
    L = (ck[0] if quantized else ck).shape[2]

    def write(c, new, idx):
        """dynamic_update_slice into a (B, H, L, ...) cache array at
        position idx — scalar idx (shared position: prefill /
        lockstep decode) or per-slot (B,) idx (continuous batching;
        the vmapped update lowers to a per-slot scatter)."""
        new = new.astype(c.dtype)
        if idx.ndim == 0:
            return jax.lax.dynamic_update_slice(
                c, new, (0, 0, idx, 0)[: c.ndim])
        return jax.vmap(
            lambda cc, nn, i: jax.lax.dynamic_update_slice(
                cc, nn, (0, i, 0)[: cc.ndim]))(c, new, idx)

    if idx.ndim == 0:
        qpos = (idx + jnp.arange(t))[None, None, :, None]
    else:
        qpos = (idx[:, None] + jnp.arange(t))[:, None, :, None]
    kpos = jnp.arange(L)[None, None, None, :]
    if g > 1:  # grouped dots carry an extra group dim before t
        qpos = qpos[:, :, None]
        kpos = kpos[:, :, None]
    ok = kpos <= qpos
    if attn_window is not None:  # sliding window: only the last W keys
        ok = ok & (kpos > qpos - attn_window)

    # NOTE: the g == 1 (MHA) and g > 1 (GQA) dot bodies are kept as
    # separate einsums ON PURPOSE: the 4-D MHA form is the
    # benchmarked decode hot path, and funneling it through the 5-D
    # grouped form with g = 1 would hand XLA a different contraction
    # to lower (and shift bit-exact decode parities).  Keep edits to
    # the mask/softmax/scale sequence mirrored across the branches.
    if quantized:
        int4 = ck[0].dtype == jnp.uint8  # nibble-packed layout

        def q8(a):  # per-(b, h, position) symmetric int8
            s = jnp.max(jnp.abs(a), axis=-1) / 127.0
            s = jnp.maximum(s, jnp.finfo(jnp.float32).tiny)
            data = jnp.clip(jnp.round(a / s[..., None]), -127, 127)
            return data.astype(jnp.int8), s.astype(jnp.float32)

        def q4(a):  # same scheme at 4 bits, two values per byte
            s = jnp.max(jnp.abs(a), axis=-1) / 7.0
            s = jnp.maximum(s, jnp.finfo(jnp.float32).tiny)
            data = jnp.clip(jnp.round(a / s[..., None]),
                            -7, 7).astype(jnp.int32)
            n = data & 0xF  # two's-complement nibbles
            packed = (n[..., 0::2] | (n[..., 1::2] << 4))
            return packed.astype(jnp.uint8), s.astype(jnp.float32)

        def unpack4(p, dt):
            """uint8 nibble pairs -> the original values, computed
            in i32 (int8 vector shifts don't legalize on v5e)."""
            b32 = p.astype(jnp.int32)
            lo = ((b32 & 0xF) ^ 8) - 8  # sign-extend low nibble
            hi = ((b32 >> 4) ^ 8) - 8
            full = jnp.stack([lo, hi], axis=-1)
            return full.reshape(*p.shape[:-1],
                                2 * p.shape[-1]).astype(dt)

        kq, ks = (q4 if int4 else q8)(k)
        vq, vs = (q4 if int4 else q8)(v)
        ckd = write(ck[0], kq, idx)
        cks = write(ck[1], ks, idx)
        cvd = write(cv[0], vq, idx)
        cvs = write(cv[1], vs, idx)
        if use_fused:
            from ..serve.attention import decode_attention
            y = decode_attention(q, (ckd, cks), (cvd, cvs), idx,
                                 window=attn_window)
        else:
            ckf = (unpack4(ckd, q.dtype) if int4
                   else ckd.astype(q.dtype))
            cvf = (unpack4(cvd, q.dtype) if int4
                   else cvd.astype(q.dtype))
            # dequant folds into the dots: per-KEY-position scales
            # hit the score matrix after QK, and the value scales
            # hit the softmax weights BEFORE AV
            if g == 1:
                att = (jnp.einsum("bhqd,bhkd->bhqk", q, ckf)
                       * cks.astype(q.dtype)[:, :, None, :]
                       / jnp.sqrt(float(hd)))
                att = jnp.where(ok, att, -1e9)
                att = jax.nn.softmax(att, axis=-1)
                y = jnp.einsum(
                    "bhqk,bhkd->bhqd",
                    att * cvs.astype(q.dtype)[:, :, None, :], cvf)
            else:
                q5 = q.reshape(b, kvh, g, t, hd)
                att = (jnp.einsum("bkgqd,bkld->bkgql", q5, ckf)
                       * cks.astype(q.dtype)[:, :, None, None, :]
                       / jnp.sqrt(float(hd)))
                att = jnp.where(ok, att, -1e9)
                att = jax.nn.softmax(att, axis=-1)
                y = jnp.einsum(
                    "bkgql,bkld->bkgqd",
                    att * cvs.astype(q.dtype)[:, :, None, None, :],
                    cvf).reshape(b, h, t, hd)
        new_kv = ((ckd, cks), (cvd, cvs))
    else:
        ck = write(ck, k, idx)
        cv = write(cv, v, idx)
        if use_fused:
            from ..serve.attention import decode_attention
            y = decode_attention(q, ck, cv, idx, window=attn_window)
        elif g == 1:
            att = (jnp.einsum("bhqd,bhkd->bhqk", q,
                              ck.astype(q.dtype))
                   / jnp.sqrt(float(hd)))
            att = jnp.where(ok, att, -1e9)
            att = jax.nn.softmax(att, axis=-1)
            y = jnp.einsum("bhqk,bhkd->bhqd", att,
                           cv.astype(q.dtype))
        else:
            q5 = q.reshape(b, kvh, g, t, hd)
            att = (jnp.einsum("bkgqd,bkld->bkgql", q5,
                              ck.astype(q.dtype))
                   / jnp.sqrt(float(hd)))
            att = jnp.where(ok, att, -1e9)
            att = jax.nn.softmax(att, axis=-1)
            y = jnp.einsum("bkgql,bkld->bkgqd", att,
                           cv.astype(q.dtype)).reshape(b, h, t, hd)
        new_kv = (ck, cv)
    return y, new_kv


class QuantTransformerLM(nn.Module):
    """Tiny causal LM: embedding → N quantized blocks → tied-free LM head.
    Demonstrates QAT + serving on an autoregressive (tokens/s) workload.

    Decode mode: pass ``cache`` (a tuple of per-layer (k, v) pairs from
    ``jaxlsq.serve.decode.init_kv_cache``) and ``cache_index``; returns
    ``(logits, new_cache)``.  One compiled program covers every decode
    position (static shapes, traced index)."""

    vocab: int
    dim: int
    depth: int
    num_heads: int
    qconfig: QConfig
    max_len: int = 256
    num_kv_heads: Optional[int] = None  # < num_heads ⇒ grouped-query attn
    pos_embedding: str = "learned"      # 'learned' | 'rope'
    attn_impl: str = "xla"              # decode attention: 'xla'|'pallas'|'auto'
    attn_window: Optional[int] = None   # sliding-window attention (last W keys)
    train_attn_impl: str = "xla"        # training attention: 'xla'|'flash'
    moe_experts: Optional[int] = None   # set ⇒ MoE MLPs (models/moe.py)
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25

    @nn.compact
    def __call__(self, tokens, *, training: bool = False,
                 cache=None, cache_index=None):
        b, t = tokens.shape
        if self.pos_embedding not in ("learned", "rope"):
            raise ValueError(f"pos_embedding must be 'learned' or 'rope', "
                             f"got {self.pos_embedding!r}")
        rope = self.pos_embedding == "rope"
        tok = QuantEmbed(self.vocab, self.dim, self.qconfig,
                         name="tok_emb")(tokens, training=training)
        if rope:
            x = tok  # positions enter via in-block rotary q/k rotation
        else:
            pos = self.param("pos_emb", nn.initializers.normal(0.02),
                             (self.max_len, self.dim))
            if cache is None:
                x = tok + pos[None, :t]
            else:
                idx = jnp.asarray(cache_index, jnp.int32)
                if idx.ndim == 0:
                    x = tok + jax.lax.dynamic_slice_in_dim(pos, idx, t,
                                                           0)[None]
                else:  # per-slot (B,) → gather a (B, t, dim) pos slice
                    positions = idx[:, None] + jnp.arange(t)[None, :]
                    x = tok + jnp.take(pos, positions, axis=0)
        new_cache = []
        for i in range(self.depth):
            block = QuantTransformerBlock(
                self.dim, self.num_heads, self.qconfig,
                num_kv_heads=self.num_kv_heads, rope=rope,
                moe_experts=self.moe_experts, moe_top_k=self.moe_top_k,
                moe_capacity_factor=self.moe_capacity_factor,
                attn_impl=self.attn_impl, attn_window=self.attn_window,
                train_attn_impl=self.train_attn_impl, name=f"block{i}")
            if cache is None:
                x = block(x, training=training)
            else:
                x, kv = block(x, training=training,
                              kv_cache=cache[i], cache_index=cache_index)
                new_cache.append(kv)
        x = nn.LayerNorm(name="ln_f")(x)
        logits = QuantDense(self.vocab, self.qconfig, use_bias=False,
                            name="lm_head")(x, training=training)
        if cache is None:
            return logits
        return logits, tuple(new_cache)
