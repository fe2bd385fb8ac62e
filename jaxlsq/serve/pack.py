"""Weight quantization + packing for the INT8/INT4 serving path.

The serving handoff seam of the reference is ``calculate_qparams()`` →
``torch.quantization.convert`` (observers.py:403-422; SURVEY.md §3.4): the
learned (scale, shift) become (scale, zero_point) and PyTorch builds
qint8/quint8 kernels.  Here the same fold produces a :class:`PackedWeight`
pytree — integer carrier data + per-channel qparams — consumed by the
weight-only matmul kernels in jaxlsq/serve/matmul.py.

Packing formats:

* ``int8``: one int8 per element (carrier = jnp.int8).
* ``int4``: two 4-bit values per int8 byte, packed along the contraction
  (K) axis in a SPLIT-HALF layout: element ``k``     of the logical tensor
  lives in the LOW  nibble of byte ``k``       for ``k <  K/2`` and in the
  HIGH nibble of byte ``k - K/2`` otherwise.  Split-half (rather than
  even/odd interleave) lets the Pallas kernel unpack a byte tile into two
  k-tiles with pure elementwise shifts — no cross-sublane shuffle
  (see matmul._wo4_kernel).

Quantization math matches the QAT fake-quant exactly (lsq_kernel.h:6-14):
``w_q = round(clamp(w/s + zp, qmin, qmax))`` with
``zp = round(clamp(-shift/s, tmin, tmax))`` and eps-clamped ``s`` — so
``dequant(pack(w)) == fake_quant(w)`` bit-for-bit, which is the property the
serving tests assert.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.golden import broadcast_qparams, clamp_scale
from ..core.spec import QuantSpec

__all__ = ["PackedWeight", "quantize_weight", "quantize_weight_grouped",
           "dequantize_weight", "pack_int4", "unpack_int4"]


class PackedWeight(struct.PyTreeNode):
    """Quantized serving weight: integer data + qparams.

    Fields:
      data: int8 carrier.  For ``bits=8`` this is the quantized tensor; for
        ``bits=4`` the contraction axis is halved by nibble packing.
      scale: (C,) f32 per-channel (or (1,) per-tensor) step size.
      zero_point: (C,) or (1,) i32 — ``round(clamp(-shift/s, tmin, tmax))``.
      bits / axis / k_axis / orig_shape: static packing metadata.
        ``axis`` is the per-channel (output-feature) axis of the ORIGINAL
        tensor; ``k_axis`` the contraction axis along which int4 packs.
    """

    data: jnp.ndarray
    scale: jnp.ndarray
    zero_point: jnp.ndarray
    bits: int = struct.field(pytree_node=False, default=8)
    axis: int = struct.field(pytree_node=False, default=1)
    k_axis: int = struct.field(pytree_node=False, default=0)
    orig_shape: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    # group-wise scales (quantize_weight_grouped): scale is (K/group_size, N)
    # — one symmetric step size per (K-group, output channel); zero_point ≡ 0
    group_size: Optional[int] = struct.field(pytree_node=False, default=None)


def pack_int4(q: jnp.ndarray, k_axis: int) -> jnp.ndarray:
    """Pack int8-held 4-bit values two-per-byte along ``k_axis`` (split-half).

    ``q`` values must lie in [-8, 7].  Odd ``k`` is zero-padded by one row
    (zeros contribute nothing to a contraction; consumers slice back to the
    logical size via ``orig_shape`` — e.g. an RGB stem conv's in-axis of 3).
    """
    k = q.shape[k_axis]
    if k % 2:
        pad = [(0, 0)] * q.ndim
        pad[k_axis] = (0, 1)
        q = jnp.pad(q, pad)
        k += 1
    lo = jax.lax.slice_in_dim(q, 0, k // 2, axis=k_axis)
    hi = jax.lax.slice_in_dim(q, k // 2, k, axis=k_axis)
    # low nibble: first half; high nibble: second half (sign lives in bit 7)
    return ((lo & 0x0F) | (hi << 4)).astype(jnp.int8)


def unpack_int4(p: jnp.ndarray, k_axis: int) -> jnp.ndarray:
    """Inverse of :func:`pack_int4` (sign-extending both nibbles)."""
    # sign-extend the low nibble: shift up, arithmetic shift down
    lo = (p << 4) >> 4
    hi = p >> 4  # arithmetic on int8 → sign-extended
    return jnp.concatenate([lo, hi], axis=k_axis).astype(jnp.int8)


def _fold_qparams(scale: jnp.ndarray, shift: jnp.ndarray, spec: QuantSpec
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(scale, shift) → (eps-clamped scale, int zero_point), the
    ``calculate_qparams`` fold (observers.py:403-422, :378-401)."""
    s = clamp_scale(scale, jnp.float32)
    zp = jnp.round(jnp.clip(-shift.astype(jnp.float32) / s,
                            spec.type_min, spec.type_max)).astype(jnp.int32)
    return s, zp


def quantize_weight(w: jnp.ndarray, scale: jnp.ndarray, shift: jnp.ndarray,
                    spec: QuantSpec, *, bits: Optional[int] = None,
                    k_axis: Optional[int] = None) -> PackedWeight:
    """Quantize + pack a trained weight with its learned LSQ qparams.

    Args:
      w: the float weight (dense: (K, N); conv: (kh, kw, in, out)).
      scale, shift: learned qparams, shape (1,) or (C,) along ``spec.axis``.
      spec: the weight QuantSpec used during QAT.
      bits: carrier width, 8 or 4; defaults to 4 when the spec's quant range
        fits the SIGNED int4 carrier [-8, 7] (matching ``convert.serving_bits``
        — unsigned 4-bit ranges like [0, 15] fall back to int8 rather than
        erroring), else 8.
      k_axis: contraction axis for int4 packing (dense: 0; conv: pass the
        flattened-input axis — convs are packed at 8 bit by default).
    """
    if bits is None:
        bits = 4 if (-8 <= spec.quant_min and spec.quant_max <= 7) else 8
    if bits not in (8, 4):
        raise ValueError(f"bits must be 8 or 4, got {bits}")
    if bits == 4 and not (-8 <= spec.quant_min and spec.quant_max <= 7):
        raise ValueError(
            f"quant range [{spec.quant_min},{spec.quant_max}] does not fit the "
            "int4 carrier; train with QuantSpec.make(4, signed=True)")
    if k_axis is None:
        k_axis = 0 if w.ndim == 2 else w.ndim - 2

    s, zp = _fold_qparams(scale, shift, spec)
    sb = broadcast_qparams(s, w.ndim, spec.axis) if spec.per_channel else s
    zb = (broadcast_qparams(zp, w.ndim, spec.axis).astype(jnp.float32)
          if spec.per_channel else zp.astype(jnp.float32))
    q = jnp.round(jnp.clip(w.astype(jnp.float32) / sb + zb,
                           spec.quant_min, spec.quant_max)).astype(jnp.int8)
    data = pack_int4(q, k_axis) if bits == 4 else q
    return PackedWeight(data=data, scale=s, zero_point=zp, bits=bits,
                        axis=spec.axis, k_axis=k_axis, orig_shape=w.shape)


def quantize_weight_grouped(w: jnp.ndarray, *, group_size: int,
                            bits: int = 4) -> PackedWeight:
    """Group-wise symmetric weight quantization for the serving path.

    The per-channel step the reference's convert seam produces (one scale per
    output channel, observers.py:403-422) is the accuracy bottleneck of 4-bit
    serving: one outlier anywhere in a channel's K inputs inflates that whole
    channel's step.  The standard production fix (AWQ/GPTQ-style W4 serving)
    is finer granularity along the CONTRACTION axis: one abs-max-derived
    symmetric scale per (K-group, channel)::

        s[g, n] = max_{k in group g} |w[k, n]| / (2^(bits-1) - 1)
        q[k, n] = round(w[k, n] / s[k // group_size, n])      # in [-7, 7]

    This is a CONVERT-TIME re-quantization from the float weights (the
    learned LSQ scale is per-channel and is superseded; per-channel equals
    ``group_size == K``).  Finer groups monotonically improve weight
    reconstruction — pinned in tests/test_groupwise.py.

    Only the dense (K, N) layout groups (the LLM serving case); zero_point
    is identically 0 (symmetric).  Consumed by ``wo_matmul`` — the Pallas
    int4 kernel applies the (1, bn) group-scale row per K-step, the XLA path
    dequantizes via the repeat in :func:`dequantize_weight`.
    """
    if w.ndim != 2:
        raise ValueError("grouped quantization needs a 2-D (K, N) weight; "
                         f"got shape {w.shape}")
    if bits not in (8, 4):
        raise ValueError(f"bits must be 8 or 4, got {bits}")
    K, N = w.shape
    if group_size < 1 or K % group_size:
        raise ValueError(
            f"group_size {group_size} must divide the contraction dim {K}")
    qmax = float(2 ** (bits - 1) - 1)  # 7 or 127, symmetric ±qmax
    wf = w.astype(jnp.float32)
    gshape = (K // group_size, group_size, N)
    s = jnp.max(jnp.abs(wf.reshape(gshape)), axis=1) / qmax    # (G, N)
    s = jnp.maximum(s, jnp.finfo(jnp.float32).eps)
    q = jnp.round(jnp.clip(wf / jnp.repeat(s, group_size, axis=0),
                           -qmax, qmax)).astype(jnp.int8)
    data = pack_int4(q, 0) if bits == 4 else q
    return PackedWeight(data=data, scale=s,
                        zero_point=jnp.zeros((1,), jnp.int32), bits=bits,
                        axis=1, k_axis=0, orig_shape=w.shape,
                        group_size=int(group_size))


def dequantize_weight(p: PackedWeight, dtype=jnp.float32) -> jnp.ndarray:
    """Reference dequant: ``(w_q - zp) * s`` (lsq_kernel.h:12-13).  The XLA
    serving fallback and the oracle for the fused Pallas epilogue."""
    q = unpack_int4(p.data, p.k_axis) if p.bits == 4 else p.data
    if p.orig_shape and q.shape[p.k_axis] != p.orig_shape[p.k_axis]:
        # odd-K zero pad from pack_int4 — slice back to the logical size
        q = jax.lax.slice_in_dim(q, 0, p.orig_shape[p.k_axis], axis=p.k_axis)
    if p.group_size is not None:  # (G, N) → (K, N), symmetric (zp ≡ 0)
        s = jnp.repeat(p.scale, p.group_size, axis=0)
        return (q.astype(jnp.float32) * s).astype(dtype)
    ndim = len(p.orig_shape)
    per_channel = p.scale.shape[0] > 1 or p.scale.shape[0] == p.orig_shape[p.axis]
    if per_channel and p.scale.shape[0] == p.orig_shape[p.axis]:
        s = broadcast_qparams(p.scale, ndim, p.axis)
        z = broadcast_qparams(p.zero_point.astype(jnp.float32), ndim, p.axis)
    else:
        s, z = p.scale, p.zero_point.astype(jnp.float32)
    return ((q.astype(jnp.float32) - z) * s).astype(dtype)
