"""Fused Pallas decode-attention over the (optionally quantized) KV cache.

The decode hot loop is cache-bandwidth-bound: every generated token streams
the whole (B, KVH, L, hd) K and V arrays once.  The XLA einsum path in
``models/zoo.py::QuantTransformerBlock`` (the bit-exact default) expresses the
same math as five ops — dequant-convert, QK einsum, mask+softmax, scale
multiply, AV einsum — and leaves fusion to XLA, which on v5e materializes the
(B, H, t, L) score matrix and a dequantized value copy between them.  This
kernel is the flash-decoding formulation instead: ONE pass over the cache per
(batch, kv-head) program with an online softmax, so

* K and V tiles stream HBM→VMEM once, at int8/int4 width when the cache is
  quantized (the per-row scales fold into the score matrix and the softmax
  weights in VMEM — no dequantized copy anywhere),
* the (t, L) score tile lives only in VMEM scratch,
* masking, softmax, and both dots fuse into a single kernel.

Semantics match the einsum path exactly (same ``-1e9`` mask additive, same
scale placement: key scales AFTER the QK dot, value scales on the softmax
weights BEFORE the AV dot); the only numeric difference is the online-softmax
accumulation order (f32 throughout, tested to tight tolerance).

Grouped-query attention folds the ``g = H/KVH`` query heads of a kv head into
the kernel's row dimension — one program still reads its K/V tiles once.

The INT4 cache kernel never unpacks across lanes: the low/high nibble planes
of a packed byte tile hold the EVEN/ODD head-dim positions (zoo's ``q4``
layout), so the kernel dots the even/odd halves of q against each plane
separately (QK is permutation-invariant in the contracted dim) and emits the
two AV halves side by side; the caller re-interleaves the (tiny) output.
Same trick as ``matmul._wo4_kernel``'s split-half layout, adapted to the
cache's interleaved packing.

The reference has no serving/decode runtime (SURVEY.md §5); this extends the
north-star serving path (BASELINE.json tokens/s).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["decode_attention"]

_MASK = -1e9  # additive mask value; must match models/zoo.py's einsum path


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _resolve_interpret(interpret) -> bool:
    if interpret is None:
        return jax.default_backend() != "tpu"
    return bool(interpret)


def _attn_kernel(qpos_ref, *refs, nl: int, t: int, block_l: int,
                 length: int, scale: float, quantized: bool, int4: bool,
                 hd2: int, precision=None, window: Optional[int] = None,
                 nl_total: Optional[int] = None):
    """One (b, kv-head) program; grid dim 1 walks the cache length.

    Block shapes: q (1, gt, hq), k/v (1, block_l, hq), ks/vs (1, block_l),
    o (1, gt, hd) — hq = hd (int8/float) or hd/2-packed bytes (int4).
    Scratch: acc (gt, hd) f32, m/l (gt, 128) f32 (col 0 live, broadcast
    stored — lane-dim-1 scratch does not tile).

    BLOCK SKIPPING (``nl_total`` set, sliding windows): the grid runs only
    ``nl = ceil(window/block_l) + 1`` steps and an extra scalar-prefetch
    operand ``fb`` (first block per row, computed outside the kernel — the
    index maps and the kernel itself only add/min, never divide, per the
    Mosaic constraint) offsets every step: step j processes logical block
    ``min(fb + j, nl_total - 1)``.  Decode reads O(window), not O(length).
    Clamped duplicate steps (fb + j past the last block) are fully masked —
    they only occur AFTER real blocks, so the running max is already real
    and their p underflows to exactly 0.
    """
    j = pl.program_id(1)
    if nl_total is not None:  # windowed block skipping: fb prefetch leads
        fb_ref, *refs = refs
        fb = fb_ref[pl.program_id(0), 0]
        jb = jnp.minimum(fb + j, nl_total - 1)
        dup = (fb + j) > (nl_total - 1)
    else:
        jb, dup = j, None
    q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref, acc_ref, m_ref, l_ref = refs

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)

    gt = q_ref.shape[1]
    if int4:
        pi = k_ref[0].astype(jnp.int32)          # (Lb, hd2) packed bytes
        klo = ((pi << 28) >> 28).astype(jnp.float32)   # even head-dim lanes
        khi = ((pi << 24) >> 28).astype(jnp.float32)   # odd head-dim lanes
        qf = q_ref[0].astype(jnp.float32)        # (gt, hd) = [even | odd]
        s = jax.lax.dot_general(
            qf[:, :hd2], klo, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        s += jax.lax.dot_general(
            qf[:, hd2:], khi, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
    else:
        k = k_ref[0].astype(jnp.float32)         # (Lb, hd)
        s = jax.lax.dot_general(                 # (gt, Lb) = q @ k^T
            q_ref[0].astype(jnp.float32), k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
    if quantized:
        s = s * ks_ref[0]                        # per-key-position scales
    s = s * scale

    kpos = jb * block_l + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    tpos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) % t
    qp = qpos_ref[pl.program_id(0), 0]           # per-(b, kv-head) position
    valid = kpos <= qp + tpos                    # causal prefix mask
    if window is not None:                       # sliding window: last W keys
        valid = jnp.logical_and(valid, kpos > qp + tpos - window)
    if dup is not None:  # clamped duplicate step: contributes nothing
        valid = jnp.logical_and(valid, jnp.logical_not(dup))
    if length % block_l:                         # tail block: mask padding
        valid = jnp.logical_and(valid, kpos < length)
    s = jnp.where(valid, s, _MASK)

    # A FULLY-masked block (possible under a sliding window, when the whole
    # block slid out) yields m_new == _MASK and p == 1 everywhere — harmless:
    # the first block containing a real score rescales by
    # alpha = exp(_MASK - m_real) == 0, wiping the garbage from acc and l.
    # (Every row always has >= 1 valid key: kpos == qp.)
    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_ref[:] = jnp.broadcast_to(l_prev * alpha
                                + jnp.sum(p, axis=1, keepdims=True),
                                l_ref.shape)
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    if quantized:
        vsr = vs_ref[0]                          # (1, Lb)
        if length % block_l:  # tail-block scale lanes may hold garbage
            colok = (jb * block_l + jax.lax.broadcasted_iota(
                jnp.int32, vsr.shape, 1)) < length
            vsr = jnp.where(colok, vsr, 0.0)
        p = p * vsr                              # value scales BEFORE AV
    if int4:
        pv = v_ref[0].astype(jnp.int32)
        vlo = ((pv << 28) >> 28).astype(jnp.float32)
        vhi = ((pv << 24) >> 28).astype(jnp.float32)
        if length % block_l:  # out-of-bounds tiles may hold garbage
            rowok = (jb * block_l + jax.lax.broadcasted_iota(
                jnp.int32, vlo.shape, 0)) < length
            vlo = jnp.where(rowok, vlo, 0.0)
            vhi = jnp.where(rowok, vhi, 0.0)
        pd = jax.lax.dot(p, vlo, preferred_element_type=jnp.float32,
                         precision=precision)
        po = jax.lax.dot(p, vhi, preferred_element_type=jnp.float32,
                         precision=precision)
        acc_ref[:] = (acc_ref[:] * alpha
                      + jnp.concatenate([pd, po], axis=1))
    else:
        v = v_ref[0].astype(jnp.float32)
        if length % block_l:
            rowok = (jb * block_l + jax.lax.broadcasted_iota(
                jnp.int32, v.shape, 0)) < length
            v = jnp.where(rowok, v, 0.0)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot(
            p, v, preferred_element_type=jnp.float32, precision=precision)

    @pl.when(j == nl - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


def _pick_block_l(length: int, block_l: int, interpret: bool) -> int:
    """Cache-length block: the whole length when it fits ``block_l`` (any
    extent — full-array blocks satisfy Mosaic's trailing-dim rule; same for
    interpret mode, which has no tiling rules at all).  Otherwise the scale
    rows put the cache-length dim on the LANE axis, so compiled blocks must
    be 128-multiples: pick the largest 128-multiple divisor of ``length``
    not above ``block_l``, else fall back to a 128-multiple with the
    in-kernel tail mask."""
    if length <= block_l:
        return length
    if interpret:
        return block_l
    if length <= 128:
        return length
    cap = max(block_l - block_l % 128, 128)
    for b in range(cap, 127, -128):
        if length % b == 0:
            return b
    return cap


def decode_attention(q: jnp.ndarray, ck, cv, cache_index, *,
                     impl: str = "auto", block_l: Optional[int] = None,
                     precision=None, window: Optional[int] = None,
                     interpret: Optional[bool] = None) -> jnp.ndarray:
    """Causal attention of ``q`` against a full KV cache, fused.

    Args:
      q: (B, H, t, hd) queries (t = 1 decode, small for speculative verify).
        Already RoPE-rotated if the model uses rope.
      ck, cv: the UPDATED cache entries — a float array (B, KVH, L, hd), an
        int8 pair ``(data int8 (B, KVH, L, hd), scales f32 (B, KVH, L))``, or
        an int4 pair ``(data uint8 (B, KVH, L, hd//2), scales)`` in zoo's
        interleaved nibble layout.
      cache_index: scalar or (B,) int32 — position of q's FIRST token per
        slot; key positions ≤ cache_index + row are attended.
      impl: 'pallas' | 'xla' | 'auto' (pallas on TPU, xla elsewhere).  The
        xla path reproduces models/zoo.py's einsum formulation bit-for-bit
        (it is the same program) and serves as the oracle.
      window: sliding-window size — each query attends only to its last
        ``window`` keys (positions in (qpos - window, qpos]); None = full
        causal prefix.

    Returns (B, H, t, hd) in q's dtype.
    """
    b, h, t, hd = q.shape
    quantized = isinstance(ck, (tuple, list))
    kdata = ck[0] if quantized else ck
    int4 = quantized and kdata.dtype == jnp.uint8
    kvh = kdata.shape[1]
    length = kdata.shape[2]
    if h % kvh:
        raise ValueError(f"num_heads {h} not divisible by kv heads {kvh}")
    g = h // kvh
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return _decode_attention_xla(q, ck, cv, cache_index, window=window)

    idx = jnp.asarray(cache_index, jnp.int32)
    qpos = (jnp.broadcast_to(idx, (b,)) if idx.ndim == 0 else idx)
    # one row per (b, kv-head) program: keeps the SMEM index map a plain
    # identity (Mosaic rejects division in block index maps)
    qpos = jnp.repeat(qpos, kvh).reshape(b * kvh, 1)

    gt = g * t
    qr = q.reshape(b, kvh, gt, hd).reshape(b * kvh, gt, hd)
    if int4:
        hd2 = hd // 2
        # even|odd halves: QK contracts against the nibble planes directly
        qr = jnp.concatenate([qr[..., 0::2], qr[..., 1::2]], axis=-1)
    else:
        hd2 = hd
    bkv = b * kvh
    kd = kdata.reshape(bkv, length, kdata.shape[-1])
    vdata = cv[0] if quantized else cv
    vd = vdata.reshape(bkv, length, vdata.shape[-1])
    if quantized:
        # 3-D so the block's trailing dims are (1, bl) with the 1 covering
        # a full array dim (Mosaic's trailing-dim rule)
        ks = ck[1].astype(jnp.float32).reshape(bkv, 1, length)
        vs = cv[1].astype(jnp.float32).reshape(bkv, 1, length)
    else:  # dummies keep the arg list static (never read)
        ks = jnp.ones((1, 1, 1), jnp.float32)
        vs = ks

    interp = _resolve_interpret(interpret)
    explicit_bl = block_l is not None
    if block_l is None:
        # Auto default (r5 lab, examples/_int4_attn_lab.py): at decode the
        # kernel is per-grid-step latency-bound, not bandwidth-bound —
        # 2048-row blocks halve the grid steps and ran 1.25-1.5x faster in
        # every interleaved lab run for bf16/int8, and in 3 of 4 runs for
        # int4 (~1.4x; the one contrary run's int4@1024 number sat below
        # int8 at equal blocks — physically implausible given the unpack —
        # and was discarded as the outlier).
        block_l = 2048
    if window is not None and window < length:
        if explicit_bl:
            # caller-pinned blocks: cap at the window so the skip engages
            # (>=128 keeps the lane-dim scale blocks legal)
            block_l = min(block_l, max(128, window))
        else:
            # Engage block skipping only when it actually beats streaming
            # the full cache in large blocks.  The kernel is per-grid-step
            # latency-bound (r5 lab): at L=2048/w=256, two 256-row skip
            # steps LOSE to one full 2048-row step + mask (bench r5:
            # windowed-skip 0.86x of full).  Rule: walk window-sized blocks
            # only if that cuts walked bytes >=4x AND the full walk needs
            # >=2 grid steps; otherwise keep the big blocks — the window
            # mask below is applied either way, so this is purely a
            # schedule choice.
            blw = max(128, min(window, 1024))
            nskip = _cdiv(window, blw) + 1
            if nskip * blw * 4 <= length and _cdiv(length, block_l) >= 2:
                block_l = blw
    bl = _pick_block_l(length, block_l, interp)
    nl = _cdiv(length, bl)
    sblock = (1, 1, bl) if quantized else (1, 1, 1)
    scratch = [pltpu.VMEM((gt, hd), jnp.float32),
               pltpu.VMEM((gt, 128), jnp.float32),
               pltpu.VMEM((gt, 128), jnp.float32)]
    out_shape = jax.ShapeDtypeStruct((bkv, gt, hd), q.dtype)
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"))
    nsteps = nl if window is None else min(_cdiv(window, bl) + 1, nl)
    if window is not None and nsteps < nl:
        # BLOCK SKIPPING: only the window's blocks are walked — decode
        # streams O(window) cache bytes instead of O(length).  The first
        # block per row is precomputed in XLA (division is not allowed in
        # Mosaic index maps) and fed through scalar prefetch; the index maps
        # clamp past-the-end duplicates, which the kernel fully masks.
        fb = jnp.clip((qpos[:, :1] - (window - 1)) // bl, 0, nl - 1)
        fb = fb.astype(jnp.int32)
        kernel = functools.partial(
            _attn_kernel, nl=nsteps, t=t, block_l=bl, length=length,
            scale=1.0 / float(hd) ** 0.5, quantized=quantized, int4=int4,
            hd2=hd2, precision=precision, window=window, nl_total=nl)
        nlt = nl

        def kvi(i, j, qp, f):
            return (i, jnp.minimum(f[i, 0] + j, nlt - 1), 0)

        def si(i, j, qp, f):
            if not quantized:
                return (0, 0, 0)
            return (i, 0, jnp.minimum(f[i, 0] + j, nlt - 1))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bkv, nsteps),
            in_specs=[
                pl.BlockSpec((1, gt, hd), lambda i, j, qp, f: (i, 0, 0)),
                pl.BlockSpec((1, bl, kd.shape[-1]), kvi),
                pl.BlockSpec(sblock, si),
                pl.BlockSpec((1, bl, vd.shape[-1]), kvi),
                pl.BlockSpec(sblock, si),
            ],
            out_specs=pl.BlockSpec((1, gt, hd),
                                   lambda i, j, qp, f: (i, 0, 0)),
            scratch_shapes=scratch,
        )
        out = pl.pallas_call(
            kernel, out_shape=out_shape, grid_spec=grid_spec,
            compiler_params=params, interpret=interp,
        )(qpos, fb, qr, kd, ks, vd, vs)
    else:
        sindex = ((lambda i, j: (i, 0, j)) if quantized
                  else (lambda i, j: (0, 0, 0)))
        kernel = functools.partial(
            _attn_kernel, nl=nl, t=t, block_l=bl, length=length,
            scale=1.0 / float(hd) ** 0.5, quantized=quantized, int4=int4,
            hd2=hd2, precision=precision, window=window)
        out = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(bkv, nl),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # qpos (bkv, 1)
                pl.BlockSpec((1, gt, hd), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((1, bl, kd.shape[-1]), lambda i, j: (i, j, 0)),
                pl.BlockSpec(sblock, sindex),
                pl.BlockSpec((1, bl, vd.shape[-1]), lambda i, j: (i, j, 0)),
                pl.BlockSpec(sblock, sindex),
            ],
            out_specs=pl.BlockSpec((1, gt, hd), lambda i, j: (i, 0, 0)),
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interp,
        )(qpos, qr, kd, ks, vd, vs)

    if int4:  # re-interleave the even|odd AV halves
        out = jnp.stack([out[..., :hd2], out[..., hd2:]],
                        axis=-1).reshape(bkv, gt, hd)
    return out.reshape(b, kvh, gt, hd).reshape(b, h, t, hd)


def _decode_attention_xla(q, ck, cv, cache_index, window=None):
    """The einsum formulation — models/zoo.py's exact program, kept here as
    the oracle for the kernel and the CPU fallback."""
    b, h, t, hd = q.shape
    quantized = isinstance(ck, (tuple, list))
    kdata = ck[0] if quantized else ck
    int4 = quantized and kdata.dtype == jnp.uint8
    kvh = kdata.shape[1]
    length = kdata.shape[2]
    g = h // kvh
    idx = jnp.asarray(cache_index, jnp.int32)
    if idx.ndim == 0:
        qpos = (idx + jnp.arange(t))[None, None, :, None]
    else:
        qpos = (idx[:, None] + jnp.arange(t))[:, None, :, None]
    kpos = jnp.arange(length)[None, None, None, :]
    if g > 1:
        qpos = qpos[:, :, None]
        kpos = kpos[:, :, None]
    ok = kpos <= qpos
    if window is not None:  # sliding window: only the last `window` keys
        ok = ok & (kpos > qpos - window)

    def unpack4(p, dt):
        b32 = p.astype(jnp.int32)
        lo = ((b32 & 0xF) ^ 8) - 8
        hi = ((b32 >> 4) ^ 8) - 8
        full = jnp.stack([lo, hi], axis=-1)
        return full.reshape(*p.shape[:-1], 2 * p.shape[-1]).astype(dt)

    if quantized:
        ckf = unpack4(kdata, q.dtype) if int4 else kdata.astype(q.dtype)
        cvf = unpack4(cv[0], q.dtype) if int4 else cv[0].astype(q.dtype)
        cks, cvs = ck[1], cv[1]
        if g == 1:
            att = (jnp.einsum("bhqd,bhkd->bhqk", q, ckf)
                   * cks.astype(q.dtype)[:, :, None, :]
                   / jnp.sqrt(float(hd)))
            att = jnp.where(ok, att, _MASK)
            att = jax.nn.softmax(att, axis=-1)
            return jnp.einsum("bhqk,bhkd->bhqd",
                              att * cvs.astype(q.dtype)[:, :, None, :], cvf)
        q5 = q.reshape(b, kvh, g, t, hd)
        att = (jnp.einsum("bkgqd,bkld->bkgql", q5, ckf)
               * cks.astype(q.dtype)[:, :, None, None, :]
               / jnp.sqrt(float(hd)))
        att = jnp.where(ok, att, _MASK)
        att = jax.nn.softmax(att, axis=-1)
        return jnp.einsum("bkgql,bkld->bkgqd",
                          att * cvs.astype(q.dtype)[:, :, None, None, :],
                          cvf).reshape(b, h, t, hd)
    if g == 1:
        att = (jnp.einsum("bhqd,bhkd->bhqk", q, ck.astype(q.dtype))
               / jnp.sqrt(float(hd)))
        att = jnp.where(ok, att, _MASK)
        att = jax.nn.softmax(att, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", att, cv.astype(q.dtype))
    q5 = q.reshape(b, kvh, g, t, hd)
    att = (jnp.einsum("bkgqd,bkld->bkgql", q5, ck.astype(q.dtype))
           / jnp.sqrt(float(hd)))
    att = jnp.where(ok, att, _MASK)
    att = jax.nn.softmax(att, axis=-1)
    return jnp.einsum("bkgql,bkld->bkgqd", att,
                      cv.astype(q.dtype)).reshape(b, h, t, hd)
