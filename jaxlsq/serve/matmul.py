"""Weight-only INT8/INT4 matmul with dequant fused into the epilogue.

The serving-path compute kernel (BASELINE.json north_star: "the learned
scale/shift fold into a weight-only INT8/INT4 serving path where dequant fuses
into the matmul epilogue").  The reference has no serving kernels at all — it
hands (scale, zero_point) to ``torch.quantization.convert`` (observers.py:419,
SURVEY.md §3.4); on TPU the equivalent seam is this module.

Three compute paths:

* ``impl='xla'``    — ``x @ dequant(w)``: XLA fuses the int→float convert into
  the dot's operand pipeline.  Baseline + CPU path.
* ``impl='pallas'`` — fused kernel: int8 (or nibble-packed int4) weight tiles
  stream HBM→VMEM at 1/4–1/8 the float bandwidth, are dequantized IN VMEM
  (zp-subtract + convert), matmul'd on the MXU with f32 accumulation, and the
  per-output-channel scale is applied once in the epilogue on the final
  K-step.  The dequantized weights never exist in HBM.
* ``dynamic_int8_matmul`` — full-int8 path: activations quantized per-tensor
  on the fly (abs-max), int8×int8 MXU matmul with i32 accumulation, combined
  dequant epilogue ``out = sx·sw[n]·(acc − zp[n]·rowsum(x_q))``.

Weight layout contract: logical weight is (K, N) — contraction first, like
QuantDense's kernel (models/layers.py) — with per-channel qparams on N
(axis=1).  Per-tensor qparams (shape (1,)) broadcast.

Sharding: all paths are plain einsum-like ops under jit — shard the packed
weight's N axis over the mesh 'model' axis (column-parallel TP) with
``shard_packed`` from jaxlsq/serve/convert.py and XLA inserts the collectives.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pack import PackedWeight, dequantize_weight

__all__ = ["wo_matmul", "dynamic_int8_matmul", "static_int8_matmul",
           "static_int8_conv"]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _resolve_interpret(interpret) -> bool:
    if interpret is None:
        return jax.default_backend() != "tpu"
    return bool(interpret)


def _flatten_batch(x: jnp.ndarray):
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    return x.reshape(m, x.shape[-1]), lead


# --------------------------------------------------------------------------
# Fused weight-only kernels
# --------------------------------------------------------------------------

def _wo8_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, nk: int,
                precision=None):
    """One (bm, bn) output tile: f32-accumulated x·dequant(w8) over K steps.

    Grid (m, n, k) with k innermost ("arbitrary"); acc scratch persists
    across the k loop; scale applied once in the epilogue (last k step).
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # zp-subtract fused into the VMEM dequant (zp is f32-held per-channel)
    w = w_ref[:].astype(jnp.float32) - z_ref[:]
    acc_ref[:] += jax.lax.dot(
        x_ref[:].astype(jnp.float32), w,
        preferred_element_type=jnp.float32, precision=precision)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[:]).astype(o_ref.dtype)


def _wo4_kernel(xlo_ref, xhi_ref, p_ref, s_ref, z_ref, o_ref, acc_ref,
                rx_ref, *, nk: int, precision=None):
    """Int4 variant: each packed byte tile holds TWO k-tiles (split-half
    layout, see pack.pack_int4) unpacked with elementwise shifts — no
    cross-sublane shuffle — each matmul'd against its own x k-tile.

    Unpack cost is the int4 bottleneck (VERDICT r1 weak #2), so the kernel
    minimizes VPU ops per packed byte:

    * i32 arithmetic shifts (``>>4`` for the high nibble; ``<<28 >>28``
      sign-extends the low one) — Mosaic does not legalize i8 vector shifts
      on TPU, but the i32 form measures ~11% faster than the previous
      floor/compare/select f32 formulation (same-run comparison, v5e).
    * the zero-point is NOT subtracted per element; it folds into a rank-1
      epilogue ``acc − rowsum(x)·z[n]`` (dot(x, w−z) = dot(x,w) − z·Σx).
      The rowsum accumulates in a (bm, 1) scratch at 1/(2·bn) the cost of
      the two (bk, bn) subtracts it replaces.  (For the convert() path z≡0
      anyway — weight specs are symmetric.)

    Two regimes (r5 lab, examples/_int4_kernel_lab.py, 256-step timing
    chains — shorter chains let dispatch jitter invert the int4-vs-int8
    ordering between runs):

    * M=128, K=N=8192: COMPUTE-bound.  The bf16 MXU floor (2MKN/197e12 =
      0.087 ms on v5e) sits at/above the int4 byte time, so int4 can only
      reach ~0.91x int8 wall-clock here regardless of bytes.
    * M=16 (decode step): BANDWIDTH-bound — int4 = 0.61x int8 wall-clock
      (the packed-byte win realized; bench `serve_int4_vs_int8_m16`).
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        rx_ref[:] = jnp.zeros_like(rx_ref)

    pi = p_ref[:].astype(jnp.int32)
    hi = (pi >> 4).astype(jnp.float32)
    lo = ((pi << 28) >> 28).astype(jnp.float32)
    xlo = xlo_ref[:].astype(jnp.float32)
    xhi = xhi_ref[:].astype(jnp.float32)
    acc_ref[:] += jax.lax.dot(xlo, lo, preferred_element_type=jnp.float32,
                              precision=precision)
    acc_ref[:] += jax.lax.dot(xhi, hi, preferred_element_type=jnp.float32,
                              precision=precision)
    rx_ref[:] += (jnp.sum(xlo, axis=1, keepdims=True)
                  + jnp.sum(xhi, axis=1, keepdims=True))

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = ((acc_ref[:] - rx_ref[:] * z_ref[:])
                    * s_ref[:]).astype(o_ref.dtype)


def _wo4g_kernel(xlo_ref, xhi_ref, p_ref, slo_ref, shi_ref, o_ref, acc_ref,
                 *, nk: int, precision=None):
    """Group-wise int4 variant (quantize_weight_grouped): the step size
    varies ALONG K, so the per-channel epilogue trick no longer applies —
    each k-step's partial dot is scaled by its own (1, bn) group row before
    accumulation (one extra VPU multiply per dot; weights are symmetric, so
    no zp/rowsum machinery).  The two nibble k-tiles of a packed byte tile
    belong to different groups (split-half layout) and get separate rows."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pi = p_ref[:].astype(jnp.int32)
    hi = (pi >> 4).astype(jnp.float32)
    lo = ((pi << 28) >> 28).astype(jnp.float32)
    acc_ref[:] += jax.lax.dot(
        xlo_ref[:].astype(jnp.float32), lo,
        preferred_element_type=jnp.float32, precision=precision) * slo_ref[:]
    acc_ref[:] += jax.lax.dot(
        xhi_ref[:].astype(jnp.float32), hi,
        preferred_element_type=jnp.float32, precision=precision) * shi_ref[:]

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _grouped_pallas_ok(p: PackedWeight) -> bool:
    """The fused grouped kernel needs: int4 carrier, lane-aligned k blocks
    (group_size % 128 == 0) and group boundaries aligned with the split-half
    layout ((K/2) % group_size == 0).  Everything else serves via XLA."""
    if p.group_size is None or p.bits != 4:
        return False
    kdim = p.orig_shape[0]
    return (p.group_size % 128 == 0 and kdim % 2 == 0
            and (kdim // 2) % p.group_size == 0)


def _pad_to(x: jnp.ndarray, mult0: int, mult1: int) -> jnp.ndarray:
    p0 = _cdiv(x.shape[0], mult0) * mult0 - x.shape[0]
    p1 = _cdiv(x.shape[1], mult1) * mult1 - x.shape[1]
    if p0 or p1:
        x = jnp.pad(x, ((0, p0), (0, p1)))
    return x


def _qparams_rows(p: PackedWeight, n_pad: int):
    """Per-channel qparams as (1, N_pad) f32 rows (broadcast if per-tensor)."""
    n = p.orig_shape[1]
    s = p.scale.astype(jnp.float32)
    z = p.zero_point.astype(jnp.float32)
    if s.shape[0] == 1:
        s = jnp.broadcast_to(s, (n,))
        z = jnp.broadcast_to(z, (n,))
    if n_pad > n:
        s = jnp.pad(s, (0, n_pad - n), constant_values=1.0)
        z = jnp.pad(z, (0, n_pad - n))
    return s.reshape(1, n_pad), z.reshape(1, n_pad)


def _pick_bn(bm: int, bk: int, n: int, bits: int) -> int:
    """Widest N tile fitting the VMEM budget.  Wide N tiles matter in the
    serving regime (small M): activations are re-read once per N tile, so
    grid_n = N/bn multiplies the x traffic — measured 1.75x end-to-end going
    512→4096 at M=128, K=N=8192 on v5e.  Budget: double-buffered w/x/out
    blocks + the f32 acc scratch under ~12 MiB of the ~16 MiB VMEM."""
    wbytes_per_col = bk if bits == 8 else bk // 2
    # int4 unpack materializes i32-widened + two f32 nibble operands in VMEM
    # (~5 B/elem from Mosaic's scoped-vmem accounting; bn=4096 at bk=512
    # fails remote compile outright — VMEM overflow); the int8 path's single
    # f32 convert is fused into the MXU operand stream.
    unpack_bytes_per_col = 0 if bits == 8 else 5 * bk
    nx = 1 if bits == 8 else 2  # int4 consumes two x k-tiles per step
    for bn in (4096, 2048, 1024, 512, 256, 128):
        if bn > max(n, 128):
            continue
        vmem = (2 * bn * wbytes_per_col      # w tile (int8), double-buffered
                + bn * unpack_bytes_per_col
                + nx * 2 * bm * bk * 4       # x tile(s)
                + 2 * bm * bn * 4            # out tile
                + bm * bn * 4)               # acc scratch
        if vmem <= 12 * 1024 * 1024:
            return bn
    return 128


def _wo_matmul_pallas(x2d, p: PackedWeight, out_dtype, bm, bn, bk, interpret,
                      precision=None):
    kdim, n = p.orig_shape
    m = x2d.shape[0]
    bm = min(bm, max(8, _cdiv(m, 8) * 8))
    if bn is None:
        bn = _pick_bn(bm, bk, n, p.bits)
    xp = _pad_to(x2d.astype(jnp.float32), bm, bk)
    mp = xp.shape[0]
    grid_m, grid_n = _cdiv(mp, bm), _cdiv(_cdiv(n, bn) * bn, bn)
    n_pad = grid_n * bn
    if p.group_size is None:  # grouped scales are (G, N), not qparam rows
        s2, z2 = _qparams_rows(p, n_pad)

    if p.bits == 8:
        wp = _pad_to(p.data, bk, bn)          # (K_pad, N_pad) int8
        kp = wp.shape[0]
        if xp.shape[1] < kp:
            xp = jnp.pad(xp, ((0, 0), (0, kp - xp.shape[1])))
        nk = kp // bk
        out = pl.pallas_call(
            functools.partial(_wo8_kernel, nk=nk, precision=precision),
            out_shape=jax.ShapeDtypeStruct((mp, n_pad), out_dtype),
            grid=(grid_m, grid_n, nk),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
                pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
                pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=interpret,
        )(xp, wp, s2, z2)
        return out[:m, :n]

    # int4: packed data is (K/2, N); each packed k-tile consumes two x k-tiles
    # (logical k and k + K/2 — the split-half layout).
    if p.group_size is not None:
        # group-aligned k blocks (group_size % bk == 0; checked by
        # _grouped_pallas_ok that group_size % 128 == 0)
        bk = next(c for c in (512, 256, 128) if p.group_size % c == 0)
    k2 = p.data.shape[0]
    if xp.shape[1] < 2 * k2:
        xp = jnp.pad(xp, ((0, 0), (0, 2 * k2 - xp.shape[1])))
    wp = _pad_to(p.data, bk, bn)
    k2p = wp.shape[0]
    if k2p > k2:  # keep x halves aligned with the padded packed rows
        xlo = jnp.pad(xp[:, :k2], ((0, 0), (0, k2p - k2)))
        xhi = jnp.pad(xp[:, k2:2 * k2], ((0, 0), (0, k2p - k2)))
    else:
        xlo, xhi = xp[:, :k2], xp[:, k2:2 * k2]
    nk = k2p // bk

    if p.group_size is not None:
        r = p.group_size // bk
        gofs = (kdim // 2) // p.group_size
        gmax = gofs + (nk - 1) // r + 1
        sg = p.scale.astype(jnp.float32)  # (G, N)
        sgp = jnp.pad(sg, ((0, max(0, gmax - sg.shape[0])),
                           (0, n_pad - n)), constant_values=1.0)
        out = pl.pallas_call(
            functools.partial(_wo4g_kernel, nk=nk, precision=precision),
            out_shape=jax.ShapeDtypeStruct((mp, n_pad), out_dtype),
            grid=(grid_m, grid_n, nk),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
                pl.BlockSpec((1, bn), lambda i, j, k: (k // r, j)),
                pl.BlockSpec((1, bn),
                             lambda i, j, k: (gofs + k // r, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=interpret,
        )(xlo, xhi, wp, sgp, sgp)
        return out[:m, :n]
    out = pl.pallas_call(
        functools.partial(_wo4_kernel, nk=nk, precision=precision),
        out_shape=jax.ShapeDtypeStruct((mp, n_pad), out_dtype),
        grid=(grid_m, grid_n, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32),
                        pltpu.VMEM((bm, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(xlo, xhi, wp, s2, z2)
    return out[:m, :n]


def _is_cross_device_sharded(arr) -> bool:
    """True when a CONCRETE array is laid out across >1 device non-replicated.

    Used by ``impl='auto'`` to avoid routing TP-sharded weights into the
    Pallas kernel: a ``pallas_call`` has no SPMD partitioning rule, so XLA
    would all-gather the N-sharded weight (defeating column parallelism).
    Tracers (sharding unknown under jit) return False — for TP serving under
    jit pass ``impl='xla'`` explicitly (``QConfig.for_serving(impl='xla')``).
    """
    try:
        sh = getattr(arr, "sharding", None)
        return sh is not None and not sh.is_fully_replicated
    except Exception:
        return False


def wo_matmul(x: jnp.ndarray, packed: PackedWeight, *,
              impl: str = "auto",
              out_dtype=None,
              block_m: int = 256, block_n: Optional[int] = None,
              block_k: int = 512,
              precision=None,
              interpret: Optional[bool] = None) -> jnp.ndarray:
    """``x @ dequant(packed)`` with the dequant fused into the matmul.

    Args:
      x: (..., K) float activations.
      packed: PackedWeight of a logical (K, N) weight, per-channel on N.
      impl: 'auto' (pallas on TPU, xla elsewhere) | 'pallas' | 'xla'.
      precision: MXU precision for f32 inputs (jax.lax.Precision).  None =
        default single-pass bf16 (right for serving: int8 weight values are
        exactly representable in bf16, only the activations round, rel err
        ~2^-9).  Pass HIGHEST for f32-exact parity checks.
    """
    if len(packed.orig_shape) != 2:
        raise ValueError("wo_matmul needs a 2-D (K, N) packed weight; "
                         "convs go through dequant + lax.conv")
    out_dtype = out_dtype or x.dtype
    x2d, lead = _flatten_batch(x)
    if impl == "auto":
        # Regime dispatch (measured on v5e): the fused kernel wins when the
        # whole M fits one tile — every extra M tile re-streams AND
        # re-dequantizes the full weight, and VMEM (~16 MiB) cannot hold both
        # a tall M tile and a wide N tile.  Decode-shaped calls (M <= block_m)
        # → pallas; prefill/training-shaped calls → XLA, whose dequant-once
        # f32 weights amortize across all M rows.
        if (jax.default_backend() == "tpu"
                and x2d.shape[0] <= max(block_m, 256)
                and (packed.group_size is None
                     or _grouped_pallas_ok(packed))
                and not _is_cross_device_sharded(packed.data)):
            impl = "pallas"
        else:
            impl = "xla"
    if (impl == "pallas" and packed.group_size is not None
            and not _grouped_pallas_ok(packed)):
        raise ValueError(
            "the fused grouped kernel needs an int4 carrier with "
            "group_size % 128 == 0 and (K/2) % group_size == 0; "
            f"got bits={packed.bits}, group_size={packed.group_size}, "
            f"K={packed.orig_shape[0]} — use impl='xla'")
    if impl == "xla":
        w = dequantize_weight(packed, jnp.float32)
        out = jnp.matmul(x2d.astype(jnp.float32), w,
                         preferred_element_type=jnp.float32,
                         precision=precision).astype(out_dtype)
    else:
        out = _wo_matmul_pallas(x2d, packed, out_dtype, block_m, block_n,
                                block_k, _resolve_interpret(interpret),
                                precision=precision)
    return out.reshape(*lead, packed.orig_shape[1])


# --------------------------------------------------------------------------
# Dynamic full-int8 path (int8 x int8 -> int32 on the MXU)
# --------------------------------------------------------------------------

def static_int8_matmul(x: jnp.ndarray, packed: PackedWeight,
                       act_scale: jnp.ndarray, act_zp: jnp.ndarray,
                       act_qmin: int, act_qmax: int, *,
                       out_dtype=None) -> jnp.ndarray:
    """Static-activation int8×int8 matmul with the full dequant epilogue.

    The literal "int-matmul epilogue" serving path (BASELINE.json): x is
    quantized with FROZEN (scale, zp) from convert(), the dot runs int8×int8
    → i32 on the MXU, and the epilogue folds both dequants::

        x_q  = clamp(round(x/sx + zpx), qmin, qmax)           # int8
        out  = (x_q − zpx)·sx @ (w_q − zpw)·sw
             = sx·sw·[ x_q@w_q − zpx·colsum(w_q)
                       − zpw·rowsum(x_q) + K·zpx·zpw ]

    Exact in integers up to the i32 accumulator (K·127² ≈ 2.1e9/K rows safe
    for K ≤ ~130k), so it matches the float-simulated static path to f32
    rounding — while streaming BOTH operands at int8 width.

    Per-tensor ``act_scale/act_zp`` only (the standard activation layout).
    """
    if packed.bits != 8:
        raise ValueError("static_int8_matmul needs an int8-packed weight")
    if act_scale.shape[0] != 1:
        raise ValueError("static activation qparams must be per-tensor")
    out_dtype = out_dtype or x.dtype
    x2d, lead = _flatten_batch(x)
    xf = x2d.astype(jnp.float32)
    sx = act_scale.astype(jnp.float32)[0]
    zpx = act_zp.astype(jnp.float32)[0]
    # Unsigned activation ranges (e.g. quint8 [0,255]) overflow the int8
    # carrier the MXU dot wants; recentre by 128 — x_deq = (x_q − zpx)·sx is
    # invariant under shifting both x_q and zpx.
    shift = 128.0 if act_qmax > 127 else 0.0
    xq = jnp.clip(jnp.round(xf / sx + zpx), act_qmin, act_qmax) - shift
    xq = xq.astype(jnp.int8)
    zpx = zpx - shift
    acc = jax.lax.dot(xq, packed.data, preferred_element_type=jnp.int32)

    n = packed.orig_shape[1]
    sw = packed.scale.astype(jnp.float32)
    zpw = packed.zero_point.astype(jnp.float32)
    if sw.shape[0] == 1:
        sw = jnp.broadcast_to(sw, (n,))
        zpw = jnp.broadcast_to(zpw, (n,))
    colsum_w = jnp.sum(packed.data.astype(jnp.int32), axis=0)      # (N,)
    rowsum_x = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)  # (M,1)
    kdim = packed.orig_shape[0]
    out = (acc.astype(jnp.float32)
           - zpx * colsum_w.astype(jnp.float32)[None, :]
           - zpw[None, :] * rowsum_x.astype(jnp.float32)
           + float(kdim) * zpx * zpw[None, :])
    out = out * (sx * sw)[None, :]
    return out.astype(out_dtype).reshape(*lead, n)


def static_int8_conv(x: jnp.ndarray, packed: PackedWeight,
                     act_scale: jnp.ndarray, act_zp: jnp.ndarray,
                     act_qmin: int, act_qmax: int, *,
                     strides=(1, 1), padding="SAME",
                     feature_group_count: int = 1,
                     out_dtype=None) -> jnp.ndarray:
    """Static-activation int8×int8 convolution with the dequant epilogue —
    the conv analogue of ``static_int8_matmul`` (previously convs fell back
    to the float-simulated static path).

    NHWC input, HWIO packed weight (kh, kw, cin, cout), per-channel weight
    qparams on the output-channel axis.  For SYMMETRIC weights
    (zero_point ≡ 0 — always true for ``convert()`` output, since weight
    quantizers are symmetric by contract)::

        out = sx·sw[c]·( conv_i32(x_q − 128·u, w_q) − zpx'·Σw_q[c] )

    where the activation recentre (uint8 ranges → int8 carrier) and the
    per-output-channel weight column-sum fold into a single epilogue.
    AFFINE weights (zero_point ≠ 0, or a traced zero_point whose symmetry
    cannot be checked under jit) take the full expansion — the cross term
    ``zpw[c]·Σ_window x_q`` is a second integer conv against a ones kernel
    (one output channel per group, broadcast across the group's outputs)::

        out = sx·sw[c]·( acc − zpx'·Σw_q[c] − zpw[c]·(xwin − zpx'·kh·kw·cin_g) )

    so the result is exact for ANY PackedWeight; symmetry is a fast path,
    not a precondition.
    Padding uses the quantized representation of real 0.0 (= the integer
    zero-point), which makes SAME padding agree EXACTLY with the float
    path's 0.0 padding (integer zp ⇒ fq(0) = 0).

    Role: integer-exact conv semantics (deployment-target parity for
    int8-conv runtimes), not speed — measured on v5e (16×32×32×128 →
    3×3×256) the integer conv is 1.61 ms vs 1.48 ms for the float conv of
    the dequantized weight; XLA's TPU int-conv lowering does not beat the
    bf16 MXU path, and the packed-weight HBM saving applies to both.
    """
    if packed.bits != 8:
        raise ValueError("static_int8_conv needs an int8-packed weight")
    if act_scale.shape[0] != 1:
        raise ValueError("static activation qparams must be per-tensor")
    zpw = packed.zero_point
    # Symmetric weights skip the window-sum conv; a traced zero_point's
    # symmetry is unknowable at trace time, so it takes the (always-exact)
    # affine epilogue rather than silently assuming symmetry.
    affine = (isinstance(zpw, jax.core.Tracer)
              or bool(jnp.any(zpw != 0)))
    kh, kw, cin, cout = packed.orig_shape
    out_dtype = out_dtype or x.dtype
    xf = x.astype(jnp.float32)
    sx = act_scale.astype(jnp.float32)[0]
    zpx = act_zp.astype(jnp.float32)[0]
    shift = 128.0 if act_qmax > 127 else 0.0
    xq = (jnp.clip(jnp.round(xf / sx + zpx), act_qmin, act_qmax)
          - shift).astype(jnp.int8)
    zpx_c = zpx - shift  # recentred zp; (x_q − zpx_c)·sx is invariant

    if isinstance(strides, int):
        strides = (strides, strides)
    if padding == "SAME":
        pads = []
        for dim, k, s in ((1, kh, strides[0]), (2, kw, strides[1])):
            n_in = x.shape[dim]
            total = max((_cdiv(n_in, s) - 1) * s + k - n_in, 0)
            pads.append((total // 2, total - total // 2))
    elif padding == "VALID":
        pads = [(0, 0), (0, 0)]
    else:
        pads = [tuple(p) for p in padding]
    if any(p != (0, 0) for p in pads):
        # pad with the integer zero-point = quantized real 0.0
        pad_val = jnp.round(zpx_c).astype(jnp.int8)
        xq = jax.lax.pad(xq, pad_val,
                         ((0, 0, 0), (*pads[0], 0), (*pads[1], 0), (0, 0, 0)))

    acc = jax.lax.conv_general_dilated(
        xq, packed.data,
        window_strides=strides,
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32,
    )
    sw = packed.scale.astype(jnp.float32)
    zpw_f = zpw.astype(jnp.float32)
    if sw.shape[0] == 1:
        sw = jnp.broadcast_to(sw, (cout,))
        zpw_f = jnp.broadcast_to(zpw_f, (cout,))
    wsum = jnp.sum(packed.data.astype(jnp.int32), axis=(0, 1, 2))  # (cout,)
    out = (acc.astype(jnp.float32)
           - zpx_c * wsum.astype(jnp.float32)[None, None, None, :])
    if affine:
        # cross term: zpw[c] · Σ_window (x_q − zpx).  The window-sum of x_q
        # is an int8 conv against a ones kernel with ONE output channel per
        # group (orig_shape's cin is already per-group under grouping),
        # broadcast to the group's cout/g output channels.
        g = feature_group_count
        ones_k = jnp.ones((kh, kw, cin, g), jnp.int8)
        xwin = jax.lax.conv_general_dilated(
            xq, ones_k, window_strides=strides, padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=g,
            preferred_element_type=jnp.int32)           # (N, H', W', g)
        xwin = jnp.repeat(xwin, cout // g, axis=-1).astype(jnp.float32)
        window = float(kh * kw * cin)
        out = out - zpw_f[None, None, None, :] * (xwin - zpx_c * window)
    out = out * (sx * sw)[None, None, None, :]
    return out.astype(out_dtype)


def dynamic_int8_matmul(x: jnp.ndarray, packed: PackedWeight, *,
                        out_dtype=None) -> jnp.ndarray:
    """Per-tensor dynamic activation quant + int8×int8 matmul + fused dequant.

    ``x_q = round(x/sx)`` with ``sx = max|x|/127``; the epilogue folds both
    scales and the weight zero-point:
    ``out = sx·sw[n]·(x_q·w_q − zp[n]·rowsum(x_q))``.
    Runs as XLA ops (TPU MXU executes the i8×i8→i32 dot natively); everything
    around the dot fuses.
    """
    if packed.bits != 8:
        raise ValueError("dynamic_int8_matmul needs an int8-packed weight")
    out_dtype = out_dtype or x.dtype
    x2d, lead = _flatten_batch(x)
    xf = x2d.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf)) / 127.0
    sx = jnp.maximum(sx, jnp.finfo(jnp.float32).tiny)
    xq = jnp.round(xf / sx).astype(jnp.int8)
    acc = jax.lax.dot(xq, packed.data, preferred_element_type=jnp.int32)
    sw = packed.scale.astype(jnp.float32)
    zp = packed.zero_point.astype(jnp.float32)
    if sw.shape[0] == 1:
        sw = jnp.broadcast_to(sw, (packed.orig_shape[1],))
        zp = jnp.broadcast_to(zp, (packed.orig_shape[1],))
    rowsum = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)
    out = (acc.astype(jnp.float32) - rowsum.astype(jnp.float32) * zp[None, :])
    out = out * (sx * sw)[None, :]
    return out.astype(out_dtype).reshape(*lead, packed.orig_shape[1])
