"""Fused Pallas TPU kernels for LSQ/LSQ+ fake quantization.

TPU-native replacement for the reference's device kernels
(torchlsq/csrc/ops/cpu/lsq_cpu.cpp, cuda/lsq_cuda.cu) and the shared math header
(ops/kernels/lsq_kernel.h).  Design goals vs the reference (BASELINE.md):

* Forward: one elementwise pass (1N read + 1N write) — same as reference.
* Backward: ONE fused pass.  The reference CUDA backward launches 3 separate
  kernels (dX, dS, dB), each re-reading grad+x, and materializes full-size
  dS/dB buffers that are then reduced: ~9N element traffic + 2N reduction reads
  (lsq_cuda.cu:91-141).  Here the single kernel reads grad+x once (2N), writes
  the dX tile (1N), and emits only O(grid) per-tile *partial sums* for dS/dB,
  reduced by a tiny XLA sum afterwards.  That is the 3N-traffic optimum for
  this op (it is HBM-bandwidth-bound).
* No host↔device syncs: scale/shift stay on device in SMEM (1,1) scalars
  (vs the ``.item()`` hoists at lsq_cpu.cpp:44-46 / lsq_cuda.cu:52-54).
* Mode specialization at trace time: eval_mode backward skips the partial-sum
  outputs entirely; init_mode backward skips the dX output (dX == grad is a
  no-copy passthrough, lsq_kernel.h:112).
* bf16/fp16 inputs are computed with f32 intermediates and f32 partial-sum
  accumulation (deviation from the reference CUDA, which computes in fp16 when
  the input is fp16 — lsq_cuda.cu:45; documented per SURVEY.md §7).

Layout strategy: inputs are canonicalized once per call —

* per-tensor: flatten to (rows, 128) lanes;
* per-channel: move the channel axis last and flatten to (rows, C) so channels
  live on lanes and the per-channel dS/dB reduction is a sublane reduction
  (SURVEY.md §7 "hard parts" #1).

Padding to tile multiples is applied only when shapes require it (aligned
shapes — the common case for NN layers — take the fast path with zero copies).
Out-of-range elements are excluded from the partial sums with iota masks.

Measured reality on TPU v5e (see bench.py), recorded for honesty:

* a pallas_call WITHOUT input_output_aliases streams at ~half rate on this
  chip (~313 vs ~599 GB/s measured for the forward) — a Pallas pipelining
  artifact, NOT a hardware property (XLA's own disjoint-buffer elementwise
  hits ~633 GB/s vs ~677 aliased).  Both kernels therefore declare the alias
  (fwd: out↔x, bwd: dX↔grad); when the aliased input is still live (the fwd
  input is the VJP residual) XLA inserts a protective copy, which measures
  no worse than the unaliased kernel, and when it is dead (eval/serving,
  bwd cotangent) the kernel runs at full rate;
* reshapes that change the trailing dim are physical copies under TPU tiled
  layouts — the canonicalization below is zero-copy for aligned shapes;
* even so, XLA's own fusion of the golden jnp backward (one pass: dX + both
  reductions, with automatic buffer donation) measures as fast or faster than
  these kernels and additionally fuses into neighboring ops inside real
  models, so ``impl='auto'`` serves the XLA path and these kernels are the
  explicit ``impl='pallas'`` option (and the blueprint for ops XLA cannot
  fuse, e.g. the serving-path quantized matmuls).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

from ..core.golden import effective_grad_scale
from ..core.spec import QuantSpec

__all__ = ["pallas_forward", "pallas_backward", "pallas_fwdbwd",
           "pallas_forward_traced", "pallas_backward_traced"]

LANES = 128
F32EPS = float(np.finfo(np.float32).eps)

# Block byte budgets for the elementwise grids.  Forward moves 2 streams
# (double-buffered = 4 live blocks); backward moves 3 streams (= 6 live
# blocks); both must stay under the ~16 MiB scoped-VMEM limit.  ~1-2 MiB
# blocks measure fastest on v5e.
FWD_BLOCK_BYTES = 2 * 1024 * 1024
BWD_BLOCK_BYTES = 1 * 1024 * 1024
# Legacy row-tile heights for the per-channel kernels (channel width varies).
BLOCK_ROWS = 512
BWD_BLOCK_ROWS = 256


def _block_rows(budget_bytes: int, cols: int, rows: int) -> int:
    bm = max(8, budget_bytes // (4 * cols))
    bm = min(bm, rows)
    # keep divisible-by-8 when trimming below the row count
    if bm < rows:
        bm -= bm % 8
    return max(bm, 1)
# Channel-tile width for per-channel kernels (multiple of 128 lanes).
BLOCK_CHANNELS = 512


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# --------------------------------------------------------------------------
# Layout canonicalization
# --------------------------------------------------------------------------

def _pick_cols(n: int) -> int:
    """Widest power-of-two row width (multiple of 128 lanes) that divides n —
    wide rows mean fewer, larger grid blocks, which measurably streams faster
    (128-lane tiles cost ~2x vs 1024-wide on v5e)."""
    for c in (4096, 2048, 1024, 512, 256, 128):
        if n % c == 0 and n // c >= 8:
            return c
    return LANES


# Max lane width a single (bm, cols) block supports with bm >= 8 under the
# backward's 1 MiB block budget.
_MAX_DIRECT_COLS = 8192


def _to_rows_lanes(x: jnp.ndarray) -> Tuple[jnp.ndarray, int, int]:
    """Canonicalize to 2D (rows, cols) for the per-tensor kernels.

    CRITICAL for performance: on TPU, arrays carry a tiled (8,128) physical
    layout over the last two dims, so a reshape that changes the trailing dim
    is a PHYSICAL COPY — it costs a full read+write AND breaks the
    dX↔grad buffer aliasing (which costs ~2x stream rate in Pallas, see the
    module docstring).  Therefore:

    * aligned 2D input                 → used as-is (zero-copy);
    * ndim>2 with aligned trailing dims → leading dims collapsed, which
      preserves the tiled layout (bitcast, zero-copy);
    * anything else                    → flat fallback via _pick_cols
      (physical copy; only hit by small/odd shapes).

    Returns (x2d, n_valid, cols).
    """
    n = x.size
    if (x.ndim == 2 and x.shape[1] % LANES == 0 and x.shape[0] % 8 == 0
            and x.shape[1] <= _MAX_DIRECT_COLS):
        return x, n, x.shape[1]
    if (x.ndim > 2 and x.shape[-1] % LANES == 0 and x.shape[-2] % 8 == 0
            and x.shape[-1] <= _MAX_DIRECT_COLS):
        return x.reshape(-1, x.shape[-1]), n, x.shape[-1]
    cols = _pick_cols(n)
    rows = max(1, _cdiv(n, cols))
    pad = rows * cols - n
    xf = x.reshape(-1)
    if pad:
        xf = jnp.pad(xf, (0, pad))
    return xf.reshape(rows, cols), n, cols


def _from_rows_lanes(y2d: jnp.ndarray, shape, n: int) -> jnp.ndarray:
    if y2d.size == n:
        return y2d.reshape(shape)
    return y2d.reshape(-1)[:n].reshape(shape)


def _to_rows_channels(x: jnp.ndarray, axis: int) -> Tuple[jnp.ndarray, int, int]:
    """Move channel axis last, flatten to (rows, C); returns (x2d, rows, C)."""
    xt = jnp.moveaxis(x, axis, -1)
    c = xt.shape[-1]
    rows = xt.size // c
    return xt.reshape(rows, c), rows, c


def _from_rows_channels(y2d: jnp.ndarray, x_shape, axis: int) -> jnp.ndarray:
    xt_shape = tuple(np.moveaxis(np.empty(x_shape, dtype=np.uint8), axis, -1).shape)
    return jnp.moveaxis(y2d.reshape(xt_shape), -1, axis)


def _pad2d(x2d: jnp.ndarray, row_mult: int, col_mult: int,
           value: float = 0.0) -> jnp.ndarray:
    r, c = x2d.shape
    pr = _cdiv(r, row_mult) * row_mult - r
    pc = _cdiv(c, col_mult) * col_mult - c
    if pr or pc:
        x2d = jnp.pad(x2d, ((0, pr), (0, pc)), constant_values=value)
    return x2d


# --------------------------------------------------------------------------
# Scalar-qparam (per-tensor) kernels
# --------------------------------------------------------------------------

def _pt_scalars(s_ref, b_ref, spec: QuantSpec):
    """Load + clamp per-tensor qparams from SMEM (lsq_cpu.cpp:44-46 without the
    host sync)."""
    s = jnp.maximum(jnp.abs(s_ref[0, 0]), F32EPS)
    b = b_ref[0, 0]
    zp = jnp.round(jnp.clip(-b / s, float(spec.type_min), float(spec.type_max)))
    return s, zp


def _pt_fwd_kernel(s_ref, b_ref, x_ref, o_ref, *, spec: QuantSpec):
    s, zp = _pt_scalars(s_ref, b_ref, spec)
    x = x_ref[:].astype(jnp.float32)
    xq = jnp.round(jnp.clip(x / s + zp, float(spec.quant_min), float(spec.quant_max)))
    o_ref[:] = ((xq - zp) * s).astype(o_ref.dtype)


def _pt_bwd_kernel(s_ref, b_ref, g_ref, x_ref, *outs,
                   spec: QuantSpec, init_mode: bool, eval_mode: bool,
                   n_valid: int, gs: float, block_rows: int, cols: int = LANES,
                   emit_out: bool = False):
    """Fused per-tensor backward: dX tile + dS/dB accumulated across the grid.

    Math: lsq_kernel.h:94-123 (combined) / :126-145 (eval).
    The dS/dB outputs are (1,1) SMEM scalars with a constant block index: TPU
    grids run sequentially, so the accumulator stays resident across steps
    (standard Pallas reduction pattern) — the final sums leave the kernel fully
    reduced, with zero post-kernel reduction traffic.
    Output layout depends on mode:
      full: (dx_ref, ds_ref, db_ref);  eval: (dx_ref,);  init: (ds_ref, db_ref).
    """
    qmin, qmax = float(spec.quant_min), float(spec.quant_max)
    s, zp = _pt_scalars(s_ref, b_ref, spec)
    g = g_ref[:].astype(jnp.float32)
    x = x_ref[:].astype(jnp.float32)

    xq = jnp.clip(x / s + zp, qmin, qmax)            # unrounded (lsq_kernel.h:108)
    mask = (qmin < xq) & (xq < qmax)                 # strict (lsq_kernel.h:109)

    emit_dx = not init_mode                # init: dX == grad, returned outside
    emit_partials = not eval_mode
    oi = 0
    if emit_out:  # fused fwd+bwd: the forward output is one extra line —
        # xfq is needed for dS anyway, so emitting it costs only the write
        out_ref = outs[oi]; oi += 1
        out_ref[:] = ((jnp.round(xq) - zp) * s).astype(out_ref.dtype)
    if emit_dx:
        dx_ref = outs[oi]; oi += 1
        dx_ref[:] = jnp.where(mask, g, 0.0).astype(dx_ref.dtype)
    if emit_partials:
        ds_ref, db_ref = outs[oi], outs[oi + 1]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            ds_ref[0, 0] = jnp.float32(0.0)
            db_ref[0, 0] = jnp.float32(0.0)

        row = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0) + i * block_rows
        col = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
        valid = (row * cols + col) < n_valid

        xfq = (jnp.round(xq) - zp) * s
        geff = 2.0 * (xfq - x) if init_mode else g
        border = jnp.where(xq <= qmin, geff * (qmin - zp), geff * (qmax - zp))
        ds_elem = jnp.where(mask, geff * (xfq - x) / s, border)
        ds_ref[0, 0] += jnp.sum(jnp.where(valid, ds_elem, 0.0)) * gs
        if not spec.symmetric:
            db_elem = jnp.where(mask, 0.0, geff)
            db_ref[0, 0] += jnp.sum(jnp.where(valid, db_elem, 0.0)) * gs


# --------------------------------------------------------------------------
# Per-channel kernels (channels on lanes)
# --------------------------------------------------------------------------

def _pc_vectors(s_ref, b_ref, spec: QuantSpec):
    """Clamp per-channel qparams in-kernel (lsq_kernel.h:157-158)."""
    s = jnp.maximum(jnp.abs(s_ref[:]), F32EPS)        # (1, CT)
    zp = jnp.round(jnp.clip(-b_ref[:] / s, float(spec.type_min), float(spec.type_max)))
    return s, zp


def _pc_fwd_kernel(s_ref, b_ref, x_ref, o_ref, *, spec: QuantSpec):
    s, zp = _pc_vectors(s_ref, b_ref, spec)
    x = x_ref[:].astype(jnp.float32)
    xq = jnp.round(jnp.clip(x / s + zp, float(spec.quant_min), float(spec.quant_max)))
    o_ref[:] = ((xq - zp) * s).astype(o_ref.dtype)


def _pc_bwd_kernel(s_ref, b_ref, g_ref, x_ref, *outs,
                   spec: QuantSpec, init_mode: bool, eval_mode: bool,
                   n_valid_rows: int, gs: float, block_rows: int,
                   emit_out: bool = False):
    """Fused per-channel backward: dX tile + per-channel dS/dB accumulators.

    The channel axis lives on lanes, so the dS/dB reduction is a sublane
    (axis-0) reduction within the tile — the layout that makes the
    "reduce over all-but-channel-axis" (lsq_cpu.cpp:287-293) a single
    in-register jnp.sum.

    Grid is (channel_tiles, row_tiles) with row tiles INNERMOST: the (8, CT)
    accumulator blocks keep a constant index over the inner row loop, so they
    stay resident in VMEM across steps and are flushed once per channel tile.
    """
    qmin, qmax = float(spec.quant_min), float(spec.quant_max)
    s, zp = _pc_vectors(s_ref, b_ref, spec)
    g = g_ref[:].astype(jnp.float32)
    x = x_ref[:].astype(jnp.float32)

    xq = jnp.clip(x / s + zp, qmin, qmax)
    mask = (qmin < xq) & (xq < qmax)

    emit_dx = not init_mode
    emit_partials = not eval_mode
    oi = 0
    if emit_out:  # fused fwd+bwd (see _pt_bwd_kernel)
        out_ref = outs[oi]; oi += 1
        out_ref[:] = ((jnp.round(xq) - zp) * s).astype(out_ref.dtype)
    if emit_dx:
        dx_ref = outs[oi]; oi += 1
        dx_ref[:] = jnp.where(mask, g, 0.0).astype(dx_ref.dtype)
    if emit_partials:
        ds_ref, db_ref = outs[oi], outs[oi + 1]
        ir = pl.program_id(1)  # row tile — inner grid dim

        @pl.when(ir == 0)
        def _():
            ds_ref[:] = jnp.zeros_like(ds_ref)
            db_ref[:] = jnp.zeros_like(db_ref)

        row = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0) + ir * block_rows
        valid = row < n_valid_rows

        xfq = (jnp.round(xq) - zp) * s
        geff = 2.0 * (xfq - x) if init_mode else g
        border = jnp.where(xq <= qmin, geff * (qmin - zp), geff * (qmax - zp))
        ds_elem = jnp.where(mask, geff * (xfq - x) / s, border)
        # Reduce (BM, CT) → (8, CT) so the accumulate is a full-sublane op, and
        # the residual 8-row sum happens once on the host side.
        bm, ct = g.shape
        ds_ref[:] += jnp.sum(
            jnp.where(valid, ds_elem, 0.0).reshape(bm // 8, 8, ct), axis=0) * gs
        if not spec.symmetric:
            db_elem = jnp.where(mask, 0.0, geff)
            db_ref[:] += jnp.sum(
                jnp.where(valid, db_elem, 0.0).reshape(bm // 8, 8, ct), axis=0) * gs


# --------------------------------------------------------------------------
# Host-side wrappers
# --------------------------------------------------------------------------

def _qp_smem(q: jnp.ndarray) -> jnp.ndarray:
    return q.reshape(1, 1).astype(jnp.float32)


def _resolve_interpret(interpret) -> bool:
    """interpret=None → auto: compiled on TPU, interpreter elsewhere (the
    "same code runs on CPU for tests" property, SURVEY.md §2a)."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return bool(interpret)


def pallas_forward(x, scale, shift, *, spec: QuantSpec, init_mode: bool = False,
                   interpret: Optional[bool] = None):
    """Fake-quant forward via Pallas (lsq_kernel.h:6-14 semantics).

    fp16 inputs are computed at f32 in-kernel (Mosaic on v5e fails to
    compile f16 vector code; the boundary converts fuse into neighboring
    XLA ops) — consistent with the f32-accumulation deviation for low
    precision (PARITY.md deviation 8)."""
    interpret = _resolve_interpret(interpret)
    if init_mode:
        return x  # identity (lsq_kernel.h:13)
    if x.dtype == jnp.float16:
        out = pallas_forward(x.astype(jnp.float32), scale, shift, spec=spec,
                             interpret=interpret)
        return out.astype(jnp.float16)
    if spec.per_channel:
        return _pc_forward(x, scale, shift, spec, interpret)
    return _pt_forward(x, scale, shift, spec, interpret)


def _pt_forward(x, scale, shift, spec, interpret):
    x2d, n, cols = _to_rows_lanes(x)
    rows = x2d.shape[0]
    bm = _block_rows(FWD_BLOCK_BYTES, cols, rows)
    grid = (_cdiv(rows, bm),)
    out = pl.pallas_call(
        functools.partial(_pt_fwd_kernel, spec=spec),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        # out aliases x: 2x stream rate when x is dead (see module docstring);
        # XLA copy-protects when x is live (VJP residual) at no net cost.
        input_output_aliases={2: 0},
        interpret=interpret,
    )(_qp_smem(scale), _qp_smem(shift), x2d)
    return _from_rows_lanes(out, x.shape, n)


def _pc_qparams(scale, shift, c_pad):
    s = scale.astype(jnp.float32)
    b = shift.astype(jnp.float32)
    if s.shape[0] < c_pad:
        s = jnp.pad(s, (0, c_pad - s.shape[0]), constant_values=1.0)
        b = jnp.pad(b, (0, c_pad - b.shape[0]))
    return s.reshape(1, c_pad), b.reshape(1, c_pad)


def _pc_forward(x, scale, shift, spec, interpret):
    x2d, rows, c = _to_rows_channels(x, spec.axis)
    x2dp = _pad2d(x2d, 8, LANES)
    rp, cp = x2dp.shape
    bm = min(BLOCK_ROWS, rp)
    ct = min(BLOCK_CHANNELS, cp)
    grid = (_cdiv(rp, bm), _cdiv(cp, ct))
    s2, b2 = _pc_qparams(scale, shift, cp)
    out = pl.pallas_call(
        functools.partial(_pc_fwd_kernel, spec=spec),
        out_shape=jax.ShapeDtypeStruct(x2dp.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ct), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, ct), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, ct), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        input_output_aliases={2: 0},  # out↔x, see module docstring
        interpret=interpret,
    )(s2, b2, x2dp)
    return _from_rows_channels(out[:rows, :c], x.shape, spec.axis)


def pallas_backward(grad, x, scale, shift, *, spec: QuantSpec,
                    eval_mode: bool = False, init_mode: bool = False,
                    numel: Optional[int] = None,
                    interpret: Optional[bool] = None):
    """Fused fake-quant backward via Pallas.

    Returns (dX, dS, dB) with dS/dB already reduced to qparam shape, matching
    golden_backward (and the reference's post-kernel sum reductions,
    lsq_cpu.cpp:138-139, 287-293 — done here as in-kernel partials + tiny sum).

    fp16 runs at f32 in-kernel with dX cast back (see pallas_forward).
    """
    interpret = _resolve_interpret(interpret)
    if grad.dtype == jnp.float16 or x.dtype == jnp.float16:
        dX, dS, dB = pallas_backward(
            grad.astype(jnp.float32), x.astype(jnp.float32), scale, shift,
            spec=spec, eval_mode=eval_mode, init_mode=init_mode, numel=numel,
            interpret=interpret)
        return dX.astype(jnp.float16), dS, dB
    if spec.per_channel:
        return _pc_backward(grad, x, scale, shift, spec, eval_mode, init_mode,
                            numel, interpret)
    return _pt_backward(grad, x, scale, shift, spec, eval_mode, init_mode,
                        numel, interpret)


def _pt_backward(grad, x, scale, shift, spec, eval_mode, init_mode, numel,
                 interpret):
    g2d, n, cols = _to_rows_lanes(grad)
    x2d, _, _ = _to_rows_lanes(x)
    rows = x2d.shape[0]
    bm = _block_rows(BWD_BLOCK_BYTES, cols, rows)
    ntiles = _cdiv(rows, bm)
    gs = effective_grad_scale(spec, numel if numel is not None else x.size)

    emit_dx = not init_mode
    emit_partials = not eval_mode
    out_shape, out_specs = [], []
    if emit_dx:
        out_shape.append(jax.ShapeDtypeStruct(x2d.shape, x.dtype))
        out_specs.append(pl.BlockSpec((bm, cols), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
    if emit_partials:
        for _ in range(2):
            # fully-reduced (1,1) SMEM accumulator, constant block index
            out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))
            out_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                          memory_space=pltpu.SMEM))

    # dX aliases the incoming cotangent: g is dead after the VJP consumes it,
    # and an unaliased pallas_call streams at ~half rate on v5e (see module
    # docstring; XLA gets the same effect via buffer donation).
    alias = {2: 0} if emit_dx else {}
    outs = pl.pallas_call(
        functools.partial(_pt_bwd_kernel, spec=spec, init_mode=init_mode,
                          eval_mode=eval_mode, n_valid=n, gs=gs, block_rows=bm,
                          cols=cols),
        out_shape=tuple(out_shape),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        input_output_aliases=alias,
        interpret=interpret,
    )(_qp_smem(scale), _qp_smem(shift), g2d, x2d)

    oi = 0
    if emit_dx:
        dX = _from_rows_lanes(outs[oi], x.shape, n)
        oi += 1
    else:
        dX = grad  # init-mode STE passthrough, no copy (lsq_kernel.h:112)
    if emit_partials:
        dS = outs[oi].reshape(scale.shape).astype(scale.dtype)
        dB = outs[oi + 1].reshape(shift.shape).astype(shift.dtype)
    else:
        dS = jnp.zeros_like(scale)
        dB = jnp.zeros_like(shift)
    return dX, dS, dB


def _pc_backward(grad, x, scale, shift, spec, eval_mode, init_mode, numel,
                 interpret):
    g2d, rows, c = _to_rows_channels(grad, spec.axis)
    x2d, _, _ = _to_rows_channels(x, spec.axis)
    g2dp = _pad2d(g2d, 8, LANES)
    x2dp = _pad2d(x2d, 8, LANES)
    rp, cp = x2dp.shape
    bm = min(BLOCK_ROWS, rp)
    ct = min(BLOCK_CHANNELS, cp)
    # Channel tiles OUTER, row tiles INNER so the (8, ct) accumulator block
    # index is constant over the inner loop (see _pc_bwd_kernel docstring).
    grid = (_cdiv(cp, ct), _cdiv(rp, bm))
    gs = effective_grad_scale(spec, numel if numel is not None else x.size, c)
    s2, b2 = _pc_qparams(scale, shift, cp)

    emit_dx = not init_mode
    emit_partials = not eval_mode
    out_shape, out_specs = [], []
    if emit_dx:
        out_shape.append(jax.ShapeDtypeStruct(x2dp.shape, x.dtype))
        out_specs.append(pl.BlockSpec((bm, ct), lambda j, i: (i, j),
                                      memory_space=pltpu.VMEM))
    if emit_partials:
        for _ in range(2):
            out_shape.append(jax.ShapeDtypeStruct((8, cp), jnp.float32))
            out_specs.append(pl.BlockSpec((8, ct), lambda j, i: (0, j),
                                          memory_space=pltpu.VMEM))

    alias = {2: 0} if emit_dx else {}
    outs = pl.pallas_call(
        functools.partial(_pc_bwd_kernel, spec=spec, init_mode=init_mode,
                          eval_mode=eval_mode, n_valid_rows=rows, gs=gs,
                          block_rows=bm),
        out_shape=tuple(out_shape),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ct), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, ct), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, ct), lambda j, i: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        input_output_aliases=alias,
        interpret=interpret,
    )(s2, b2, g2dp, x2dp)

    oi = 0
    if emit_dx:
        dX = _from_rows_channels(outs[oi][:rows, :c], x.shape, spec.axis)
        oi += 1
    else:
        dX = grad
    if emit_partials:
        dS = jnp.sum(outs[oi][:, :c], axis=0).astype(scale.dtype)
        dB = jnp.sum(outs[oi + 1][:, :c], axis=0).astype(shift.dtype)
    else:
        dS = jnp.zeros_like(scale)
        dB = jnp.zeros_like(shift)
    return dX, dS, dB


def pallas_fwdbwd(grad, x, scale, shift, *, spec: QuantSpec,
                  numel: Optional[int] = None,
                  interpret: Optional[bool] = None):
    """Fused forward + backward in ONE kernel pass (VERDICT r2 next-#8):
    reads (grad, x) once and writes (out, dX) plus the reduced dS/dB
    partials — 16 B/elem of real traffic vs 20 for the split
    pallas_forward + pallas_backward pair (the forward output is one extra
    VMEM write: its value ``(round(xq)−zp)·s`` is already computed for dS).

    Applicable where forward and backward are ADJACENT in the program: the
    rematerialization chain (``jax.checkpoint`` recomputes the forward
    during the backward pass) and fwd+bwd training microbenchmarks.  In a
    plain (non-remat) training step the two passes are separated by the
    rest of the network, so the split kernels / XLA fusion apply instead —
    see docs/measurements/impl_auto_inmodel_tpu.json for the measured
    decision record.

    Train mode only (eval_mode/init_mode have degenerate fwd or bwd and
    keep their specialized split kernels).  Returns (out, dX, dS, dB),
    bit-identical to golden_forward + golden_backward up to the documented
    dS/dB partial-sum ordering.
    """
    interpret = _resolve_interpret(interpret)
    if grad.dtype == jnp.float16 or x.dtype == jnp.float16:
        out, dX, dS, dB = pallas_fwdbwd(
            grad.astype(jnp.float32), x.astype(jnp.float32), scale, shift,
            spec=spec, numel=numel, interpret=interpret)
        return out.astype(jnp.float16), dX.astype(jnp.float16), dS, dB
    if spec.per_channel:
        return _pc_fwdbwd(grad, x, scale, shift, spec, numel, interpret)
    return _pt_fwdbwd(grad, x, scale, shift, spec, numel, interpret)


def _pt_fwdbwd(grad, x, scale, shift, spec, numel, interpret):
    g2d, n, cols = _to_rows_lanes(grad)
    x2d, _, _ = _to_rows_lanes(x)
    rows = x2d.shape[0]
    bm = _block_rows(BWD_BLOCK_BYTES, cols, rows)
    ntiles = _cdiv(rows, bm)
    gs = effective_grad_scale(spec, numel if numel is not None else x.size)

    blk = pl.BlockSpec((bm, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    out, dx, ds, db = pl.pallas_call(
        functools.partial(_pt_bwd_kernel, spec=spec, init_mode=False,
                          eval_mode=False, n_valid=n, gs=gs, block_rows=bm,
                          cols=cols, emit_out=True),
        out_shape=(jax.ShapeDtypeStruct(x2d.shape, x.dtype),
                   jax.ShapeDtypeStruct(x2d.shape, x.dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        grid=(ntiles,),
        in_specs=[smem, smem, blk, blk],
        out_specs=(blk, blk, smem, smem),
        # out↔x and dX↔grad: both inputs are dead after the fused pass in
        # the remat chain; XLA copy-protects any that are still live
        input_output_aliases={3: 0, 2: 1},
        interpret=interpret,
    )(_qp_smem(scale), _qp_smem(shift), g2d, x2d)
    return (_from_rows_lanes(out, x.shape, n),
            _from_rows_lanes(dx, x.shape, n),
            ds.reshape(scale.shape).astype(scale.dtype),
            db.reshape(shift.shape).astype(shift.dtype))


def _pc_fwdbwd(grad, x, scale, shift, spec, numel, interpret):
    g2d, rows, c = _to_rows_channels(grad, spec.axis)
    x2d, _, _ = _to_rows_channels(x, spec.axis)
    g2dp = _pad2d(g2d, 8, LANES)
    x2dp = _pad2d(x2d, 8, LANES)
    rp, cp = x2dp.shape
    bm = min(BLOCK_ROWS, rp)
    ct = min(BLOCK_CHANNELS, cp)
    grid = (_cdiv(cp, ct), _cdiv(rp, bm))
    gs = effective_grad_scale(spec, numel if numel is not None else x.size, c)
    s2, b2 = _pc_qparams(scale, shift, cp)

    blk = pl.BlockSpec((bm, ct), lambda j, i: (i, j), memory_space=pltpu.VMEM)
    qrow = pl.BlockSpec((1, ct), lambda j, i: (0, j), memory_space=pltpu.VMEM)
    acc = pl.BlockSpec((8, ct), lambda j, i: (0, j), memory_space=pltpu.VMEM)
    out, dx, ds, db = pl.pallas_call(
        functools.partial(_pc_bwd_kernel, spec=spec, init_mode=False,
                          eval_mode=False, n_valid_rows=rows, gs=gs,
                          block_rows=bm, emit_out=True),
        out_shape=(jax.ShapeDtypeStruct(x2dp.shape, x.dtype),
                   jax.ShapeDtypeStruct(x2dp.shape, x.dtype),
                   jax.ShapeDtypeStruct((8, cp), jnp.float32),
                   jax.ShapeDtypeStruct((8, cp), jnp.float32)),
        grid=grid,
        in_specs=[qrow, qrow, blk, blk],
        out_specs=(blk, blk, acc, acc),
        input_output_aliases={3: 0, 2: 1},
        interpret=interpret,
    )(s2, b2, g2dp, x2dp)
    return (_from_rows_channels(out[:rows, :c], x.shape, spec.axis),
            _from_rows_channels(dx[:rows, :c], x.shape, spec.axis),
            jnp.sum(ds[:, :c], axis=0).astype(scale.dtype),
            jnp.sum(db[:, :c], axis=0).astype(shift.dtype))


# --------------------------------------------------------------------------
# Traced-mode-flag kernels: eval/init arrive as SMEM scalars, one compiled
# program covers the whole QAT phase schedule (see functional.fake_quant_traced).
# The extra in-kernel selects are free — the op is HBM-bandwidth-bound.
# --------------------------------------------------------------------------

def _pt_fwd_traced_kernel(s_ref, b_ref, f_ref, x_ref, o_ref, *, spec: QuantSpec):
    s, zp = _pt_scalars(s_ref, b_ref, spec)
    ini = f_ref[0, 1]
    x = x_ref[:].astype(jnp.float32)
    xq = jnp.round(jnp.clip(x / s + zp, float(spec.quant_min), float(spec.quant_max)))
    fq = (xq - zp) * s
    o_ref[:] = jnp.where(ini > 0, x, fq).astype(o_ref.dtype)


def _pt_bwd_traced_kernel(s_ref, b_ref, f_ref, g_ref, x_ref,
                          dx_ref, ds_ref, db_ref, *,
                          spec: QuantSpec, n_valid: int, gs: float,
                          block_rows: int, cols: int = LANES):
    qmin, qmax = float(spec.quant_min), float(spec.quant_max)
    s, zp = _pt_scalars(s_ref, b_ref, spec)
    ev, ini = f_ref[0, 0], f_ref[0, 1]
    g = g_ref[:].astype(jnp.float32)
    x = x_ref[:].astype(jnp.float32)

    xq = jnp.clip(x / s + zp, qmin, qmax)
    mask = (qmin < xq) & (xq < qmax)
    dx_ref[:] = jnp.where(ini > 0, g, jnp.where(mask, g, 0.0)).astype(dx_ref.dtype)

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ds_ref[0, 0] = jnp.float32(0.0)
        db_ref[0, 0] = jnp.float32(0.0)

    row = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0) + i * block_rows
    col = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
    valid = (row * cols + col) < n_valid

    xfq = (jnp.round(xq) - zp) * s
    geff = jnp.where(ini > 0, 2.0 * (xfq - x), g)
    border = jnp.where(xq <= qmin, geff * (qmin - zp), geff * (qmax - zp))
    ds_elem = jnp.where(mask, geff * (xfq - x) / s, border)
    live = (1.0 - ev) * gs
    ds_ref[0, 0] += jnp.sum(jnp.where(valid, ds_elem, 0.0)) * live
    if not spec.symmetric:
        db_elem = jnp.where(mask, 0.0, geff)
        db_ref[0, 0] += jnp.sum(jnp.where(valid, db_elem, 0.0)) * live


def _pc_fwd_traced_kernel(s_ref, b_ref, f_ref, x_ref, o_ref, *, spec: QuantSpec):
    s, zp = _pc_vectors(s_ref, b_ref, spec)
    ini = f_ref[0, 1]
    x = x_ref[:].astype(jnp.float32)
    xq = jnp.round(jnp.clip(x / s + zp, float(spec.quant_min), float(spec.quant_max)))
    fq = (xq - zp) * s
    o_ref[:] = jnp.where(ini > 0, x, fq).astype(o_ref.dtype)


def _pc_bwd_traced_kernel(s_ref, b_ref, f_ref, g_ref, x_ref,
                          dx_ref, ds_ref, db_ref, *,
                          spec: QuantSpec, n_valid_rows: int, gs: float,
                          block_rows: int):
    qmin, qmax = float(spec.quant_min), float(spec.quant_max)
    s, zp = _pc_vectors(s_ref, b_ref, spec)
    ev, ini = f_ref[0, 0], f_ref[0, 1]
    g = g_ref[:].astype(jnp.float32)
    x = x_ref[:].astype(jnp.float32)

    xq = jnp.clip(x / s + zp, qmin, qmax)
    mask = (qmin < xq) & (xq < qmax)
    dx_ref[:] = jnp.where(ini > 0, g, jnp.where(mask, g, 0.0)).astype(dx_ref.dtype)

    ir = pl.program_id(1)

    @pl.when(ir == 0)
    def _():
        ds_ref[:] = jnp.zeros_like(ds_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    row = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0) + ir * block_rows
    valid = row < n_valid_rows

    xfq = (jnp.round(xq) - zp) * s
    geff = jnp.where(ini > 0, 2.0 * (xfq - x), g)
    border = jnp.where(xq <= qmin, geff * (qmin - zp), geff * (qmax - zp))
    ds_elem = jnp.where(mask, geff * (xfq - x) / s, border)
    live = (1.0 - ev) * gs
    bm, ct = g.shape
    ds_ref[:] += jnp.sum(
        jnp.where(valid, ds_elem, 0.0).reshape(bm // 8, 8, ct), axis=0) * live
    if not spec.symmetric:
        db_elem = jnp.where(mask, 0.0, geff)
        db_ref[:] += jnp.sum(
            jnp.where(valid, db_elem, 0.0).reshape(bm // 8, 8, ct), axis=0) * live


def _flags_smem(eval_flag, init_flag) -> jnp.ndarray:
    ev = jnp.asarray(eval_flag, jnp.float32).reshape(())
    ini = jnp.asarray(init_flag, jnp.float32).reshape(())
    return jnp.stack([ev, ini]).reshape(1, 2)


def pallas_forward_traced(x, scale, shift, *, spec: QuantSpec, eval_flag,
                          init_flag, interpret: Optional[bool] = None):
    interpret = _resolve_interpret(interpret)
    if x.dtype == jnp.float16:  # f32 in-kernel, see pallas_forward
        out = pallas_forward_traced(
            x.astype(jnp.float32), scale, shift, spec=spec,
            eval_flag=eval_flag, init_flag=init_flag, interpret=interpret)
        return out.astype(jnp.float16)
    flags = _flags_smem(eval_flag, init_flag)
    if spec.per_channel:
        x2d, rows, c = _to_rows_channels(x, spec.axis)
        x2dp = _pad2d(x2d, 8, LANES)
        rp, cp = x2dp.shape
        bm, ct = min(BLOCK_ROWS, rp), min(BLOCK_CHANNELS, cp)
        grid = (_cdiv(rp, bm), _cdiv(cp, ct))
        s2, b2 = _pc_qparams(scale, shift, cp)
        out = pl.pallas_call(
            functools.partial(_pc_fwd_traced_kernel, spec=spec),
            out_shape=jax.ShapeDtypeStruct(x2dp.shape, x.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, ct), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ct), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((bm, ct), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, ct), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            input_output_aliases={3: 0},  # out↔x, see module docstring
            interpret=interpret,
        )(s2, b2, flags, x2dp)
        return _from_rows_channels(out[:rows, :c], x.shape, spec.axis)
    x2d, n, cols = _to_rows_lanes(x)
    rows = x2d.shape[0]
    bm = _block_rows(FWD_BLOCK_BYTES, cols, rows)
    out = pl.pallas_call(
        functools.partial(_pt_fwd_traced_kernel, spec=spec),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x.dtype),
        grid=(_cdiv(rows, bm),),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        input_output_aliases={3: 0},  # out↔x, see module docstring
        interpret=interpret,
    )(_qp_smem(scale), _qp_smem(shift), flags, x2d)
    return _from_rows_lanes(out, x.shape, n)


def pallas_backward_traced(grad, x, scale, shift, *, spec: QuantSpec,
                           eval_flag, init_flag, numel: Optional[int] = None,
                           interpret: Optional[bool] = None):
    interpret = _resolve_interpret(interpret)
    if grad.dtype == jnp.float16 or x.dtype == jnp.float16:
        dX, dS, dB = pallas_backward_traced(
            grad.astype(jnp.float32), x.astype(jnp.float32), scale, shift,
            spec=spec, eval_flag=eval_flag, init_flag=init_flag, numel=numel,
            interpret=interpret)
        return dX.astype(jnp.float16), dS, dB
    flags = _flags_smem(eval_flag, init_flag)
    if spec.per_channel:
        g2d, rows, c = _to_rows_channels(grad, spec.axis)
        x2d, _, _ = _to_rows_channels(x, spec.axis)
        g2dp, x2dp = _pad2d(g2d, 8, LANES), _pad2d(x2d, 8, LANES)
        rp, cp = x2dp.shape
        bm, ct = min(BWD_BLOCK_ROWS, rp), min(BLOCK_CHANNELS, cp)
        grid = (_cdiv(cp, ct), _cdiv(rp, bm))
        gs = effective_grad_scale(spec, numel if numel is not None else x.size, c)
        s2, b2 = _pc_qparams(scale, shift, cp)
        dx, ds8, db8 = pl.pallas_call(
            functools.partial(_pc_bwd_traced_kernel, spec=spec,
                              n_valid_rows=rows, gs=gs, block_rows=bm),
            input_output_aliases={3: 0},
            out_shape=(
                jax.ShapeDtypeStruct(x2dp.shape, x.dtype),
                jax.ShapeDtypeStruct((8, cp), jnp.float32),
                jax.ShapeDtypeStruct((8, cp), jnp.float32),
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, ct), lambda j, i: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ct), lambda j, i: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((bm, ct), lambda j, i: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, ct), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((bm, ct), lambda j, i: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, ct), lambda j, i: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, ct), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(s2, b2, flags, g2dp, x2dp)
        dX = _from_rows_channels(dx[:rows, :c], x.shape, spec.axis)
        dS = jnp.sum(ds8[:, :c], axis=0).astype(scale.dtype)
        dB = jnp.sum(db8[:, :c], axis=0).astype(shift.dtype)
        return dX, dS, dB
    g2d, n, cols = _to_rows_lanes(grad)
    x2d, _, _ = _to_rows_lanes(x)
    rows = x2d.shape[0]
    bm = _block_rows(BWD_BLOCK_BYTES, cols, rows)
    gs = effective_grad_scale(spec, numel if numel is not None else x.size)
    dx, ds, db = pl.pallas_call(
        functools.partial(_pt_bwd_traced_kernel, spec=spec, n_valid=n, gs=gs,
                          block_rows=bm, cols=cols),
        input_output_aliases={3: 0},
        out_shape=(
            jax.ShapeDtypeStruct(x2d.shape, x.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        grid=(_cdiv(rows, bm),),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bm, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(_qp_smem(scale), _qp_smem(shift), flags, g2d, x2d)
    dX = _from_rows_lanes(dx, x.shape, n)
    dS = ds.reshape(scale.shape).astype(scale.dtype)
    dB = db.reshape(shift.shape).astype(shift.dtype)
    return dX, dS, dB
