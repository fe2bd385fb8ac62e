"""Paged KV cache: block-table indirection over fixed-size page pools.

The dense caches (``serve.decode.init_kv_cache``) reserve ``B x max_len`` rows
per layer no matter how long each sequence actually is, and the engines'
prefix feature COPIES the shared prefix into every slot's rows.  This module
is the PagedAttention formulation instead (public technique: vLLM /
TPU-serving block tables), shaped for XLA's static-shape world:

* each layer owns K/V **page pools** — ``(num_pages, KVH, page_size, hd)``
  arrays (plus ``(num_pages, KVH, page_size)`` scale pools when quantized) —
  and all layers share ONE **block table** ``(B, pages_per_slot) int32``
  mapping a slot's logical page j to a pool page id (layers allocate in
  lockstep, so a single table serves every layer);
* HBM for the cache scales with pages *in use*, not ``B x max_len``: the
  table is host-managed (the engine's page allocator), and a pool page can
  back ANY (slot, logical-page) pair;
* a shared prompt prefix is shared by POINTING multiple slots' tables at the
  same pool pages — zero copies (only a trailing partially-filled page needs
  a per-slot copy, because later writes would mutate it);
* attention reads through the table: the Pallas kernel walks a slot's pages
  via scalar-prefetch indices (the block table lands in SMEM before the grid
  runs, so each (batch, kv-head) program DMAs exactly its own pages — the
  same one-HBM-pass online-softmax body as ``serve.attention``), and the XLA
  oracle path gathers pages into the dense layout and reuses the einsum
  formulation bit-for-bit.

Quantized pools use the dense caches' exact write scheme — per
(b, head, position) symmetric int8 / nibble-packed int4 rows
(models/zoo.py::QuantTransformerBlock q8/q4) — so paged and dense layouts
hold IDENTICAL bytes for the same tokens, page permutation being pure
relabeling (pinned in tests/test_paged.py).

The reference has no serving runtime at all (SURVEY.md §5); this extends the
north-star serving path (BASELINE.json tokens/s).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .attention import (_MASK, _attn_kernel, _decode_attention_xla,
                        _resolve_interpret)

__all__ = ["PagedKVLayer", "init_paged_cache", "paged_update",
           "paged_attention", "with_table", "PageAllocator"]


@struct.dataclass
class PagedKVLayer:
    """One layer's paged cache: K/V pools + the (shared) block table.

    ``kp``/``vp``: (P, KVH, ps, hd) float or int8, or (P, KVH, ps, hd//2)
    uint8 nibble-packed int4.  ``ks``/``vs``: (P, KVH, ps) f32 per-row scales
    (None for float pools).  ``table``: (B, pages_per_slot) int32 pool page
    ids — logical position ``pos`` of slot ``b`` lives at pool page
    ``table[b, pos // ps]``, row ``pos % ps``.
    """

    kp: jnp.ndarray
    vp: jnp.ndarray
    table: jnp.ndarray
    ks: Optional[jnp.ndarray] = None
    vs: Optional[jnp.ndarray] = None
    page_size: int = struct.field(pytree_node=False, default=1024)

    @property
    def quantized(self) -> bool:
        return self.ks is not None

    @property
    def int4(self) -> bool:
        return self.quantized and self.kp.dtype == jnp.uint8


def init_paged_cache(model, batch_size: int, *, page_size: int = 1024,
                     num_pages: Optional[int] = None, dtype=jnp.float32,
                     max_len: Optional[int] = None, table=None):
    """Zero paged cache for ``QuantTransformerLM``-shaped models: a tuple of
    ``model.depth`` :class:`PagedKVLayer` (per-layer pools, ONE shared
    table).

    Defaults give the dense-equivalent layout: ``num_pages = batch_size *
    ceil(max_len / page_size)`` with slot ``b``'s logical page ``j`` at pool
    page ``b * pages_per_slot + j`` — functionally identical to
    ``init_kv_cache`` (pinned in tests), so plain ``prefill``/decode work
    unchanged.  Engines pass a smaller ``num_pages`` and manage ``table``
    with :class:`PageAllocator`."""
    L = model.max_len if max_len is None else max_len
    ps = int(page_size)
    pps = -(-L // ps)  # pages per slot
    P = batch_size * pps if num_pages is None else int(num_pages)
    hd = model.dim // model.num_heads
    kvh = getattr(model, "num_kv_heads", None) or model.num_heads
    if table is None:
        if P < batch_size * pps:
            raise ValueError(
                f"num_pages={P} cannot back the default linear table "
                f"({batch_size} slots x {pps} pages); pass an explicit table")
        table = jnp.arange(batch_size * pps, dtype=jnp.int32).reshape(
            batch_size, pps)
    else:
        table = jnp.asarray(table, jnp.int32)
        if table.shape[0] != batch_size:
            raise ValueError(f"table rows {table.shape[0]} != batch "
                             f"{batch_size}")
    name = dtype if isinstance(dtype, str) else np.dtype(dtype).name

    # Every layer gets its OWN buffers (incl. its table copy): the engines
    # donate the whole cache pytree to their compiled programs, and XLA
    # rejects the same buffer donated twice.
    def mk():
        if name == "int4":
            if hd % 2:
                raise ValueError(
                    "int4 paged cache needs an even head_dim "
                    f"(got {hd}): values are nibble-packed in pairs")
            return dict(kp=jnp.zeros((P, kvh, ps, hd // 2), jnp.uint8),
                        vp=jnp.zeros((P, kvh, ps, hd // 2), jnp.uint8),
                        ks=jnp.zeros((P, kvh, ps), jnp.float32),
                        vs=jnp.zeros((P, kvh, ps), jnp.float32))
        if np.dtype(dtype) == np.int8:
            return dict(kp=jnp.zeros((P, kvh, ps, hd), jnp.int8),
                        vp=jnp.zeros((P, kvh, ps, hd), jnp.int8),
                        ks=jnp.zeros((P, kvh, ps), jnp.float32),
                        vs=jnp.zeros((P, kvh, ps), jnp.float32))
        return dict(kp=jnp.zeros((P, kvh, ps, hd), dtype),
                    vp=jnp.zeros((P, kvh, ps, hd), dtype))

    return tuple(PagedKVLayer(table=jnp.array(table, copy=True),
                              page_size=ps, **mk())
                 for _ in range(model.depth))


def with_table(cache, table) -> tuple:
    """Every layer of ``cache`` re-pointed at ``table`` (the engine installs
    its allocator's host table before each dispatched step).  Each layer
    holds its own COPY so the cache stays donation-safe (one buffer must not
    appear twice in a donated pytree)."""
    table = jnp.asarray(table, jnp.int32)
    return tuple(layer.replace(table=jnp.array(table, copy=True))
                 for layer in cache)


def _q8(a):
    """Per-(b, head, position) symmetric int8 — models/zoo.py q8, bit-equal
    so paged and dense caches hold identical bytes."""
    s = jnp.max(jnp.abs(a), axis=-1) / 127.0
    s = jnp.maximum(s, jnp.finfo(jnp.float32).tiny)
    data = jnp.clip(jnp.round(a / s[..., None]), -127, 127)
    return data.astype(jnp.int8), s.astype(jnp.float32)


def _q4(a):
    """models/zoo.py q4: [-7, 7] rows, two's-complement nibble pairs."""
    s = jnp.max(jnp.abs(a), axis=-1) / 7.0
    s = jnp.maximum(s, jnp.finfo(jnp.float32).tiny)
    data = jnp.clip(jnp.round(a / s[..., None]), -7, 7).astype(jnp.int32)
    n = data & 0xF
    return (n[..., 0::2] | (n[..., 1::2] << 4)).astype(jnp.uint8), \
        s.astype(jnp.float32)


def paged_update(layer: PagedKVLayer, k: jnp.ndarray, v: jnp.ndarray,
                 cache_index) -> PagedKVLayer:
    """Write ``t`` new K/V rows per slot through the block table.

    ``k``/``v``: (B, KVH, t, hd) float; ``cache_index``: scalar or (B,)
    int32 position of the FIRST new token per slot.  Rows are quantized on
    write when the pools are int8/int4 (same math as the dense cache).
    Slots must own the pages they write (the allocator's contract — shared
    prefix pages are read-only by construction)."""
    b, kvh, t, hd = k.shape
    ps = layer.page_size
    idx = jnp.asarray(cache_index, jnp.int32)
    pos = (jnp.broadcast_to(idx, (b,))[:, None] if idx.ndim == 0
           else idx[:, None]) + jnp.arange(t)[None, :]       # (B, t) global
    page = jnp.take_along_axis(layer.table, pos // ps, axis=1)  # (B, t)
    off = pos % ps

    if layer.quantized:
        kq, ks = (_q4 if layer.int4 else _q8)(k)
        vq, vs = (_q4 if layer.int4 else _q8)(v)
    else:
        kq, vq = k.astype(layer.kp.dtype), v.astype(layer.vp.dtype)
        ks = vs = None

    pg = page[:, :, None]                       # (B, t, 1)
    of = off[:, :, None]
    hh = jnp.arange(kvh)[None, None, :]         # broadcast → (B, t, KVH)

    def scat(pool, rows):                        # rows (B, KVH, t, ...)
        return pool.at[pg, hh, of].set(rows.transpose(0, 2, 1, 3))

    def scat_s(pool, rows):                      # rows (B, KVH, t)
        return pool.at[pg, hh, of].set(rows.transpose(0, 2, 1))

    new = dict(kp=scat(layer.kp, kq), vp=scat(layer.vp, vq))
    if layer.quantized:
        new.update(ks=scat_s(layer.ks, ks), vs=scat_s(layer.vs, vs))
    return layer.replace(**new)


def _gather_dense(layer: PagedKVLayer):
    """Pools gathered into the dense (B, KVH, L, ...) layout — the XLA
    oracle path (and the CPU fallback).  L = pages_per_slot * page_size."""
    b, pps = layer.table.shape

    def g(pool):
        x = pool[layer.table]                    # (B, pps, KVH, ps, ...)
        x = jnp.moveaxis(x, 2, 1)                # (B, KVH, pps, ps, ...)
        return x.reshape(x.shape[0], x.shape[1], pps * layer.page_size,
                         *x.shape[4:])

    if layer.quantized:
        return (g(layer.kp), g(layer.ks)), (g(layer.vp), g(layer.vs))
    return g(layer.kp), g(layer.vp)


def paged_attention(q: jnp.ndarray, layer: PagedKVLayer, cache_index, *,
                    impl: str = "auto", precision=None,
                    window: Optional[int] = None,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """Causal attention of ``q`` (B, H, t, hd) against a paged cache.

    ``impl='xla'`` gathers pages to the dense layout and runs the einsum
    oracle (serve/attention.py) — correct everywhere, materializes a dense
    copy.  ``'pallas'`` runs the fused flash-decoding kernel directly over
    the pools: the expanded block table is a scalar-prefetch operand, so
    each (batch, kv-head) program DMAs its own pages once, at carrier
    width.  ``'auto'``: pallas on TPU, xla elsewhere.

    Unreferenced / not-yet-written pool rows never contribute: their key
    positions fail the causal ``kpos <= qpos`` test, the score is masked to
    -1e9, and exp(-1e9 - m) underflows to exactly 0 in f32 (pools are
    zero-initialized and only ever hold finite rows, so 0 * row == 0)."""
    b, h, t, hd = q.shape
    kvh = layer.kp.shape[1]
    if h % kvh:
        raise ValueError(f"num_heads {h} not divisible by kv heads {kvh}")
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        ck, cv = _gather_dense(layer)
        return _decode_attention_xla(q, ck, cv, cache_index, window=window)

    ps = layer.page_size
    pps = layer.table.shape[1]
    g = h // kvh
    gt = g * t
    idx = jnp.asarray(cache_index, jnp.int32)
    qpos = (jnp.broadcast_to(idx, (b,)) if idx.ndim == 0 else idx)
    qpos = jnp.repeat(qpos, kvh).reshape(b * kvh, 1)
    # expanded table: pool row of (slot, kv-head, logical page) in the
    # (P*KVH, ps, ...) pool view — plain SMEM lookups keep the kernel's
    # block index maps free of division (Mosaic constraint)
    ebt = (layer.table[:, None, :] * kvh
           + jnp.arange(kvh, dtype=jnp.int32)[None, :, None]
           ).reshape(b * kvh, pps)

    int4 = layer.int4
    qr = q.reshape(b, kvh, gt, hd).reshape(b * kvh, gt, hd)
    if int4:
        hd2 = hd // 2
        qr = jnp.concatenate([qr[..., 0::2], qr[..., 1::2]], axis=-1)
    else:
        hd2 = hd
    P = layer.kp.shape[0]
    kd = layer.kp.reshape(P * kvh, ps, layer.kp.shape[-1])
    vd = layer.vp.reshape(P * kvh, ps, layer.vp.shape[-1])
    if layer.quantized:
        ks = layer.ks.astype(jnp.float32).reshape(P * kvh, 1, ps)
        vs = layer.vs.astype(jnp.float32).reshape(P * kvh, 1, ps)
        sblock, sindex = (1, 1, ps), (lambda i, j, e, p: (e[i, j], 0, 0))
    else:
        ks = jnp.ones((1, 1, 1), jnp.float32)
        vs = ks
        sblock, sindex = (1, 1, 1), (lambda i, j, e, p: (0, 0, 0))

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    scratch = [pltpu.VMEM((gt, hd), jnp.float32),
               pltpu.VMEM((gt, 128), jnp.float32),
               pltpu.VMEM((gt, 128), jnp.float32)]
    nsteps = pps if window is None else min(-(-window // ps) + 1, pps)
    if window is not None and nsteps < pps:
        # BLOCK SKIPPING (serve/attention.py): walk only the window's pages
        # — decode streams O(window) pool bytes per program.  fb (first
        # logical page per row) is precomputed in XLA; index maps clamp
        # past-the-end duplicates through the SAME expanded-table lookup
        # (still no division inside Mosaic index maps).
        fb = jnp.clip((qpos[:, :1] - (window - 1)) // ps, 0,
                      pps - 1).astype(jnp.int32)
        kernel = functools.partial(
            _attn_kernel, nl=nsteps, t=t, block_l=ps, length=pps * ps,
            scale=1.0 / float(hd) ** 0.5, quantized=layer.quantized,
            int4=int4, hd2=hd2, precision=precision, window=window,
            nl_total=pps)

        def kern(ebt_ref, qpos_ref, fb_ref, *rest):
            kernel(qpos_ref, fb_ref, *rest)

        def pgi(i, j, e, qp, f):
            return (e[i, jnp.minimum(f[i, 0] + j, pps - 1)], 0, 0)

        if layer.quantized:
            def sidx(i, j, e, qp, f):
                return (e[i, jnp.minimum(f[i, 0] + j, pps - 1)], 0, 0)
        else:
            def sidx(i, j, e, qp, f):
                return (0, 0, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b * kvh, nsteps),
            in_specs=[
                pl.BlockSpec((1, gt, hd), lambda i, j, e, qp, f: (i, 0, 0)),
                pl.BlockSpec((1, ps, kd.shape[-1]), pgi),
                pl.BlockSpec(sblock, sidx),
                pl.BlockSpec((1, ps, vd.shape[-1]), pgi),
                pl.BlockSpec(sblock, sidx),
            ],
            out_specs=pl.BlockSpec((1, gt, hd),
                                   lambda i, j, e, qp, f: (i, 0, 0)),
            scratch_shapes=scratch,
        )
        args = (ebt, qpos, fb, qr, kd, ks, vd, vs)
    else:
        kernel = functools.partial(
            _attn_kernel, nl=pps, t=t, block_l=ps, length=pps * ps,
            scale=1.0 / float(hd) ** 0.5, quantized=layer.quantized,
            int4=int4, hd2=hd2, precision=precision, window=window)

        def kern(ebt_ref, qpos_ref, *rest):
            # scalar-prefetch refs lead; _attn_kernel wants qpos first and
            # never touches the table (the index maps consumed it)
            kernel(qpos_ref, *rest)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b * kvh, pps),
            in_specs=[
                pl.BlockSpec((1, gt, hd), lambda i, j, e, p: (i, 0, 0)),
                pl.BlockSpec((1, ps, kd.shape[-1]),
                             lambda i, j, e, p: (e[i, j], 0, 0)),
                pl.BlockSpec(sblock, sindex),
                pl.BlockSpec((1, ps, vd.shape[-1]),
                             lambda i, j, e, p: (e[i, j], 0, 0)),
                pl.BlockSpec(sblock, sindex),
            ],
            out_specs=pl.BlockSpec((1, gt, hd),
                                   lambda i, j, e, p: (i, 0, 0)),
            scratch_shapes=scratch,
        )
        args = (ebt, qpos, qr, kd, ks, vd, vs)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b * kvh, gt, hd), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_resolve_interpret(interpret),
    )(*args)

    if int4:
        out = jnp.stack([out[..., :hd2], out[..., hd2:]],
                        axis=-1).reshape(b * kvh, gt, hd)
    return out.reshape(b, kvh, gt, hd).reshape(b, h, t, hd)


class PageAllocator:
    """Host-side page bookkeeping for the engines (numpy, no jax).

    Pages carry a refcount so a shared prefix's pages can back many slots at
    once: ``share`` bumps, ``free`` decrements and returns pages to the free
    list at zero.  The allocator never touches device memory — it hands out
    page ids; the engine installs them into the block table it ships with
    each step (:func:`with_table`)."""

    def __init__(self, num_pages: int):
        self.num_pages = int(num_pages)
        self._free = list(range(self.num_pages - 1, -1, -1))
        self._refs = np.zeros(self.num_pages, np.int32)

    @property
    def pages_free(self) -> int:
        return len(self._free)

    def alloc(self, n: int):
        """n fresh pages (refcount 1).  Raises when the pool is exhausted —
        the engine's admission control must check ``pages_free`` first."""
        if n > len(self._free):
            raise RuntimeError(
                f"page pool exhausted: need {n}, have {len(self._free)}")
        out = [self._free.pop() for _ in range(n)]
        self._refs[out] = 1
        return out

    def share(self, pages) -> None:
        """Bump refcounts (a new slot now points at these pages)."""
        for p in pages:
            if self._refs[p] <= 0:
                raise RuntimeError(f"page {p} is not live")
            self._refs[p] += 1

    def free(self, pages) -> None:
        for p in pages:
            if self._refs[p] <= 0:
                raise RuntimeError(f"double free of page {p}")
            self._refs[p] -= 1
            if self._refs[p] == 0:
                self._free.append(int(p))
