"""Paged continuous-batching decode engine (block-table KV memory).

``DecodeEngine`` (decode.py) reserves a dense ``(max_batch, H, max_len, hd)``
cache per layer — every slot pays for ``max_len`` rows no matter how short its
request, and a shared Prefix is COPIED into each admission's slot cache.
:class:`PagedDecodeEngine` keeps the same dispatcher discipline (token-level
continuous batching, chunked non-blocking admission, prefix reuse, eos
retirement) over the paged layout of ``serve/paged.py`` instead:

* each layer's K/V live in **page pools**; one host-managed block table maps
  (slot, logical page) → pool page.  Cache HBM scales with ``num_pages`` —
  the pages actual requests need — not ``max_batch × max_len``;
* admission reserves a request's pages up front (``ceil(end/ps)`` for all the
  positions it will ever write, including chunk padding and the ``n_new``
  decode tail) and frees them at retirement.  Reservation up front means no
  mid-decode allocation and no per-step table updates — the table changes
  only at admission/retire boundaries, so the hot decode step is untouched;
* when the pool cannot back the next queued request, admission DEFERS it
  (strict FIFO — later requests do not jump a starved head) until
  retirements free pages, instead of failing it;
* ``register_prefix`` prefills a shared prefix ONCE into its own pages;
  ``submit(suffix, prefix=h)`` then points the new slot's table entries at
  the handle's full pages — **zero-copy sharing** (refcounted), vs. the dense
  engine's full per-slot copy.  Only a trailing partially-filled prefix page
  is copied (later suffix writes would mutate it under every sharer);
* admission chunks write STRAIGHT into the slot's reserved pool pages
  through a one-row table — there is no private slot cache and no
  final-chunk copy into the global cache (the dense engine's
  ``_final_chunk`` scatter disappears; activation is just a table row).

Numerics are unchanged: paged and dense caches hold identical bytes for the
same tokens (serve/paged.py, pinned in tests/test_paged.py), so this engine
is bit-exact vs. ``DecodeEngine`` for the same request stream — pinned in
tests/test_paged_engine.py.

One pool page (index ``num_pages``) is reserved as the DUMMY page: parked
slots and not-yet-written logical pages point at it.  Parked decode steps
write garbage there (the overwrite-before-exposure argument of decode.py),
and reads through dummy entries are killed by the causal mask — the page
only ever holds finite rows, so masked scores underflow to exactly 0.

The reference has no serving runtime at all (SURVEY.md §5: no scheduler, no
batching, no decode); this extends the north-star serving path
(BASELINE.json tokens/s) with the PagedAttention memory discipline (public
technique: vLLM / TPU block-table serving).
"""

from __future__ import annotations

import queue
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .decode import (DecodeEngine, Prefix, SpeculativeDecodeEngine,
                     _PendingAdmit)
from .paged import PageAllocator, init_paged_cache, with_table

__all__ = ["PagedDecodeEngine", "PagedPrefix",
           "PagedSpeculativeDecodeEngine"]


class PagedPrefix(Prefix):
    """A shared prefix living in its own pool pages (no cache copy).

    ``pages[: length // page_size]`` are complete, immutable pages that
    admissions point their table rows at directly (refcount-shared); a
    trailing partial page (``length % page_size`` rows) is copied per
    admission.  The handle owns one reference per page for the engine's
    lifetime (pages return to the pool when the engine closes)."""

    __slots__ = ("pages", "page_size")

    def __init__(self, tokens, length, owner, pages, page_size):
        super().__init__(tokens, length, caches=(), owner=owner)
        self.pages = pages
        self.page_size = page_size


class PagedDecodeEngine(DecodeEngine):
    """`DecodeEngine` with paged KV memory.  See the module docstring.

    Args (beyond :class:`DecodeEngine`'s):
      num_pages: pool pages per layer.  Each page backs ``page_size`` token
        positions of one slot (one extra dummy page is added internally).
        The dense-equivalent capacity is ``max_batch * ceil(max_len /
        page_size)``; provision LESS when typical requests are much shorter
        than ``max_len`` — that underprovisioning is the point of paging.
      page_size: positions per page.  On TPU this is the fused attention
        kernel's K/V block length (pages are not contiguous in the pool, so
        one block fetch cannot span pages): small pages mean many small DMAs
        — measured 3.5x/2.0x/1.27x/1.0x the dense kernel's per-step cost at
        128/256/512/1024 isolated (docs/measurements/paged_attention_tpu.json)
        and 0.61x/0.88x of dense decode throughput IN-MODEL at 512/1024
        (docs/measurements/paged_pagesize_inmodel_tpu.json — B=8, L=2048,
        int8 pools).  Default 1024 (the measured knee); drop it only when
        allocation granularity matters more than decode latency.  Keep it a
        multiple of 8 (sublane tiling).

    A request needing more pages than the whole pool is rejected at
    ``submit``; one needing more than currently free is admitted later,
    when retirements free pages (strict FIFO).  Note prefix handles hold
    their pages until the engine closes — a head request can starve if
    handles pin too much of the pool.
    """

    def __init__(self, model, variables, *, num_pages: int,
                 page_size: int = 1024, **kwargs):
        if page_size < 1:
            raise ValueError("page_size must be >= 1")
        self.page_size = int(page_size)
        self.num_pages = int(num_pages)
        self._deferred: list = []  # FIFO of page-starved requests
        # sliding-window models (zoo.py attn_window): pages whose every
        # position slid below every future query's window are dead — free
        # them mid-flight so deferred admissions unblock before retirement
        self._window = getattr(model, "attn_window", None)
        super().__init__(model, variables, **kwargs)
        self.stats["admissions_deferred"] = 0
        self.stats["prefix_pages_shared"] = 0
        self.stats["window_pages_freed"] = 0

    # --------------------------------------------------------- device state

    def _build_device_state(self, cache_dtype):
        ps = self.page_size
        self._pps = -(-self.max_len // ps)  # table width (logical pages)
        if self.num_pages < 1:
            raise ValueError("num_pages must be >= 1")
        self._dummy = self.num_pages  # extra page: parked/unwritten entries
        self._alloc = PageAllocator(self.num_pages)
        self._table = np.full((self.max_batch, self._pps), self._dummy,
                              np.int32)
        self._cache = init_paged_cache(
            self.model, self.max_batch, page_size=ps,
            num_pages=self.num_pages + 1, dtype=cache_dtype,
            table=self._table)
        self._pos = jnp.full((self.max_batch,), self.max_len - 1, jnp.int32)
        self._tok = jnp.zeros((self.max_batch,), jnp.int32)
        pick, sampled, model = self._pick, self._sampled, self.model

        def _chunk(variables, cache, tokens, start):
            """One admission chunk, writing straight into the slot's pool
            pages: ``cache`` is the engine cache re-pointed at the slot's
            one-row table."""
            _, cache = model.apply(variables, tokens, cache=cache,
                                   cache_index=start)
            return cache

        def _final_chunk(variables, cache, tokens, start, true_len, key):
            """Last admission chunk: same writes, plus the first token.  No
            slot-cache→global copy — the rows already live in the slot's
            reserved pages; activation is just the table row."""
            logits, cache = model.apply(variables, tokens, cache=cache,
                                        cache_index=start)
            last = jax.lax.dynamic_index_in_dim(
                logits[0], true_len - 1 - start, axis=0, keepdims=True)
            first = (pick(last, key) if sampled else pick(last))[0]
            return cache, first

        def _step(variables, cache, toks, pos, key):
            logits, cache = model.apply(variables, toks[:, None], cache=cache,
                                        cache_index=pos)
            nxt = pick(logits[:, -1], key) if sampled else pick(logits[:, -1])
            return cache, nxt, jnp.minimum(pos + 1, self.max_len - 1)

        def _copy_page(cache, src, dst):
            """pool[dst] = pool[src] in every pool of every layer (a partial
            prefix page materialized for one admission; src/dst are traced,
            so all copies share one compile)."""
            def cp(pool):
                row = jax.lax.dynamic_index_in_dim(pool, src, 0,
                                                   keepdims=False)
                return jax.lax.dynamic_update_index_in_dim(pool, row, dst, 0)

            return tuple(
                layer.replace(kp=cp(layer.kp), vp=cp(layer.vp),
                              **({"ks": cp(layer.ks), "vs": cp(layer.vs)}
                                 if layer.quantized else {}))
                for layer in cache)

        self._chunk_fn = jax.jit(_chunk, donate_argnums=(1,))
        self._final_fn = jax.jit(_final_chunk, donate_argnums=(1,))
        self._step_fn = jax.jit(_step, donate_argnums=(1,))
        self._copy_fn = jax.jit(_copy_page, donate_argnums=(0,))

    def _sync_table(self):
        """Install the host block table into the device cache (admission /
        retirement boundaries only — the decode step never changes it)."""
        self._cache = with_table(self._cache, jnp.asarray(self._table))

    # ---------------------------------------------------------- page budget

    def _pages_needed(self, size: int, n_new: int, prefix) -> int:
        """Fresh pool pages an admission must allocate: everything from the
        first non-shared logical page through the last position the request
        will ever write (chunk padding and the decode tail included)."""
        base = prefix.length if prefix is not None else 0
        end = base + max(self._padded_admit_len(size), size + n_new)
        shared = (base // self.page_size) if prefix is not None else 0
        return -(-end // self.page_size) - shared

    # ------------------------------------------------------------------ API

    def warmup(self):
        """Compile the step/chunk/final/copy programs up front.  Resets the
        pools and positions; must run before requests are in flight."""
        with self._state_lock:
            if (any(s is not None for s in self._slots) or self._pending
                    or self._deferred):
                raise RuntimeError(
                    "warmup() must run before requests are in flight "
                    "(it resets the KV cache)")
            zeros = jnp.zeros((self.max_batch,), jnp.int32)
            cache, nxt, _ = self._step_fn(self.variables, self._cache, zeros,
                                          self._pos, self._next_key())
            jax.block_until_ready(nxt)
            # chunk programs run against a one-row all-dummy table: the
            # writes land in the dummy page (finite garbage, never exposed)
            row = np.full((1, self._pps), self._dummy, np.int32)
            for c in sorted({self._chunk_len(b) for b in self.buckets}):
                toks = jnp.zeros((1, c), jnp.int32)
                sc = with_table(cache, jnp.asarray(row))
                sc = self._chunk_fn(self.variables, sc, toks,
                                    jnp.asarray(0, jnp.int32))
                sc, first = self._final_fn(
                    self.variables, sc, toks, jnp.asarray(0, jnp.int32),
                    jnp.asarray(1, jnp.int32), self._next_key())
                jax.block_until_ready(first)
                cache = sc
            cache = self._copy_fn(cache, jnp.asarray(self._dummy, jnp.int32),
                                  jnp.asarray(self._dummy, jnp.int32))
            self._cache = jax.tree.map(jnp.zeros_like, cache)
            self._sync_table()  # zeros_like wiped the table leaf; restore
            self._pos = jnp.full((self.max_batch,), self.max_len - 1,
                                 jnp.int32)

    def register_prefix(self, tokens) -> PagedPrefix:
        """Prefill a shared prefix once into its OWN pool pages and return a
        zero-copy handle: later admissions point their table rows at the
        handle's complete pages instead of copying the cache
        (``DecodeEngine.register_prefix`` copies the whole prefilled cache
        per admission).  Raises when the pool cannot supply the pages.  The
        handle's pages stay reserved for the engine's lifetime."""
        tokens, padded, c, n_chunks = self._stage_prefix_tokens(tokens)
        n_pages = -(-tokens.size // self.page_size)
        with self._state_lock:
            pages = self._alloc.alloc(n_pages)  # raises when pool too small
        row = np.full((1, self._pps), self._dummy, np.int32)
        row[0, :n_pages] = pages
        # positions >= tokens.size in the padded chunks land in the partial
        # page (copied per admission, overwritten before exposure) or in
        # dummy entries — never in a shared complete page.
        for i in range(n_chunks):
            with self._state_lock:
                try:
                    sc = with_table(self._cache, jnp.asarray(row))
                    sc = self._chunk_fn(
                        self.variables, sc,
                        jnp.asarray(padded[:, i * c:(i + 1) * c]),
                        jnp.asarray(i * c, jnp.int32))
                    self._cache = with_table(sc, jnp.asarray(self._table))
                except Exception:
                    with self._lifecycle_lock:
                        self._stop = True  # pools possibly donated
                    raise
        jax.block_until_ready(jax.tree.leaves(self._cache)[0])
        return PagedPrefix(tokens, int(tokens.size), self, pages,
                           self.page_size)

    def _check_prefix(self, prefix, n_models: int):
        if not isinstance(prefix, PagedPrefix):
            raise ValueError("prefix must come from PagedDecodeEngine."
                             "register_prefix()")
        if prefix.owner is not self:
            raise ValueError(
                "prefix was registered on a different engine; call "
                "register_prefix() on this one")
        if prefix.page_size != self.page_size:
            raise ValueError("prefix page_size does not match the engine's")

    def submit(self, prompt, n_new: int, *, prefix: Optional[Prefix] = None):
        """As :meth:`DecodeEngine.submit`; additionally rejects requests
        whose page reservation could never fit the pool (requests that fit
        the pool but not the currently-free pages are deferred, not
        failed)."""
        size = np.asarray(prompt).size
        if (0 < size <= self.buckets[-1]
                and (prefix is None or isinstance(prefix, PagedPrefix))):
            need = self._pages_needed(size, n_new, prefix)
            if need > self.num_pages:
                raise ValueError(
                    f"request needs {need} pages (> pool {self.num_pages}); "
                    "raise num_pages or shorten prompt/n_new")
        return super().submit(prompt, n_new, prefix=prefix)

    # ----------------------------------------------------------- dispatcher

    def _stage_admissions(self, reserved: set):
        """FIFO admission with page-pool backpressure: a request whose
        reservation exceeds the free pages WAITS (and blocks later requests
        — no head-of-line bypass, so admission order stays deterministic)."""
        free_slots = [s for s in range(self.max_batch)
                      if self._slots[s] is None and s not in reserved]
        while free_slots:
            if self._deferred:
                req, from_deferred = self._deferred[0], True
            else:
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    return
                from_deferred = False
            if req.future.done():  # cancelled while queued/deferred
                if from_deferred:
                    self._deferred.pop(0)
                continue
            need = self._pages_needed(req.prompt.size, req.n_new, req.prefix)
            if need > self._alloc.pages_free:
                if not from_deferred:
                    self._deferred.append(req)
                    self.stats["admissions_deferred"] += 1
                return
            if from_deferred:
                self._deferred.pop(0)
            slot = free_slots.pop(0)
            try:
                self._start_admit(req, slot)
                reserved.add(slot)
            except Exception as e:  # pragma: no cover
                if not req.future.done():
                    req.future.set_exception(e)

    def _start_admit(self, req, slot: int):
        """Reserve the slot AND its pages; build the table row (shared
        prefix pages + a copied partial page + fresh pages + dummy fill)."""
        ps = self.page_size
        b = next(b for b in self.buckets if b >= req.prompt.size)
        c = self._chunk_len(b)
        n_chunks = -(-req.prompt.size // c)
        padded = np.zeros((1, n_chunks * c), np.int32)
        padded[0, : req.prompt.size] = req.prompt
        base = req.prefix.length if req.prefix is not None else 0
        fresh = self._alloc.alloc(
            self._pages_needed(req.prompt.size, req.n_new, req.prefix))
        row = np.full(self._pps, self._dummy, np.int32)
        owned = list(fresh)
        if req.prefix is not None:
            shared = base // ps
            shared_pages = list(req.prefix.pages[:shared])
            self._alloc.share(shared_pages)
            owned += shared_pages
            row[:shared] = shared_pages
            row[shared:shared + len(fresh)] = fresh
            if base % ps:  # materialize the partial prefix page
                try:
                    self._cache = self._copy_fn(
                        self._cache,
                        jnp.asarray(req.prefix.pages[shared], jnp.int32),
                        jnp.asarray(fresh[0], jnp.int32))
                except Exception:
                    with self._lifecycle_lock:
                        self._stop = True  # pools possibly donated
                    raise
            self.stats["prefix_pages_shared"] += shared
        else:
            row[: len(fresh)] = fresh
        req.pages = owned
        req.slot = slot
        self._table[slot, :] = row
        self._sync_table()
        self._pending.append(_PendingAdmit(
            req=req, slot=slot, slot_cache=None, chunk_idx=0,
            n_chunks=n_chunks, padded=padded, c=c,
            steps_at_start=self.stats["steps"], base=base))

    def _advance_admission(self, p):
        """One chunk, written directly into the slot's reserved pages.  The
        pools flow linearly (donated) chunk → step → chunk, so a failed
        chunk is FATAL to the engine (the pools may already be donated) —
        unlike the dense engine, where a chunk touches only a private
        slot cache."""
        i = p.chunk_idx
        toks = jnp.asarray(p.padded[:, i * p.c:(i + 1) * p.c])
        start = jnp.asarray(p.base + i * p.c, jnp.int32)
        row = jnp.asarray(self._table[p.slot: p.slot + 1])
        sc = with_table(self._cache, row)
        try:
            if i < p.n_chunks - 1:
                sc = self._chunk_fn(self.variables, sc, toks, start)
                p.chunk_idx += 1
            else:
                sc, first = self._final_fn(
                    self.variables, sc, toks, start,
                    jnp.asarray(p.base + p.req.prompt.size, jnp.int32),
                    self._next_key())
        except Exception:
            with self._lifecycle_lock:
                self._stop = True  # pools possibly donated: unrecoverable
            raise
        self._cache = with_table(sc, jnp.asarray(self._table))
        if i == p.n_chunks - 1:
            self._tok = self._tok.at[p.slot].set(first)
            self._pos = self._pos.at[p.slot].set(p.base + p.req.prompt.size)
            p.req.tokens.append(int(first))
            self._slots[p.slot] = p.req
            self._pending.remove(p)
            self.stats["requests"] += 1
            self.stats["admission_interleave"].append(
                self.stats["steps"] - p.steps_at_start)
        self.stats["admission_chunks"] += 1

    def _retire_done(self):
        """Base retirement + return the request's pages to the pool and park
        the slot's table row on the dummy page.  Windowed models also free
        pages that slid fully out of every future query's window."""
        before = list(self._slots)
        super()._retire_done()
        changed = False
        for slot, (b, a) in enumerate(zip(before, self._slots)):
            if b is not None and a is None:
                self._alloc.free(b.pages or ())
                b.pages = None
                self._table[slot, :] = self._dummy
                changed = True
        if self._window is not None:
            changed |= self._free_slid_pages()
        if changed:
            self._sync_table()

    def _free_slid_pages(self) -> bool:
        """Free active slots' pages entirely below the sliding window.

        A slot at write position ``pos`` will never again read positions
        below ``pos - W + 1`` (future queries only move forward), so logical
        page ``p`` is dead once ``(p+1)*ps <= pos - W + 1``.  Shared prefix
        pages are refcount-decremented like any other (other sharers keep
        their reference).  Block-skipping attention never reads below the
        window's first page; the XLA gather path reads the dummy garbage
        these entries now point at, but the window mask kills it."""
        ps = self.page_size
        changed = False
        for slot, req in enumerate(self._slots):
            if req is None or not req.pages:
                continue
            base = req.prefix.length if req.prefix is not None else 0
            pos = base + req.prompt.size + max(len(req.tokens) - 1, 0)
            last_dead = (pos - self._window + 1) // ps - 1  # (p+1)*ps <= ...
            if last_dead < 0:
                continue
            dead = []
            for p in range(min(last_dead + 1, self._pps)):
                pid = int(self._table[slot, p])
                if pid != self._dummy:
                    dead.append(pid)
                    self._table[slot, p] = self._dummy
            if dead:
                # a page id can appear only once in req.pages (alloc'd or
                # shared exactly once per request)
                self._alloc.free(dead)
                req.pages = [x for x in req.pages if x not in set(dead)]
                self.stats["window_pages_freed"] += len(dead)
                changed = True
        return changed

    # ------------------------------------------------------------- shutdown

    def _fail_pending(self, exc):
        deferred, self._deferred = self._deferred, []
        for req in deferred:
            if not req.future.done():
                req.future.set_exception(exc)
        super()._fail_pending(exc)

    def _cancel_pending(self):
        for req in self._deferred:
            if not req.future.done():
                req.future.cancel()
        super()._cancel_pending()


class PagedSpeculativeDecodeEngine(SpeculativeDecodeEngine):
    """`SpeculativeDecodeEngine` over paged KV memory.

    Composes the two serving disciplines: every engine round advances all
    slots by a draft-propose/target-verify step (1..k+1 tokens), and both
    models' caches live in block-table page pools.  Because the target and
    the draft decode in POSITION LOCKSTEP, one allocator and ONE block table
    serve both: page id p backs the same positions in the target pools and
    the draft pools (each sized ``num_pages`` per layer), so sharing,
    deferral, and retirement bookkeeping stay identical to
    :class:`PagedDecodeEngine`.  Requires ``target.max_len == draft.max_len``
    (one table cannot map two different logical page grids).

    Page reservation covers the verify headroom: rounds write ``k+1`` rows
    beyond the last accepted position, so a request reserves pages through
    ``base + prompt + n_new + k + 1`` (the bound ``submit`` already
    enforces against ``max_len``).  The round program itself is the dense
    engine's — caches flow through ``model.apply`` as pytrees — re-jitted
    over the paged cache structure.
    """

    def __init__(self, target, draft, target_vars, draft_vars, *,
                 num_pages: int, page_size: int = 1024, **kwargs):
        if page_size < 1:
            raise ValueError("page_size must be >= 1")
        if target.max_len != draft.max_len:
            raise ValueError(
                "paged speculative serving shares ONE block table between "
                f"the target and draft pools: max_len must match (got "
                f"{target.max_len} vs {draft.max_len})")
        self.page_size = int(page_size)
        self.num_pages = int(num_pages)
        self._deferred: list = []
        super().__init__(target, draft, target_vars, draft_vars, **kwargs)
        self.stats["admissions_deferred"] = 0
        self.stats["prefix_pages_shared"] = 0

    # --------------------------------------------------------- device state

    def _build_device_state(self, cache_dtype):
        ps = self.page_size
        self._pps = -(-self.max_len // ps)
        if self.num_pages < 1:
            raise ValueError("num_pages must be >= 1")
        self._dummy = self.num_pages
        self._alloc = PageAllocator(self.num_pages)
        self._table = np.full((self.max_batch, self._pps), self._dummy,
                              np.int32)
        self._tcache = init_paged_cache(
            self.target, self.max_batch, page_size=ps,
            num_pages=self.num_pages + 1, dtype=cache_dtype,
            table=self._table)
        self._dcache = init_paged_cache(
            self.draft, self.max_batch, page_size=ps,
            num_pages=self.num_pages + 1, dtype=cache_dtype,
            table=self._table)
        self._pos = jnp.full((self.max_batch,), self._park, jnp.int32)
        self._tok = jnp.zeros((self.max_batch,), jnp.int32)
        target, draft = self.target, self.draft
        sampled = self._sampled
        temperature, top_k = self._temperature, self._top_k

        def _chunk(tvars, dvars, tcache, dcache, tokens, start):
            """One admission chunk straight into the slot's reserved pages
            of BOTH pools (caches arrive re-pointed at the slot's row)."""
            _, tcache = target.apply(tvars, tokens, cache=tcache,
                                     cache_index=start)
            _, dcache = draft.apply(dvars, tokens, cache=dcache,
                                    cache_index=start)
            return tcache, dcache

        def _final_chunk(tvars, dvars, tcache, dcache, tokens, start,
                         true_len, key):
            tlogits, tcache = target.apply(tvars, tokens, cache=tcache,
                                           cache_index=start)
            _, dcache = draft.apply(dvars, tokens, cache=dcache,
                                    cache_index=start)
            last = jax.lax.dynamic_index_in_dim(
                tlogits[0], true_len - 1 - start, axis=0, keepdims=False)
            if sampled:
                from .decode import _filter_logits
                first = jax.random.categorical(
                    key, _filter_logits(last, temperature, top_k)
                ).astype(jnp.int32)
            else:
                first = jnp.argmax(last, -1).astype(jnp.int32)
            return tcache, dcache, first

        _round = self._build_round_fn()
        self._chunk_fn = jax.jit(_chunk, donate_argnums=(2, 3))
        self._final_fn = jax.jit(_final_chunk, donate_argnums=(2, 3))
        self._round_fn = jax.jit(_round, donate_argnums=(2, 3))
        self._copy_fn = jax.jit(self._make_copy(), donate_argnums=(0, 1))

    @staticmethod
    def _make_copy():
        def _copy_page(tcache, dcache, src, dst):
            def cp(pool):
                row = jax.lax.dynamic_index_in_dim(pool, src, 0,
                                                   keepdims=False)
                return jax.lax.dynamic_update_index_in_dim(pool, row, dst, 0)

            def one(cache):
                return tuple(
                    layer.replace(
                        kp=cp(layer.kp), vp=cp(layer.vp),
                        **({"ks": cp(layer.ks), "vs": cp(layer.vs)}
                           if layer.quantized else {}))
                    for layer in cache)

            return one(tcache), one(dcache)

        return _copy_page

    def _sync_table(self):
        t = jnp.asarray(self._table)
        self._tcache = with_table(self._tcache, t)
        self._dcache = with_table(self._dcache, t)

    def _pages_needed(self, size: int, n_new: int, prefix) -> int:
        """As PagedDecodeEngine, plus the k+1 verify-headroom rows a round
        may write beyond the last accepted position."""
        base = prefix.length if prefix is not None else 0
        end = base + max(self._padded_admit_len(size),
                         size + n_new + self.k + 1)
        shared = (base // self.page_size) if prefix is not None else 0
        return -(-end // self.page_size) - shared

    # ------------------------------------------------------------------ API

    def warmup(self):
        """Compile the round + chunk programs; resets pools and positions."""
        with self._state_lock:
            if (any(s is not None for s in self._slots) or self._pending
                    or self._deferred):
                raise RuntimeError("warmup() must run before requests are "
                                   "in flight (it resets the KV caches)")
            zeros = jnp.zeros((self.max_batch,), jnp.int32)
            tc, dc, *_ = self._round_fn(self.tvars, self.dvars, self._tcache,
                                        self._dcache, zeros, self._pos,
                                        self._next_key())
            row = np.full((1, self._pps), self._dummy, np.int32)
            for c in sorted({self._chunk_len(b) for b in self.buckets}):
                toks = jnp.zeros((1, c), jnp.int32)
                tc1 = with_table(tc, jnp.asarray(row))
                dc1 = with_table(dc, jnp.asarray(row))
                tc1, dc1 = self._chunk_fn(self.tvars, self.dvars, tc1, dc1,
                                          toks, jnp.asarray(0, jnp.int32))
                tc, dc, first = self._final_fn(
                    self.tvars, self.dvars, tc1, dc1, toks,
                    jnp.asarray(0, jnp.int32), jnp.asarray(1, jnp.int32),
                    self._next_key())
                jax.block_until_ready(first)
            tc, dc = self._copy_fn(tc, dc, jnp.asarray(self._dummy,
                                                       jnp.int32),
                                   jnp.asarray(self._dummy, jnp.int32))
            self._tcache = jax.tree.map(jnp.zeros_like, tc)
            self._dcache = jax.tree.map(jnp.zeros_like, dc)
            self._sync_table()
            self._pos = jnp.full((self.max_batch,), self._park, jnp.int32)

    def register_prefix(self, tokens) -> PagedPrefix:
        """One set of pool pages backs the prefix in BOTH models' pools
        (position lockstep); admissions share them zero-copy."""
        tokens, padded, c, n_chunks = self._stage_prefix_tokens(tokens)
        n_pages = -(-tokens.size // self.page_size)
        with self._state_lock:
            pages = self._alloc.alloc(n_pages)
        row = np.full((1, self._pps), self._dummy, np.int32)
        row[0, :n_pages] = pages
        for i in range(n_chunks):
            with self._state_lock:
                try:
                    tc = with_table(self._tcache, jnp.asarray(row))
                    dc = with_table(self._dcache, jnp.asarray(row))
                    tc, dc = self._chunk_fn(
                        self.tvars, self.dvars, tc, dc,
                        jnp.asarray(padded[:, i * c:(i + 1) * c]),
                        jnp.asarray(i * c, jnp.int32))
                    t = jnp.asarray(self._table)
                    self._tcache = with_table(tc, t)
                    self._dcache = with_table(dc, t)
                except Exception:
                    with self._lifecycle_lock:
                        self._stop = True  # pools possibly donated
                    raise
        jax.block_until_ready(jax.tree.leaves(self._tcache)[0])
        return PagedPrefix(tokens, int(tokens.size), self, pages,
                           self.page_size)

    # Explicit delegation, NOT `_x = PagedDecodeEngine._x` class-level
    # borrowing: a borrowed method's zero-arg super() binds to the DEFINING
    # class (the shutdown bug this file already hit once), and this class is
    # NOT a PagedDecodeEngine subclass — real `def`s keep the call site
    # honest about the cross-hierarchy reuse.

    def _check_prefix(self, prefix, n_models: int):
        PagedDecodeEngine._check_prefix(self, prefix, n_models)

    def submit(self, prompt, n_new: int, *, prefix: Optional[Prefix] = None):
        size = np.asarray(prompt).size
        if (0 < size <= self.buckets[-1]
                and (prefix is None or isinstance(prefix, PagedPrefix))):
            need = self._pages_needed(size, n_new, prefix)
            if need > self.num_pages:
                raise ValueError(
                    f"request needs {need} pages (> pool {self.num_pages}); "
                    "raise num_pages or shorten prompt/n_new")
        return super().submit(prompt, n_new, prefix=prefix)

    # ----------------------------------------------------------- dispatcher

    def _stage_admissions(self, reserved: set):
        PagedDecodeEngine._stage_admissions(self, reserved)

    def _start_admit(self, req, slot: int):
        """As PagedDecodeEngine._start_admit, with the partial prefix page
        copied in BOTH pools (same fresh page id backs both)."""
        ps = self.page_size
        b = next(b for b in self.buckets if b >= req.prompt.size)
        c = self._chunk_len(b)
        n_chunks = -(-req.prompt.size // c)
        padded = np.zeros((1, n_chunks * c), np.int32)
        padded[0, : req.prompt.size] = req.prompt
        base = req.prefix.length if req.prefix is not None else 0
        fresh = self._alloc.alloc(
            self._pages_needed(req.prompt.size, req.n_new, req.prefix))
        row = np.full(self._pps, self._dummy, np.int32)
        owned = list(fresh)
        if req.prefix is not None:
            shared = base // ps
            shared_pages = list(req.prefix.pages[:shared])
            self._alloc.share(shared_pages)
            owned += shared_pages
            row[:shared] = shared_pages
            row[shared:shared + len(fresh)] = fresh
            if base % ps:
                try:
                    self._tcache, self._dcache = self._copy_fn(
                        self._tcache, self._dcache,
                        jnp.asarray(req.prefix.pages[shared], jnp.int32),
                        jnp.asarray(fresh[0], jnp.int32))
                except Exception:
                    with self._lifecycle_lock:
                        self._stop = True
                    raise
            self.stats["prefix_pages_shared"] += shared
        else:
            row[: len(fresh)] = fresh
        req.pages = owned
        req.slot = slot
        self._table[slot, :] = row
        self._sync_table()
        self._pending.append(_PendingAdmit(
            req=req, slot=slot, slot_cache=None, chunk_idx=0,
            n_chunks=n_chunks, padded=padded, c=c,
            steps_at_start=self.stats["rounds"], base=base))

    def _advance_admission(self, p):
        """One chunk into BOTH pools through the slot's one-row table; a
        failed chunk is fatal (pools may be donated)."""
        i = p.chunk_idx
        toks = jnp.asarray(p.padded[:, i * p.c:(i + 1) * p.c])
        start = jnp.asarray(p.base + i * p.c, jnp.int32)
        row = jnp.asarray(self._table[p.slot: p.slot + 1])
        tc = with_table(self._tcache, row)
        dc = with_table(self._dcache, row)
        try:
            if i < p.n_chunks - 1:
                tc, dc = self._chunk_fn(self.tvars, self.dvars, tc, dc,
                                        toks, start)
                p.chunk_idx += 1
            else:
                tc, dc, first = self._final_fn(
                    self.tvars, self.dvars, tc, dc, toks, start,
                    jnp.asarray(p.base + p.req.prompt.size, jnp.int32),
                    self._next_key())
        except Exception:
            with self._lifecycle_lock:
                self._stop = True
            raise
        t = jnp.asarray(self._table)
        self._tcache = with_table(tc, t)
        self._dcache = with_table(dc, t)
        if i == p.n_chunks - 1:
            self._tok = self._tok.at[p.slot].set(first)
            self._pos = self._pos.at[p.slot].set(p.base + p.req.prompt.size)
            p.req.tokens.append(int(first))
            self._slots[p.slot] = p.req
            self._pending.remove(p)
            self.stats["requests"] += 1
            self.stats["admission_interleave"].append(
                self.stats["rounds"] - p.steps_at_start)
        self.stats["admission_chunks"] += 1

    def _retire_done(self):
        before = list(self._slots)
        super()._retire_done()
        changed = False
        for slot, (b, a) in enumerate(zip(before, self._slots)):
            if b is not None and a is None:
                self._alloc.free(b.pages or ())
                b.pages = None
                self._table[slot, :] = self._dummy
                changed = True
        if changed:
            self._sync_table()

    # ------------------------------------------------------------- shutdown
    # (explicit, not borrowed from PagedDecodeEngine: its methods call
    # zero-arg super(), whose class cell binds to PagedDecodeEngine)

    def _fail_pending(self, exc):
        deferred, self._deferred = self._deferred, []
        for req in deferred:
            if not req.future.done():
                req.future.set_exception(exc)
        SpeculativeDecodeEngine._fail_pending(self, exc)

    def _cancel_pending(self):
        for req in self._deferred:
            if not req.future.done():
                req.future.cancel()
        SpeculativeDecodeEngine._cancel_pending(self)
