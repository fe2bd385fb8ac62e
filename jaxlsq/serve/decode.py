"""Autoregressive decode on the quantized serving path: KV cache + greedy loop.

The reference framework stops at fake-quant training (it has no serving or
generation runtime at all — SURVEY.md §5); this module completes the
BASELINE.json "tokens/s" story for ``QuantTransformerLM``: prefill a prompt
into a static-shape KV cache, then generate tokens with a single compiled
program.

TPU design notes:

* The cache is a tuple of per-layer ``(k, v)`` arrays of FIXED shape
  ``(B, H, max_len, head_dim)`` — decode writes with
  ``lax.dynamic_update_slice`` at a traced index, so ONE compiled program
  serves every position (no retrace, no dynamic shapes).
* The generation loop is a ``lax.scan`` inside one jit: per-token Python
  dispatch would cost more than the decode step itself at these sizes
  (a d=2048 4-block decode step is ~0.3 ms; host dispatch is ~0.1-1 ms).
* Greedy (argmax) decoding — the serving-path bench target; plug a sampler
  into ``logits_to_token`` for anything fancier.
* Works with both QAT-mode variables (float kernels + fake-quant) and
  serve-mode variables from ``jaxlsq.serve.convert`` (int8/int4 packed
  kernels, fused weight-only matmuls); decode shapes (M = B) hit
  ``wo_matmul``'s Pallas decode regime.
"""

from __future__ import annotations

import queue
import threading
import time
import warnings
from collections import deque
from concurrent.futures import Future
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["init_kv_cache", "prefill", "make_generate", "make_sampler",
           "make_beam_search", "make_speculative_generate", "DecodeEngine",
           "SpeculativeDecodeEngine", "Prefix"]


def make_sampler(temperature: float = 1.0, top_k: Optional[int] = None):
    """Build a ``logits_to_token`` sampler for :func:`make_generate` /
    :class:`DecodeEngine`: temperature + optional top-k, driven by a key
    folded from a counter so the whole decode stays one compiled program.

    Returns ``pick(logits, key) -> (B,) int32``; temperature 0 ⇒ greedy.
    """
    if temperature <= 0.0:
        return lambda logits, key=None: jnp.argmax(logits, -1).astype(jnp.int32)

    def pick(logits, key):
        scaled = logits / jnp.float32(temperature)
        if top_k is not None:
            kth = jnp.sort(scaled, axis=-1)[:, -top_k][:, None]
            scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
        return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)

    return pick


def init_kv_cache(model, batch_size: int, *, dtype=jnp.float32,
                  max_len: Optional[int] = None):
    """Zero KV cache for ``QuantTransformerLM``-shaped models: a tuple of
    ``model.depth`` per-layer ``(k, v)`` pairs, each (B, H, L, head_dim).

    ``dtype=jnp.bfloat16`` halves cache HBM traffic; keys/values are cast on
    write and cast back for the attention dots.

    ``dtype=jnp.int8`` quantizes the cache: each k/v entry becomes a
    ``(data int8 (B, H, L, hd), scale f32 (B, H, L))`` pair — written rows
    are quantized symmetrically per (b, h, position) and the per-row scales
    fold into the attention dots (see QuantTransformerBlock, models/zoo.py),
    so the cache streams at 1/4 the f32 bandwidth with no dequantized copy
    in HBM.

    ``dtype=jnp.int4`` (or ``"int4"``) halves that again: the same per-row
    symmetric scheme at 4 bits ([-7, 7]), with two values nibble-packed per
    byte along head_dim — ``(data uint8 (B, H, L, hd // 2), scale f32
    (B, H, L))``; the dots unpack in registers (no unpacked copy in HBM).
    All decode paths (prefill / make_generate / the engines / speculative)
    accept every layout."""
    L = model.max_len if max_len is None else max_len
    hd = model.dim // model.num_heads
    # grouped-query attention: the cache holds num_kv_heads heads (the whole
    # point — the decode-time cache stream shrinks by heads/kv_heads)
    kvh = getattr(model, "num_kv_heads", None) or model.num_heads
    shape = (batch_size, kvh, L, hd)
    name = dtype if isinstance(dtype, str) else np.dtype(dtype).name
    if name == "int4":
        if hd % 2:
            raise ValueError("int4 KV cache needs an even head_dim "
                             f"(got {hd}): values are nibble-packed in pairs")

        def entry():
            return (jnp.zeros(shape[:-1] + (hd // 2,), jnp.uint8),
                    jnp.zeros(shape[:-1], jnp.float32))
        return tuple((entry(), entry()) for _ in range(model.depth))
    if np.dtype(dtype) == np.int8:
        def entry():
            return (jnp.zeros(shape, jnp.int8),
                    jnp.zeros(shape[:-1], jnp.float32))
        return tuple((entry(), entry()) for _ in range(model.depth))
    return tuple(
        (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        for _ in range(model.depth))


def prefill(model, variables, tokens: jnp.ndarray, *,
            cache=None, cache_dtype=jnp.float32):
    """Run the prompt through the model, filling the cache.

    Returns ``(last_logits, cache, index)`` where ``last_logits`` is
    (B, vocab) at the final prompt position and ``index`` is the next write
    position (= prompt length).  Jit-compatible (static prompt length)."""
    b, t = tokens.shape
    if cache is None:
        cache = init_kv_cache(model, b, dtype=cache_dtype)
    from .paged import PagedKVLayer
    if isinstance(cache[0], PagedKVLayer):
        L = cache[0].table.shape[1] * cache[0].page_size
    else:
        # (data, scale) pair when the cache is int8-quantized
        lead = cache[0][0]
        L = (lead[0] if isinstance(lead, (tuple, list)) else lead).shape[2]
    if t > L:
        raise ValueError(f"prompt length {t} exceeds cache max_len {L}")
    logits, cache = model.apply(variables, tokens, cache=cache,
                                cache_index=jnp.zeros((), jnp.int32))
    return logits[:, -1], cache, jnp.asarray(t, jnp.int32)


def make_generate(model, prompt_len: int, n_new: int, *,
                  cache_dtype=jnp.float32,
                  logits_to_token: Optional[Callable] = None,
                  sampled: bool = False,
                  jit: bool = True):
    """Build a generator: prefill + ``lax.scan`` decode fused into one
    compiled program.

    Greedy (default): ``generate(variables, prompt) -> (B, n_new)``.
    Sampled (``sampled=True``): ``generate(variables, prompt, key)`` —
    ``logits_to_token`` must accept ``(logits, key)`` (e.g.
    :func:`make_sampler`); per-step keys are folded from ``key`` inside the
    scan, so sampling stays a single compiled program.

    Args:
      model: a ``QuantTransformerLM`` (QAT or serve mode).
      prompt_len: static prompt length (one compiled program per length —
        bucket prompts like the serving engine buckets batch sizes).
      n_new: number of tokens to generate.
      logits_to_token: (B, vocab) -> (B,) int32 (or with a key when
        ``sampled``); default greedy argmax.
      jit: wrap in jax.jit (disable to compose with an outer pjit).
    """
    if prompt_len + n_new > model.max_len:
        raise ValueError(
            f"prompt_len + n_new = {prompt_len + n_new} exceeds model.max_len "
            f"= {model.max_len}")
    pick = logits_to_token or (
        lambda logits, *a: jnp.argmax(logits, axis=-1).astype(jnp.int32))

    def generate(variables, prompt: jnp.ndarray, key=None) -> jnp.ndarray:
        if prompt.shape[1] != prompt_len:
            raise ValueError(
                f"prompt length {prompt.shape[1]} != compiled {prompt_len}")
        last_logits, cache, index = prefill(model, variables, prompt,
                                            cache_dtype=cache_dtype)
        if sampled:
            k0, kloop = jax.random.split(key)
            first = pick(last_logits, k0)
        else:
            first = pick(last_logits)

        def step(carry, i):
            tok, cache, idx = carry
            logits, cache = model.apply(variables, tok[:, None], cache=cache,
                                        cache_index=idx)
            if sampled:
                nxt = pick(logits[:, -1], jax.random.fold_in(kloop, i))
            else:
                nxt = pick(logits[:, -1])
            return (nxt, cache, idx + 1), nxt

        (_, _, _), rest = jax.lax.scan(
            step, (first, cache, index), jnp.arange(n_new - 1))
        # rest: (n_new-1, B) time-major from scan → (B, n_new)
        return jnp.concatenate([first[:, None], rest.T], axis=1)

    if not jit:
        return generate
    return jax.jit(generate) if sampled else jax.jit(lambda v, p: generate(v, p))


# ---------------------------------------------------------------------------
# Token-level continuous batching
# ---------------------------------------------------------------------------

class _GenRequest:
    __slots__ = ("prompt", "n_new", "future", "tokens", "slot", "prefix",
                 "pages")

    def __init__(self, prompt: np.ndarray, n_new: int, prefix=None):
        self.prompt = prompt
        self.n_new = n_new
        self.future: Future = Future()
        self.tokens: list = []
        self.slot = -1
        self.prefix = prefix
        self.pages = None  # pool pages owned by this request (paged engines)


def _warn_moe_capacity(model):
    """MoE engines route all co-batched slots' tokens TOGETHER, so a binding
    expert capacity couples slots: request A's tokens then depend on which
    requests happen to share its decode steps (models/moe.py decode-serving
    note).  Warn when the model's capacity CAN bind so the nondeterminism is
    explicit rather than silent."""
    e = getattr(model, "moe_experts", 0) or 0
    if not e:
        return
    k = getattr(model, "moe_top_k", 1) or 1
    cf = getattr(model, "moe_capacity_factor", 0.0) or 0.0
    if cf < e / k:
        warnings.warn(
            f"QuantMoE capacity can bind under batched decode "
            f"(capacity_factor={cf} < num_experts/top_k={e}/{k}): capacity "
            "drops couple co-batched requests, making generations depend on "
            "batch composition. Serve with capacity_factor >= "
            "num_experts/top_k for per-token-exact routing.",
            stacklevel=3)


class Prefix:
    """A prefilled, immutable KV prefix (e.g. a shared system prompt).

    Built once by ``DecodeEngine.register_prefix`` /
    ``SpeculativeDecodeEngine.register_prefix``: the prefix tokens are
    chunk-prefilled into a private B=1 slot cache, positions [0, length).
    ``submit(suffix, prefix=handle)`` then seeds each admission from a COPY
    of this cache and prefills only the suffix at offset positions — the
    shared prefix's attention work is paid once per handle, not once per
    request.  ``caches`` holds one slot-cache pytree per model driven by the
    engine (one for ``DecodeEngine``, (target, draft) for
    ``SpeculativeDecodeEngine``).  A handle is bound to the engine that
    built it (``owner``): two engines can hold DIFFERENT weights behind
    identical cache layouts, so a shape check alone cannot catch a handle
    crossing engines — re-register per engine instead."""

    __slots__ = ("tokens", "length", "caches", "owner")

    def __init__(self, tokens: np.ndarray, length: int, caches: tuple,
                 owner=None):
        self.tokens = tokens
        self.length = length
        self.caches = caches
        self.owner = owner


class _PendingAdmit:
    """One in-flight chunked admission: the reserved slot, the private B=1
    slot cache being filled, and the chunk cursor."""

    __slots__ = ("req", "slot", "slot_cache", "chunk_idx", "n_chunks",
                 "padded", "c", "steps_at_start", "base")

    def __init__(self, *, req, slot, slot_cache, chunk_idx, n_chunks, padded,
                 c, steps_at_start, base=0):
        self.req = req
        self.slot = slot
        self.slot_cache = slot_cache
        self.chunk_idx = chunk_idx
        self.n_chunks = n_chunks
        self.padded = padded
        self.c = c
        self.steps_at_start = steps_at_start
        # first suffix position: 0, or the length of the request's Prefix
        self.base = base


class DecodeEngine:
    """Iteration-level (token-level) continuous batching for autoregressive
    generation — the serving discipline the request-level ``ServingEngine``
    cannot express: new requests JOIN the running batch at the next token
    boundary instead of waiting for the whole batch to finish.

    TPU-native design (all static shapes; three compiled programs total —
    decode step, prefill chunk, final chunk — per distinct chunk length):

    * One global KV cache of fixed shape (max_batch, H, max_len, hd) per
      layer.  Each batch slot holds one request at its own decode depth —
      the model's vector ``cache_index`` path (models/zoo.py) masks each
      slot's attention to its own [0, pos) prefix.
    * CHUNKED prefill (non-blocking admission, VERDICT r2 next-#4): a new
      prompt is NOT prefilled in one synchronous program (which would stall
      every active decode lane for the whole prompt).  Instead the prompt is
      split into ``prefill_chunk``-token chunks accumulated into a private
      B=1 slot cache, and the dispatcher advances ONE chunk per iteration,
      interleaved with the decode step — so the decode-step gap is bounded
      by one chunk's compute, not the prompt length.  The final chunk (the
      one containing position true_len−1) emits the first token and writes
      the slot cache into the global cache; only then does the slot go
      active.  Chunking is numerically EXACT vs one-shot prefill: every
      contraction (QKV/MLP matmuls over dim, attention over max_len and
      head_dim) has a fixed extent, the chunk length is a purely parallel
      dimension.  Padded rows beyond the true length write garbage k/v
      that is provably never read — decode at position p attends kpos <= p
      and overwrites row p before attending to it (overwrite before first
      exposure).
    * ``decode step``: one program advances ALL active slots one token
      (argmax).  Free slots run parked at max_len-1 (same
      overwrite-before-read argument); their output tokens are ignored.
    * PREFIX CACHING: ``register_prefix(tokens)`` prefills a shared prompt
      prefix once into an immutable handle; ``submit(suffix, prefix=h)``
      admissions start from a copy of that cache and prefill only the
      suffix (positions offset by the prefix length) — bit-exact vs the
      concatenated prompt, and the shared prefill cost is paid per handle,
      not per request.
    * The host loop (dispatcher thread) only admits/retires requests and
      relays tokens — everything shape-dependent is compiled once.

    Args:
      model: a ``QuantTransformerLM``-shaped module (QAT or serve mode).
      variables: its (possibly converted + sharded) variables.
      max_batch: number of concurrent decode slots.
      prompt_buckets: ascending prompt-length buckets (admission cap);
        prompts longer than the largest bucket are rejected.
      cache_dtype: KV cache dtype (bf16 halves cache traffic; jnp.int8
        quantizes it — see init_kv_cache).
      prefill_chunk: admission chunk length (None = whole-bucket chunks,
        i.e. the old stall-the-world behavior).
      max_wait_ms: dispatcher sleep when completely idle.
    """

    def __init__(self, model, variables, *, max_batch: int = 8,
                 prompt_buckets: Sequence[int] = (32, 128),
                 cache_dtype=jnp.float32, prefill_chunk: Optional[int] = 32,
                 max_wait_ms: float = 2.0,
                 eos_id: Optional[int] = None,
                 logits_to_token: Optional[Callable] = None,
                 rng=None):
        """``eos_id``: retire a request early when it emits this token (the
        result includes the eos).  ``logits_to_token``/``rng``: plug a
        sampler (see :func:`make_sampler`) — with ``rng`` set, the sampler
        is called as ``pick(logits, key)`` with per-step folded keys."""
        if prefill_chunk is not None and prefill_chunk < 1:
            raise ValueError("prefill_chunk must be >= 1 or None")
        _warn_moe_capacity(model)
        self.model = model
        self.variables = variables
        self.max_batch = max_batch
        self.buckets = sorted(prompt_buckets)
        self.max_len = model.max_len
        self.eos_id = eos_id
        self._rng = rng
        self._sampled = rng is not None
        self._counter = 0
        self._pick = logits_to_token or (
            lambda logits, *a: jnp.argmax(logits, -1).astype(jnp.int32))
        self.prefill_chunk = prefill_chunk
        self._build_device_state(cache_dtype)

        self._queue: "queue.Queue[_GenRequest]" = queue.Queue()
        self._slots: list = [None] * max_batch
        self._pending: list = []  # in-flight chunked admissions (FIFO)
        self._lifecycle_lock = threading.Lock()
        # serializes device-state mutation (dispatcher iteration vs warmup)
        self._state_lock = threading.Lock()
        self._stop = False
        self.max_wait_s = max_wait_ms / 1e3
        # admission_interleave: decode steps each admission overlapped —
        # bounded (long-running engines must not grow per-request state)
        self.stats = {"requests": 0, "steps": 0, "slot_tokens": 0,
                      "active_token_sum": 0, "admission_chunks": 0,
                      "admission_interleave": deque(maxlen=1024)}
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _build_device_state(self, cache_dtype):
        """Create the KV cache / position / token device state and compile
        wrappers for the three engine programs (decode step, prefill chunk,
        final chunk).  ``PagedDecodeEngine`` overrides this with the
        block-table layout."""
        max_batch = self.max_batch
        pick, sampled = self._pick, self._sampled
        self._cache = init_kv_cache(self.model, max_batch, dtype=cache_dtype)
        self._pos = jnp.full((max_batch,), self.max_len - 1, jnp.int32)
        self._tok = jnp.zeros((max_batch,), jnp.int32)

        def _chunk(variables, slot_cache, tokens, start):
            """One admission chunk: run ``tokens`` (1, c) against the
            private slot cache at positions [start, start+c)."""
            _, slot_cache = self.model.apply(
                variables, tokens, cache=slot_cache, cache_index=start)
            return slot_cache

        def _final_chunk(variables, cache, slot_cache, tokens, start,
                         true_len, slot, key):
            """Last admission chunk (contains position true_len−1): run it,
            pick the first token, and write the slot cache into global-cache
            slot ``slot``."""
            logits, slot_cache = self.model.apply(
                variables, tokens, cache=slot_cache, cache_index=start)
            last = jax.lax.dynamic_index_in_dim(
                logits[0], true_len - 1 - start, axis=0, keepdims=True)
            first = (pick(last, key) if sampled else pick(last))[0]
            new_cache = jax.tree.map(
                lambda g, s: jax.lax.dynamic_update_slice(
                    g, s.astype(g.dtype),
                    (slot,) + (0,) * (g.ndim - 1)),
                cache, slot_cache)
            return new_cache, first

        def _step(variables, cache, toks, pos, key):
            logits, cache = self.model.apply(
                variables, toks[:, None], cache=cache, cache_index=pos)
            nxt = pick(logits[:, -1], key) if sampled else pick(logits[:, -1])
            return cache, nxt, jnp.minimum(pos + 1, self.max_len - 1)

        self._chunk_fn = jax.jit(_chunk, donate_argnums=(1,))
        self._final_fn = jax.jit(_final_chunk, donate_argnums=(1, 2))
        self._step_fn = jax.jit(_step, donate_argnums=(1,))

    def _chunk_len(self, bucket: int) -> int:
        return bucket if self.prefill_chunk is None else min(
            self.prefill_chunk, bucket)

    def _padded_admit_len(self, size: int) -> int:
        """Rows the chunked admission actually WRITES for a ``size``-token
        prompt: the prompt padded up to whole chunks.  Writes are
        dynamic_update_slices into a max_len cache — a slice reaching past
        max_len gets its start CLAMPED, silently overwriting earlier rows —
        so admission validity must bound base + this, not base + size."""
        b = next(b for b in self.buckets if b >= size)
        c = self._chunk_len(b)
        return -(-size // c) * c

    def _stage_prefix_tokens(self, tokens) -> tuple:
        """Shared register_prefix staging: validate, pick a chunk length,
        and pad to whole chunks — guaranteeing the padded writes fit below
        max_len (a one-shot chunk of exactly the prefix length is used when
        the bucket-derived chunking would pad past it; registration is
        one-time, so the extra compile is fine)."""
        tokens = np.asarray(tokens, np.int32)
        if tokens.ndim != 1 or tokens.size == 0:
            raise ValueError("prefix must be a non-empty 1-D token array")
        if tokens.size >= self.max_len:
            raise ValueError(
                f"prefix length {tokens.size} must be < max_len "
                f"{self.max_len} (no room left to decode)")
        with self._lifecycle_lock:
            if self._stop:
                raise RuntimeError(f"{type(self).__name__} is closed")
        c = self._chunk_len(self.buckets[-1])  # reuse a compiled chunk size
        n_chunks = -(-tokens.size // c)
        if n_chunks * c > self.max_len:
            c, n_chunks = int(tokens.size), 1
        padded = np.zeros((1, n_chunks * c), np.int32)
        padded[0, : tokens.size] = tokens
        return tokens, padded, c, n_chunks

    # ------------------------------------------------------------------ API

    def warmup(self):
        """Compile the decode step and the chunk/final-chunk programs up
        front (first compiles otherwise land on the first unlucky requests).
        Must run before requests are in flight — it resets the
        cache/positions."""
        with self._state_lock:
            if any(slot is not None for slot in self._slots) or self._pending:
                raise RuntimeError(
                    "warmup() must run before requests are in flight "
                    "(it resets the KV cache)")
            zeros = jnp.zeros((self.max_batch,), jnp.int32)
            cache, nxt, pos = self._step_fn(self.variables, self._cache,
                                            zeros, self._pos, self._next_key())
            jax.block_until_ready(nxt)
            for c in sorted({self._chunk_len(b) for b in self.buckets}):
                sc = jax.tree.map(
                    lambda g: jnp.zeros((1,) + g.shape[1:], g.dtype), cache)
                toks = jnp.zeros((1, c), jnp.int32)
                sc = self._chunk_fn(self.variables, sc, toks,
                                    jnp.asarray(0, jnp.int32))
                cache, first = self._final_fn(
                    self.variables, cache, sc, toks,
                    jnp.asarray(0, jnp.int32), jnp.asarray(1, jnp.int32),
                    jnp.asarray(0, jnp.int32), self._next_key())
                jax.block_until_ready(first)
            # restore a clean parked state (warmup wrote junk rows, all of
            # which sit beyond every parked position and would be overwritten
            # before first exposure anyway; reset for tidiness)
            self._cache = jax.tree.map(jnp.zeros_like, cache)
            self._pos = jnp.full((self.max_batch,), self.max_len - 1,
                                 jnp.int32)

    def register_prefix(self, tokens) -> Prefix:
        """Prefill a shared prompt prefix ONCE and return a reusable handle.

        ``submit(suffix, prefix=handle)`` admissions then start from a copy
        of the prefilled cache and chunk-prefill only the suffix — the
        per-request prefill cost drops from O(prefix+suffix) to O(suffix).
        Registration never touches the engine's decode state: the chunks run
        against a private B=1 cache, interleaving with in-flight decode
        steps on the device queue exactly like admission chunks, so it is
        safe (and non-stalling) to register mid-serving.  The prefix can be
        LONGER than the largest prompt bucket (the usual system-prompt
        shape); only ``prefix.length + suffix + n_new <= max_len`` binds.
        The handle is bound to THIS engine (different engines may hold
        different weights behind identical cache layouts)."""
        tokens, padded, c, n_chunks = self._stage_prefix_tokens(tokens)
        sc = jax.tree.map(
            lambda g: jnp.zeros((1,) + g.shape[1:], g.dtype), self._cache)
        for i in range(n_chunks):
            sc = self._chunk_fn(self.variables,
                                sc, jnp.asarray(padded[:, i * c:(i + 1) * c]),
                                jnp.asarray(i * c, jnp.int32))
        jax.block_until_ready(sc)
        # rows in [size, n_chunks*c) hold pad garbage: never read — the
        # suffix admission overwrites from position `size` before any decode
        # step attends there (the standard overwrite-before-exposure
        # argument of chunked admission).
        return Prefix(tokens, int(tokens.size), (sc,), owner=self)

    def _check_prefix(self, prefix, n_models: int):
        if not isinstance(prefix, Prefix) or len(prefix.caches) != n_models:
            raise ValueError("prefix must come from this engine kind's "
                             "register_prefix()")
        if prefix.owner is not self:
            # identical layouts can hide different WEIGHTS behind them
            raise ValueError(
                "prefix was registered on a different engine; call "
                "register_prefix() on this one")
        templates = ([self._cache] if n_models == 1
                     else [self._tcache, self._dcache])
        for got, tmpl in zip(prefix.caches, templates):
            ok = (jax.tree.structure(got) == jax.tree.structure(tmpl))
            if ok:
                for g, t in zip(jax.tree.leaves(got), jax.tree.leaves(tmpl)):
                    ok &= (g.shape == (1,) + t.shape[1:] and g.dtype == t.dtype)
            if not ok:
                raise ValueError(
                    "prefix cache layout does not match this engine's "
                    "(different model/max_len/cache_dtype?)")

    def submit(self, prompt, n_new: int, *, prefix: Optional[Prefix] = None
               ) -> Future:
        """Queue one generation request; Future resolves to an (n_new,) int32
        array of greedily decoded tokens.  With ``prefix`` (from
        :meth:`register_prefix`), ``prompt`` is the per-request SUFFIX that
        continues the shared prefix."""
        prompt = np.asarray(prompt, np.int32)
        if prompt.ndim != 1 or prompt.size == 0:
            raise ValueError("prompt must be a non-empty 1-D token array")
        if prompt.size > self.buckets[-1]:
            raise ValueError(
                f"prompt length {prompt.size} exceeds the largest bucket "
                f"{self.buckets[-1]}")
        base = 0
        if prefix is not None:
            self._check_prefix(prefix, 1)
            base = prefix.length
        if base + prompt.size + n_new > self.max_len:
            raise ValueError("prefix + prompt + n_new exceeds model.max_len")
        if base + self._padded_admit_len(prompt.size) > self.max_len:
            raise ValueError(
                "the chunk-padded admission would write past max_len "
                f"(prefix {base} + padded prompt "
                f"{self._padded_admit_len(prompt.size)} > {self.max_len}); "
                "lower prefill_chunk or the bucket, or shorten the prefix")
        req = _GenRequest(prompt, n_new, prefix=prefix)
        with self._lifecycle_lock:
            if self._stop:
                raise RuntimeError("DecodeEngine is closed")
            self._queue.put(req)
        return req.future

    def _fail_pending(self, exc):
        for slot, req in enumerate(self._slots):
            if req is not None and not req.future.done():
                req.future.set_exception(exc)
        self._slots = [None] * self.max_batch
        for p in getattr(self, "_pending", []):
            if not p.req.future.done():
                p.req.future.set_exception(exc)
        self._pending = []
        for req in self._drain_queue():
            if not req.future.done():
                req.future.set_exception(exc)

    def close(self):
        with self._lifecycle_lock:
            self._stop = True
        self._thread.join(timeout=300)
        if not self._thread.is_alive():
            # the dispatcher fails pending work itself on observing _stop;
            # this only mops up anything enqueued after its last check
            self._fail_pending(RuntimeError("DecodeEngine closed"))
        else:
            # dispatcher stuck (e.g. in a first compile): don't set_exception
            # on slot futures — the dispatcher would later set_result on a
            # done Future (InvalidStateError) and die holding the state lock.
            # Future.cancel() is safe: callers' result() raises
            # CancelledError immediately instead of blocking to their own
            # timeout, and the dispatcher's set_result on a cancelled Future
            # is a no-op (guarded by future.done()).
            self._cancel_pending()

    def _cancel_pending(self):
        admitting = [p.req for p in getattr(self, "_pending", [])]
        for req in list(self._slots) + admitting + self._drain_queue():
            if req is not None and not req.future.done():
                req.future.cancel()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ----------------------------------------------------------- dispatcher

    def _drain_queue(self):
        out = []
        while True:
            try:
                out.append(self._queue.get_nowait())
            except queue.Empty:
                return out

    def _next_key(self):
        if not self._sampled:
            return None
        self._counter += 1
        return jax.random.fold_in(self._rng, self._counter)

    def _finished(self, req: _GenRequest) -> bool:
        return (len(req.tokens) >= req.n_new
                or (self.eos_id is not None and len(req.tokens) > 0
                    and req.tokens[-1] == self.eos_id))

    def _start_admit(self, req: _GenRequest, slot: int):
        """Reserve a slot and stage the prompt for chunked admission; the
        dispatcher advances one chunk per iteration (_advance_admission).
        With a Prefix, the slot cache starts as a COPY of the prefilled
        prefix cache (copy, because the chunk programs donate their cache
        argument — the handle stays reusable) and chunks run at offset
        positions."""
        b = next(b for b in self.buckets if b >= req.prompt.size)
        c = self._chunk_len(b)
        n_chunks = -(-req.prompt.size // c)
        padded = np.zeros((1, n_chunks * c), np.int32)
        padded[0, : req.prompt.size] = req.prompt
        if req.prefix is not None:
            base = req.prefix.length
            slot_cache = jax.tree.map(jnp.copy, req.prefix.caches[0])
            self.stats["prefix_tokens_reused"] = (
                self.stats.get("prefix_tokens_reused", 0) + base)
        else:
            base = 0
            slot_cache = jax.tree.map(
                lambda g: jnp.zeros((1,) + g.shape[1:], g.dtype), self._cache)
        req.slot = slot
        self._pending.append(_PendingAdmit(
            req=req, slot=slot, slot_cache=slot_cache, chunk_idx=0,
            n_chunks=n_chunks, padded=padded, c=c,
            steps_at_start=self.stats["steps"], base=base))

    def _advance_admission(self, p: "_PendingAdmit"):
        """Run ONE chunk of the in-flight admission at the head of the
        queue; the final chunk emits the first token, writes the slot cache
        into the global cache, and activates the slot."""
        i = p.chunk_idx
        toks = jnp.asarray(p.padded[:, i * p.c:(i + 1) * p.c])
        start = jnp.asarray(p.base + i * p.c, jnp.int32)
        if i < p.n_chunks - 1:
            p.slot_cache = self._chunk_fn(self.variables, p.slot_cache,
                                          toks, start)
            p.chunk_idx += 1
        else:
            self._cache, first = self._final_fn(
                self.variables, self._cache, p.slot_cache, toks, start,
                jnp.asarray(p.base + p.req.prompt.size, jnp.int32),
                jnp.asarray(p.slot, jnp.int32), self._next_key())
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
        for slot, req in enumerate(self._slots):
            if req is not None and self._finished(req):
                if not req.future.done():  # close() may have raced us
                    req.future.set_result(
                        np.asarray(req.tokens[: req.n_new], np.int32))
                self._slots[slot] = None
                # park the freed slot
                self._pos = self._pos.at[slot].set(self.max_len - 1)

    def _stage_admissions(self, reserved: set):
        """Pull queued requests into free, unreserved slots (one dispatcher
        iteration's admission staging; paged engines override this to defer
        requests while the page pool is exhausted)."""
        for slot in range(self.max_batch):
            if self._slots[slot] is None and slot not in reserved:
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    break
                try:
                    self._start_admit(req, slot)
                    reserved.add(slot)
                except Exception as e:  # pragma: no cover
                    if not req.future.done():  # may be cancelled
                        req.future.set_exception(e)

    def _loop(self):
        while True:
            if self._stop:
                self._fail_pending(RuntimeError("DecodeEngine closed"))
                return
            self._state_lock.acquire()
            # stage new admissions into free, unreserved slots
            reserved = {p.slot for p in self._pending}
            self._stage_admissions(reserved)
            # advance the HEAD admission by one chunk — at most one chunk
            # per iteration, so active slots' decode-step gap is bounded by
            # one chunk's compute (not the whole prompt)
            if self._pending:
                p = self._pending[0]
                try:
                    self._advance_admission(p)
                except Exception as e:  # pragma: no cover
                    self._pending.remove(p)
                    if not p.req.future.done():
                        p.req.future.set_exception(e)
            self._retire_done()
            active = [s for s in self._slots if s is not None]
            if not active and not self._pending:
                self._state_lock.release()
                time.sleep(self.max_wait_s)
                continue
            if active:
                try:
                    self._cache, nxt, self._pos = self._step_fn(
                        self.variables, self._cache, self._tok, self._pos,
                        self._next_key())
                    toks = np.asarray(nxt)
                except Exception as e:  # device failure: fail fast
                    with self._lifecycle_lock:
                        self._stop = True
                    self._fail_pending(e)
                    self._state_lock.release()
                    return
                self._tok = nxt
                for slot, req in enumerate(self._slots):
                    if req is not None and not self._finished(req):
                        req.tokens.append(int(toks[slot]))
                self.stats["steps"] += 1
                self.stats["slot_tokens"] += self.max_batch
                self.stats["active_token_sum"] += len(active)
                self._retire_done()
            self._state_lock.release()


def make_beam_search(model, prompt_len: int, n_new: int, *, beams: int = 4,
                     cache_dtype=jnp.float32, eos_id: Optional[int] = None,
                     length_penalty: float = 0.0, jit: bool = True):
    """Beam-search decoding on the (quantized) serving path: keep the
    ``beams`` highest-joint-log-prob continuations at every step.

    TPU-native mechanics (all static shapes, one compiled program):

    * the KV cache runs at batch ``B·K`` (beam-major per sample); each step
      decodes all beams at once, forms (B, K·V) joint scores, takes the
      top-K, and REINDEXES the cache rows to the surviving parents with one
      ``jnp.take`` along the batch axis — a gather XLA executes as a copy of
      the live cache (the classic beam-search cost; fine at serving sizes).
    * token histories reorder the same way (``take_along_axis`` on a
      (B, K, n_new) buffer inside the scan).
    * finished beams (emitted ``eos_id``) are FROZEN with the standard mask
      trick: their only continuation is a free (log-prob 0) eos repeat, all
      other tokens get -inf, so their score stays fixed while live beams
      keep competing.

    Args:
      beams: beam width K (``beams=1`` degenerates to greedy decode —
        pinned by test).
      length_penalty: Google-NMT style normalization
        ``score / ((5 + len) / 6) ** alpha`` applied at the FINAL ranking
        only (0.0 = pure joint log-prob).
      eos_id: optional early-stop token; without it all beams run n_new
        steps.

    Returns ``search(variables, prompt(B, prompt_len)) -> (tokens (B, n_new),
    scores (B,))`` for the best beam per sample.  The model's activation
    observers should be disabled/frozen (decode-parity discipline).
    """
    if beams < 1:
        raise ValueError("beams must be >= 1")
    if prompt_len + n_new > model.max_len:
        raise ValueError(
            f"prompt_len + n_new = {prompt_len + n_new} exceeds model.max_len "
            f"= {model.max_len}")
    K = beams

    def search(variables, prompt: jnp.ndarray):
        if prompt.shape[1] != prompt_len:
            raise ValueError(
                f"prompt length {prompt.shape[1]} != compiled {prompt_len}")
        B = prompt.shape[0]
        # prefill at B·K directly (beam-major tiling of the prompt): K times
        # the prefill FLOPs of a B-prefill, but the cache lands already
        # tiled — no post-hoc per-layer repeat of (B, H, L, hd) buffers
        tiled = jnp.repeat(prompt, K, axis=0)                  # (B*K, T)
        last_logits, cache, index = prefill(model, variables, tiled,
                                            cache_dtype=cache_dtype)
        logp0 = jax.nn.log_softmax(last_logits.reshape(B, K, -1)[:, 0], -1)
        V = logp0.shape[-1]
        # first step: top-K tokens per sample seed the beams.  K > V pads
        # the surplus beams at -inf — they are displaced by real expansions
        # at the next step (a K >= V^n beam is then EXHAUSTIVE search)
        k1 = min(K, V)
        scores, first = jax.lax.top_k(logp0, k1)               # (B, k1)
        if k1 < K:
            scores = jnp.concatenate(
                [scores, jnp.full((B, K - k1), -jnp.inf)], axis=1)
            first = jnp.concatenate(
                [first, jnp.zeros((B, K - k1), first.dtype)], axis=1)
        first = first.astype(jnp.int32)
        hist = jnp.zeros((B, K, n_new), jnp.int32)
        hist = hist.at[:, :, 0].set(first)
        finished = (jnp.full((B, K), False) if eos_id is None
                    else first == eos_id)

        def step(carry, i):
            hist, scores, tok, cache, idx, finished = carry
            logits, cache = model.apply(variables, tok.reshape(B * K, 1),
                                        cache=cache, cache_index=idx)
            logp = jax.nn.log_softmax(logits[:, -1].reshape(B, K, V), -1)
            if eos_id is not None:
                # frozen beams: only continuation is a free eos repeat
                frozen = jnp.full((V,), -jnp.inf).at[eos_id].set(0.0)
                logp = jnp.where(finished[:, :, None], frozen[None, None],
                                 logp)
            joint = scores[:, :, None] + logp                  # (B, K, V)
            scores, flat = jax.lax.top_k(joint.reshape(B, K * V), K)
            parent = flat // V                                 # (B, K)
            tok = (flat % V).astype(jnp.int32)
            # reorder histories + cache to the surviving parents
            hist = jnp.take_along_axis(hist, parent[:, :, None], axis=1)
            hist = hist.at[:, :, i].set(tok)
            flat_parent = (jnp.arange(B)[:, None] * K + parent).reshape(-1)
            cache = jax.tree.map(
                lambda c: jnp.take(c, flat_parent, axis=0), cache)
            if eos_id is not None:
                finished = jnp.take_along_axis(finished, parent, axis=1)
                finished = finished | (tok == eos_id)
            return (hist, scores, tok, cache, idx + 1, finished), None

        (hist, scores, _, _, _, _), _ = jax.lax.scan(
            step, (hist, scores, first, cache, index, finished),
            jnp.arange(1, n_new))
        if length_penalty > 0.0 and eos_id is not None:
            # effective length = position of first eos + 1 (else n_new)
            is_eos = hist == eos_id
            has = jnp.any(is_eos, -1)
            lens = jnp.where(has, jnp.argmax(is_eos, -1) + 1, n_new)
            norm = ((5.0 + lens.astype(jnp.float32)) / 6.0) ** length_penalty
            ranked = scores / norm
        else:
            ranked = scores
        best = jnp.argmax(ranked, axis=1)                      # (B,)
        toks = jnp.take_along_axis(hist, best[:, None, None], 1)[:, 0]
        return toks, jnp.take_along_axis(scores, best[:, None], 1)[:, 0]

    return jax.jit(search) if jit else search


def _filter_logits(logits, temperature: float, top_k: Optional[int]):
    """Temperature + top-k logits filter (same transform as
    :func:`make_sampler`); last axis is the vocab."""
    scaled = logits / jnp.float32(temperature)
    if top_k is not None:
        kth = jnp.sort(scaled, axis=-1)[..., -top_k][..., None]
        scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
    return scaled


def make_speculative_generate(target, draft, prompt_len: int, n_new: int, *,
                              k: int = 4, cache_dtype=jnp.float32,
                              temperature: float = 0.0,
                              top_k: Optional[int] = None,
                              return_stats: bool = False,
                              jit: bool = True):
    """Speculative decoding: a cheap ``draft`` LM proposes ``k`` tokens per
    round, the ``target`` verifies them in ONE forward (k positions = one
    weight stream, the same HBM cost as a single decode step), and the
    longest accepted prefix plus a correction/bonus token is emitted.

    ``temperature <= 0`` (default): greedy — draft proposals are accepted
    while they match the target's argmax; output is EXACTLY the target's
    greedy decode, by construction.

    ``temperature > 0``: STOCHASTIC speculative sampling (the standard
    accept/reject scheme): the draft SAMPLES k proposals from its filtered
    distribution q, the target computes its filtered distribution p at all
    k+1 positions in one forward, and proposal ``x`` is accepted with
    probability ``min(1, p(x)/q(x))``; on the first rejection the token is
    resampled from the residual ``normalize(max(p − q, 0))``, and when all
    k are accepted a bonus token is sampled from p at position k+1.  The
    emitted sequence is distributed EXACTLY as the target's own filtered
    sampling — the same ``temperature``/``top_k`` transform the plain
    decode path's :func:`make_sampler` applies (``logits/T`` then top-k
    mask) — independent of the draft (the draft only controls the speedup).
    ``generate`` then takes a PRNG key: ``generate(tvars, dvars, prompt,
    key)``.  All randomness is keyed by ABSOLUTE output position (three
    disjoint fold_in streams: proposals/bonus, acceptance uniforms,
    residual resamples), so with ``draft == target`` every acceptance test
    passes (p == q up to float rounding) and the output is token-for-token
    the plain keyed sampling of the target.

    TPU-native mechanics (all static shapes, one compiled program):

    * rollback is free: rejected draft rows sit in cache positions beyond
      the accepted prefix, and decode at position p always writes row p
      before attending to it — the same overwrite-before-first-exposure
      invariant DecodeEngine's parked slots rely on — so "rewind" is just
      "don't advance the position".
    * each round verifies k+1 positions (the k draft tokens AND the bonus
      position after them), accepting 1..k+1 tokens; the draft runs one
      extra step to consume its own k-th proposal so its cache never holds
      an unwritten row.  The emit buffer is padded by k+1 so each round can
      write its full (k+1)-vector (garbage beyond the accepted length is
      overwritten by the next round's write); a ``lax.while_loop`` runs
      rounds until n_new tokens are emitted.

    Requires ``prompt_len + n_new + k <= min(target.max_len,
    draft.max_len)`` (verification headroom) and matching vocab.  B = 1
    (speculative acceptance lengths diverge across a batch; batch via vmap
    of the whole generator if needed).

    Returns ``generate(target_vars, draft_vars, prompt(1, prompt_len)) ->
    (1, n_new) int32``.
    """
    if k < 1:
        raise ValueError("k must be >= 1 (k draft tokens per verify round)")
    if target.vocab != draft.vocab:
        raise ValueError("target and draft must share a vocab")
    if prompt_len + n_new + k > min(target.max_len, draft.max_len):
        raise ValueError(
            f"prompt_len + n_new + k = {prompt_len + n_new + k} exceeds "
            f"max_len = {min(target.max_len, draft.max_len)} "
            "(speculative verification needs k tokens of cache headroom)")
    if temperature > 0.0:
        return _make_sampled_speculative(
            target, draft, prompt_len, n_new, k=k, cache_dtype=cache_dtype,
            temperature=temperature, top_k=top_k, return_stats=return_stats,
            jit=jit)

    def generate(tvars, dvars, prompt):
        if prompt.shape != (1, prompt_len):
            raise ValueError(f"speculative decode is B=1: prompt shape "
                             f"{prompt.shape} != (1, {prompt_len})")
        tlog, tcache, pos = prefill(target, tvars, prompt,
                                    cache_dtype=cache_dtype)
        _, dcache, _ = prefill(draft, dvars, prompt, cache_dtype=cache_dtype)
        first = jnp.argmax(tlog[0], -1).astype(jnp.int32)
        out = jnp.zeros((n_new + k + 1,), jnp.int32)
        out = out.at[0].set(first)

        def round_body(carry):
            out, count, last, tcache, dcache, pos, rounds = carry

            def draft_step(c, _):
                tok, dc, p = c
                logits, dc = draft.apply(dvars, tok[None, None], cache=dc,
                                         cache_index=p)
                nxt = jnp.argmax(logits[0, -1], -1).astype(jnp.int32)
                return (nxt, dc, p + 1), nxt

            # k+1 draft steps: k proposals, plus consuming d_k so the draft
            # cache row for it exists if all k are accepted (its extra
            # proposal is discarded)
            (_, dcache, _), d_all = jax.lax.scan(
                draft_step, (last, dcache, pos), None, length=k + 1)
            d = d_all[:k]

            v = jnp.concatenate([last[None], d])      # (k+1,)
            logits, tcache = target.apply(tvars, v[None, :], cache=tcache,
                                          cache_index=pos)
            g = jnp.argmax(logits[0], -1).astype(jnp.int32)  # (k+1,)
            m = jnp.sum(jnp.cumprod((d == g[:k]).astype(jnp.int32)))
            len_e = m + 1                                     # 1..k+1
            # write the full (k+1)-vector; positions beyond len_e hold
            # garbage that the NEXT round's write (starting at count +
            # len_e) overwrites before it can ever be read.  The count < n_new
            # guard makes the generator vmap-safe: under vmap the while_loop
            # keeps stepping finished lanes until every lane is done, and an
            # unguarded write with count past the buffer end would clamp
            # backwards onto valid tokens.
            out = jnp.where(count < n_new,
                            jax.lax.dynamic_update_slice(out, g, (count,)),
                            out)
            last = g[len_e - 1]
            return (out, count + len_e, last, tcache, dcache, pos + len_e,
                    rounds + 1)

        def cond(carry):
            return carry[1] < n_new

        out, count, _, _, _, _, rounds = jax.lax.while_loop(
            cond, round_body,
            (out, jnp.asarray(1, jnp.int32), first, tcache, dcache, pos,
             jnp.asarray(0, jnp.int32)))
        toks = out[:n_new][None, :]
        if return_stats:
            # mean accepted tokens per verify round (the speedup ceiling).
            # Only meaningful UNBATCHED: under vmap, finished lanes keep
            # stepping until all lanes complete, inflating their counters.
            return toks, {"rounds": rounds,
                          "accepted_per_round": (count - 1) / jnp.maximum(
                              rounds, 1)}
        return toks

    return jax.jit(generate) if jit else generate


def _make_sampled_speculative(target, draft, prompt_len: int, n_new: int, *,
                              k: int, cache_dtype, temperature: float,
                              top_k: Optional[int], return_stats: bool,
                              jit: bool):
    """Stochastic speculative sampling body of
    :func:`make_speculative_generate` (temperature > 0); see its docstring
    for semantics.  Shares the greedy path's cache mechanics (rollback =
    don't advance the position; overwrite-before-first-exposure).
    """

    def generate(tvars, dvars, prompt, key):
        if prompt.shape != (1, prompt_len):
            raise ValueError(f"speculative decode is B=1: prompt shape "
                             f"{prompt.shape} != (1, {prompt_len})")
        # Three disjoint key streams, each folded by ABSOLUTE output
        # position j: proposals/bonus (the draft's sample at position j IS
        # the target's sample there when p == q), acceptance uniforms, and
        # residual resamples.
        ks = jax.random.fold_in(key, 1)
        ka = jax.random.fold_in(key, 2)
        kr = jax.random.fold_in(key, 3)

        tlog, tcache, pos = prefill(target, tvars, prompt,
                                    cache_dtype=cache_dtype)
        _, dcache, _ = prefill(draft, dvars, prompt, cache_dtype=cache_dtype)
        first = jax.random.categorical(
            jax.random.fold_in(ks, 0),
            _filter_logits(tlog[0], temperature, top_k)).astype(jnp.int32)
        out = jnp.zeros((n_new + k + 1,), jnp.int32)
        out = out.at[0].set(first)

        def round_body(carry):
            out, count, last, tcache, dcache, pos, rounds = carry

            def draft_step(c, i):
                tok, dc, p = c
                logits, dc = draft.apply(dvars, tok[None, None], cache=dc,
                                         cache_index=p)
                fl = _filter_logits(logits[0, -1], temperature, top_k)
                nxt = jax.random.categorical(
                    jax.random.fold_in(ks, count + i), fl).astype(jnp.int32)
                return (nxt, dc, p + 1), (nxt, fl)

            # k+1 draft steps: k proposals + consuming d_k (its extra
            # proposal is discarded; position count+k's key is reused by the
            # bonus sample, which is exactly the plain decode's sample there
            # when draft == target)
            (_, dcache, _), (d_all, dfl_all) = jax.lax.scan(
                draft_step, (last, dcache, pos), jnp.arange(k + 1))
            d = d_all[:k]                                   # (k,)
            q = jax.nn.softmax(dfl_all[:k], axis=-1)        # (k, vocab)

            v = jnp.concatenate([last[None], d])            # (k+1,)
            logits, tcache = target.apply(tvars, v[None, :], cache=tcache,
                                          cache_index=pos)
            tfl = _filter_logits(logits[0], temperature, top_k)  # (k+1, V)
            p = jax.nn.softmax(tfl, axis=-1)                     # (k+1, V)

            # accept proposal i iff u_i < p(d_i)/q(d_i)  (q(d_i) > 0 a.s. —
            # d_i was sampled from q); m = longest accepted prefix
            p_d = jnp.take_along_axis(p[:k], d[:, None], 1)[:, 0]
            q_d = jnp.take_along_axis(q, d[:, None], 1)[:, 0]
            u = jax.vmap(lambda i: jax.random.uniform(
                jax.random.fold_in(ka, count + i)))(jnp.arange(k))
            accept = (u * q_d < p_d).astype(jnp.int32)
            m = jnp.sum(jnp.cumprod(accept))                # 0..k

            # correction token at position count+m:
            #  - m < k (rejection): resample from max(p_m − q_m, 0); the
            #    residual sums to 0 only if p == q exactly there (then the
            #    acceptance test can't have rejected — guard for float dust
            #    by falling back to p_m)
            #  - m == k (all accepted): bonus sample from p_k
            p_m = jax.lax.dynamic_index_in_dim(p, m, 0, keepdims=False)
            q_m = jax.lax.dynamic_index_in_dim(
                jnp.concatenate([q, jnp.zeros_like(q[:1])]), m, 0,
                keepdims=False)
            tfl_m = jax.lax.dynamic_index_in_dim(tfl, m, 0, keepdims=False)
            resid = jnp.maximum(p_m - q_m, 0.0)
            resid_logits = jnp.where(jnp.sum(resid) > 0.0, jnp.log(resid),
                                     tfl_m)
            z_rej = jax.random.categorical(
                jax.random.fold_in(kr, count + m), resid_logits)
            z_bonus = jax.random.categorical(
                jax.random.fold_in(ks, count + k), tfl[k])
            z = jnp.where(m == k, z_bonus, z_rej).astype(jnp.int32)

            emit = jnp.concatenate([d, jnp.zeros((1,), jnp.int32)])
            emit = emit.at[m].set(z)                        # (k+1,)
            len_e = m + 1                                   # 1..k+1
            # same vmap-safety guard + garbage-beyond-len_e argument as the
            # greedy path (see make_speculative_generate)
            out = jnp.where(count < n_new,
                            jax.lax.dynamic_update_slice(out, emit, (count,)),
                            out)
            return (out, count + len_e, z, tcache, dcache, pos + len_e,
                    rounds + 1)

        def cond(carry):
            return carry[1] < n_new

        out, count, _, _, _, _, rounds = jax.lax.while_loop(
            cond, round_body,
            (out, jnp.asarray(1, jnp.int32), first, tcache, dcache, pos,
             jnp.asarray(0, jnp.int32)))
        toks = out[:n_new][None, :]
        if return_stats:
            return toks, {"rounds": rounds,
                          "accepted_per_round": (count - 1) / jnp.maximum(
                              rounds, 1)}
        return toks

    return jax.jit(generate) if jit else generate


class SpeculativeDecodeEngine:
    """Token-level continuous batching WITH speculative decoding: every
    dispatcher iteration advances all active slots by one draft-propose /
    target-verify round (1..k+1 tokens each), instead of one token.

    Combines the two serving mechanisms above: the per-slot vector
    ``cache_index`` machinery (each slot at its own depth) and the
    speculative round (draft scans k tokens, target verifies them in ONE
    k-position forward).  Greedy (default): output per request is EXACTLY
    the target's greedy decode.  With ``temperature > 0`` (and ``rng``),
    rounds run STOCHASTIC speculative sampling (same accept/reject scheme
    as :func:`make_speculative_generate`, vectorized over slots): each
    request's output is distributed as the target's own
    temperature/``top_k`` sampling.  Slots accept/retire at round
    boundaries.

    Two global KV caches (target + draft), both with the
    overwrite-before-first-exposure parking discipline; a parked slot's
    verify writes land in its cache tail and are fully replaced by the next
    admit's whole-slot prefill write.

    Intended for B=1-latency-critical serving where a trained draft exists;
    the plain ``DecodeEngine`` remains the fit when there is no draft.
    """

    def __init__(self, target, draft, target_vars, draft_vars, *,
                 max_batch: int = 4, prompt_buckets: Sequence[int] = (32, 128),
                 k: int = 4, cache_dtype=jnp.float32,
                 temperature: float = 0.0, top_k: Optional[int] = None,
                 rng=None, prefill_chunk: Optional[int] = 32,
                 eos_id: Optional[int] = None, max_wait_ms: float = 2.0):
        """``eos_id``: retire a request early when it emits this token (the
        result includes the eos; accepted tokens after it in the same round
        are dropped — DecodeEngine semantics)."""
        if k < 1:
            raise ValueError("k must be >= 1")
        if temperature > 0.0 and rng is None:
            raise ValueError("temperature > 0 needs an rng key")
        if prefill_chunk is not None and prefill_chunk < 1:
            raise ValueError("prefill_chunk must be >= 1 or None")
        if target.vocab != draft.vocab:
            raise ValueError("target and draft must share a vocab")
        _warn_moe_capacity(target)
        _warn_moe_capacity(draft)
        if k + 2 >= min(target.max_len, draft.max_len):
            # the parked position max_len - k - 2 must stay positive, or the
            # jnp.minimum(pos + len_e, park) clamp in _round would drag
            # ACTIVE slots' positions backward (silent state corruption)
            raise ValueError(
                f"k = {k} too large for max_len = "
                f"{min(target.max_len, draft.max_len)}: need k + 2 < max_len "
                "(k+1 verify rows plus a parked row must fit)")
        self.target, self.draft = target, draft
        self.tvars, self.dvars = target_vars, draft_vars
        self.max_batch = max_batch
        self.buckets = sorted(prompt_buckets)
        self.eos_id = eos_id
        self.k = k
        self.max_len = min(target.max_len, draft.max_len)
        self._park = self.max_len - k - 2  # verify writes k+1 rows from pos
        self._rng = rng
        self._sampled = temperature > 0.0
        self._temperature, self._top_k = temperature, top_k
        self._counter = 0
        self.prefill_chunk = prefill_chunk
        self._build_device_state(cache_dtype)

        self._queue: "queue.Queue[_GenRequest]" = queue.Queue()
        self._slots: list = [None] * max_batch
        self._pending: list = []  # in-flight chunked admissions (FIFO)
        self._lifecycle_lock = threading.Lock()
        self._state_lock = threading.Lock()  # dispatcher iteration vs warmup
        self._stop = False
        self.max_wait_s = max_wait_ms / 1e3
        self.stats = {"requests": 0, "rounds": 0, "accepted_tokens": 0,
                      "admission_chunks": 0,
                      "admission_interleave": deque(maxlen=1024)}
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _build_device_state(self, cache_dtype):
        """Create both models' KV caches + positions and compile wrappers
        for the three engine programs (admission chunk, final chunk, the
        speculative round).  ``PagedSpeculativeDecodeEngine`` overrides this
        with the block-table layout."""
        max_batch = self.max_batch
        k = self.k
        temperature, top_k = self._temperature, self._top_k
        self._tcache = init_kv_cache(self.target, max_batch,
                                     dtype=cache_dtype,
                                     max_len=self.target.max_len)
        self._dcache = init_kv_cache(self.draft, max_batch, dtype=cache_dtype,
                                     max_len=self.draft.max_len)
        self._pos = jnp.full((max_batch,), self._park, jnp.int32)
        self._tok = jnp.zeros((max_batch,), jnp.int32)
        sampled = self._sampled

        def _chunk(tvars, dvars, t_sc, d_sc, tokens, start):
            """One admission chunk through BOTH models' private slot caches
            (see DecodeEngine: chunked admission bounds the round gap)."""
            _, t_sc = self.target.apply(tvars, tokens, cache=t_sc,
                                        cache_index=start)
            _, d_sc = self.draft.apply(dvars, tokens, cache=d_sc,
                                       cache_index=start)
            return t_sc, d_sc

        def _final_chunk(tvars, dvars, tcache, dcache, t_sc, d_sc, tokens,
                         start, true_len, slot, key):
            tlogits, t_sc = self.target.apply(tvars, tokens, cache=t_sc,
                                              cache_index=start)
            _, d_sc = self.draft.apply(dvars, tokens, cache=d_sc,
                                       cache_index=start)

            def insert(cache, sc):
                return jax.tree.map(
                    lambda g, s: jax.lax.dynamic_update_slice(
                        g, s.astype(g.dtype), (slot,) + (0,) * (g.ndim - 1)),
                    cache, sc)

            tcache, dcache = insert(tcache, t_sc), insert(dcache, d_sc)
            last = jax.lax.dynamic_index_in_dim(
                tlogits[0], true_len - 1 - start, axis=0, keepdims=False)
            if sampled:
                first = jax.random.categorical(
                    key, _filter_logits(last, temperature, top_k)
                ).astype(jnp.int32)
            else:
                first = jnp.argmax(last, -1).astype(jnp.int32)
            return tcache, dcache, first

        _round = self._build_round_fn()
        self._chunk_fn = jax.jit(_chunk, donate_argnums=(2, 3))
        self._final_fn = jax.jit(_final_chunk, donate_argnums=(2, 3, 4, 5))
        self._round_fn = jax.jit(_round, donate_argnums=(2, 3))

    def _build_round_fn(self):
        """The speculative round program (greedy or accept/reject sampled).
        Cache-layout agnostic: caches flow through ``model.apply`` as
        pytrees, so the SAME program serves dense and paged layouts (the
        paged engine re-jits it over its own cache structure)."""
        kk = self.k
        sampled = self._sampled
        temperature, top_k = self._temperature, self._top_k

        def _round_greedy(tvars, dvars, tcache, dcache, last, pos, key):
            def draft_step(c, _):
                tok, dc, p = c
                logits, dc = self.draft.apply(dvars, tok[:, None], cache=dc,
                                              cache_index=p)
                nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                return (nxt, dc, p + 1), nxt

            (_, dcache, _), d_all = jax.lax.scan(
                draft_step, (last, dcache, pos), None, length=kk + 1)
            d = d_all.T[:, :kk]  # (B, k); extra step consumed d_k's k/v
            v = jnp.concatenate([last[:, None], d], axis=1)     # (B, k+1)
            logits, tcache = self.target.apply(tvars, v, cache=tcache,
                                               cache_index=pos)
            g = jnp.argmax(logits, -1).astype(jnp.int32)        # (B, k+1)
            m = jnp.sum(jnp.cumprod((d == g[:, :kk]).astype(jnp.int32),
                                    axis=1), axis=1)             # (B,)
            len_e = m + 1                                        # 1..k+1
            last = jnp.take_along_axis(g, (len_e - 1)[:, None], 1)[:, 0]
            pos = jnp.minimum(pos + len_e, self._park)
            return tcache, dcache, g, len_e, last, pos

        def _round_sampled(tvars, dvars, tcache, dcache, last, pos, key):
            """Accept/reject speculative sampling, vectorized over slots
            (the engine analogue of _make_sampled_speculative; keys are
            fresh per round rather than position-folded — slots sit at
            differing depths, and only distributional correctness matters
            here)."""
            B = self.max_batch
            ks, ka, kr, kb = (jax.random.fold_in(key, i) for i in range(4))

            def draft_step(c, i):
                tok, dc, p = c
                logits, dc = self.draft.apply(dvars, tok[:, None], cache=dc,
                                              cache_index=p)
                fl = _filter_logits(logits[:, -1], temperature, top_k)
                nxt = jax.random.categorical(
                    jax.random.fold_in(ks, i), fl, axis=-1).astype(jnp.int32)
                return (nxt, dc, p + 1), (nxt, fl)

            (_, dcache, _), (d_all, dfl_all) = jax.lax.scan(
                draft_step, (last, dcache, pos), jnp.arange(kk + 1))
            d = d_all.T[:, :kk]                                # (B, k)
            q = jnp.moveaxis(jax.nn.softmax(dfl_all[:kk], -1), 0, 1)  # B,k,V
            v = jnp.concatenate([last[:, None], d], axis=1)    # (B, k+1)
            logits, tcache = self.target.apply(tvars, v, cache=tcache,
                                               cache_index=pos)
            tfl = _filter_logits(logits, temperature, top_k)   # (B, k+1, V)
            p = jax.nn.softmax(tfl, axis=-1)
            p_d = jnp.take_along_axis(p[:, :kk], d[..., None], 2)[..., 0]
            q_d = jnp.take_along_axis(q, d[..., None], 2)[..., 0]
            u = jax.random.uniform(ka, (B, kk))
            accept = (u * q_d < p_d).astype(jnp.int32)
            m = jnp.sum(jnp.cumprod(accept, axis=1), axis=1)   # (B,) 0..k
            p_m = jnp.take_along_axis(p, m[:, None, None], 1)[:, 0]   # (B,V)
            q_pad = jnp.concatenate([q, jnp.zeros_like(q[:, :1])], 1)
            q_m = jnp.take_along_axis(q_pad, m[:, None, None], 1)[:, 0]
            tfl_m = jnp.take_along_axis(tfl, m[:, None, None], 1)[:, 0]
            resid = jnp.maximum(p_m - q_m, 0.0)
            resid_logits = jnp.where(
                jnp.sum(resid, -1, keepdims=True) > 0.0, jnp.log(resid),
                tfl_m)
            z_rej = jax.random.categorical(kr, resid_logits, axis=-1)
            z_bonus = jax.random.categorical(kb, tfl[:, kk], axis=-1)
            z = jnp.where(m == kk, z_bonus, z_rej).astype(jnp.int32)
            emit = jnp.concatenate(
                [d, jnp.zeros((B, 1), jnp.int32)], axis=1)     # (B, k+1)
            emit = emit.at[jnp.arange(B), m].set(z)
            len_e = m + 1
            pos = jnp.minimum(pos + len_e, self._park)
            return tcache, dcache, emit, len_e, z, pos

        return _round_sampled if sampled else _round_greedy

    def register_prefix(self, tokens) -> Prefix:
        """Prefill a shared prompt prefix through BOTH models' private slot
        caches once; see ``DecodeEngine.register_prefix``."""
        tokens, padded, c, n_chunks = self._stage_prefix_tokens(tokens)
        t_sc = jax.tree.map(
            lambda g: jnp.zeros((1,) + g.shape[1:], g.dtype), self._tcache)
        d_sc = jax.tree.map(
            lambda g: jnp.zeros((1,) + g.shape[1:], g.dtype), self._dcache)
        for i in range(n_chunks):
            t_sc, d_sc = self._chunk_fn(
                self.tvars, self.dvars, t_sc, d_sc,
                jnp.asarray(padded[:, i * c:(i + 1) * c]),
                jnp.asarray(i * c, jnp.int32))
        jax.block_until_ready((t_sc, d_sc))
        return Prefix(tokens, int(tokens.size), (t_sc, d_sc), owner=self)

    def submit(self, prompt, n_new: int, *, prefix: Optional[Prefix] = None
               ) -> Future:
        prompt = np.asarray(prompt, np.int32)
        if prompt.ndim != 1 or prompt.size == 0:
            raise ValueError("prompt must be a non-empty 1-D token array")
        if prompt.size > self.buckets[-1]:
            raise ValueError(f"prompt length {prompt.size} exceeds the "
                             f"largest bucket {self.buckets[-1]}")
        base = 0
        if prefix is not None:
            self._check_prefix(prefix, 2)
            base = prefix.length
        if base + prompt.size + n_new + self.k + 1 > self.max_len:
            raise ValueError("prefix + prompt + n_new + k + 1 exceeds "
                             "max_len (speculative verification headroom)")
        if base + self._padded_admit_len(prompt.size) > self.max_len:
            raise ValueError(
                "the chunk-padded admission would write past max_len "
                f"(prefix {base} + padded prompt "
                f"{self._padded_admit_len(prompt.size)} > {self.max_len}); "
                "lower prefill_chunk or the bucket, or shorten the prefix")
        req = _GenRequest(prompt, n_new, prefix=prefix)
        with self._lifecycle_lock:
            if self._stop:
                raise RuntimeError("SpeculativeDecodeEngine is closed")
            self._queue.put(req)
        return req.future

    def warmup(self):
        """Compile the round program and one prefill per bucket up front.
        Must run before requests are in flight (it resets both caches)."""
        with self._state_lock:
            return self._warmup_locked()

    def _warmup_locked(self):
        if any(slot is not None for slot in self._slots) or self._pending:
            raise RuntimeError("warmup() must run before requests are in "
                               "flight (it resets the KV caches)")
        zeros = jnp.zeros((self.max_batch,), jnp.int32)
        tcache, dcache, *_ = self._round_fn(
            self.tvars, self.dvars, self._tcache, self._dcache, zeros,
            self._pos, self._next_key())
        for c in sorted({self._chunk_len(b) for b in self.buckets}):
            t_sc = jax.tree.map(
                lambda g: jnp.zeros((1,) + g.shape[1:], g.dtype), tcache)
            d_sc = jax.tree.map(
                lambda g: jnp.zeros((1,) + g.shape[1:], g.dtype), dcache)
            toks = jnp.zeros((1, c), jnp.int32)
            t_sc, d_sc = self._chunk_fn(self.tvars, self.dvars, t_sc, d_sc,
                                        toks, jnp.asarray(0, jnp.int32))
            tcache, dcache, first = self._final_fn(
                self.tvars, self.dvars, tcache, dcache, t_sc, d_sc, toks,
                jnp.asarray(0, jnp.int32), jnp.asarray(1, jnp.int32),
                jnp.asarray(0, jnp.int32), self._next_key())
            jax.block_until_ready(first)
        self._tcache = jax.tree.map(jnp.zeros_like, tcache)
        self._dcache = jax.tree.map(jnp.zeros_like, dcache)
        self._pos = jnp.full((self.max_batch,), self._park, jnp.int32)
        return None

    def close(self):
        with self._lifecycle_lock:
            self._stop = True
        self._thread.join(timeout=300)
        if not self._thread.is_alive():
            self._fail_pending(RuntimeError("SpeculativeDecodeEngine closed"))
        else:
            self._cancel_pending()  # see DecodeEngine.close

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # Explicit delegation, NOT `_x = DecodeEngine._x` class-level borrowing:
    # a borrowed method's zero-arg super() binds to the DEFINING class (the
    # bug paged_engine.py's shutdown path hit), so the next edit to any of
    # these in DecodeEngine could break here silently.  Real `def`s keep the
    # defining class correct and the shared logic in one place.

    def _fail_pending(self, exc):
        DecodeEngine._fail_pending(self, exc)

    def _drain_queue(self):
        return DecodeEngine._drain_queue(self)

    def _cancel_pending(self):
        DecodeEngine._cancel_pending(self)

    def _next_key(self):
        return DecodeEngine._next_key(self)

    def _chunk_len(self, bucket: int) -> int:
        return DecodeEngine._chunk_len(self, bucket)

    def _finished(self, req: _GenRequest) -> bool:
        return DecodeEngine._finished(self, req)

    def _check_prefix(self, prefix, n_models: int):
        DecodeEngine._check_prefix(self, prefix, n_models)

    def _padded_admit_len(self, size: int) -> int:
        return DecodeEngine._padded_admit_len(self, size)

    def _stage_prefix_tokens(self, tokens) -> tuple:
        return DecodeEngine._stage_prefix_tokens(self, tokens)

    def _stage_admissions(self, reserved: set):
        DecodeEngine._stage_admissions(self, reserved)

    def _start_admit(self, req: _GenRequest, slot: int):
        """Reserve a slot and stage the prompt for chunked admission (both
        models' private slot caches); see DecodeEngine._start_admit."""
        b = next(b for b in self.buckets if b >= req.prompt.size)
        c = self._chunk_len(b)
        n_chunks = -(-req.prompt.size // c)
        padded = np.zeros((1, n_chunks * c), np.int32)
        padded[0, : req.prompt.size] = req.prompt
        if req.prefix is not None:
            base = req.prefix.length
            t_sc = jax.tree.map(jnp.copy, req.prefix.caches[0])
            d_sc = jax.tree.map(jnp.copy, req.prefix.caches[1])
            self.stats["prefix_tokens_reused"] = (
                self.stats.get("prefix_tokens_reused", 0) + base)
        else:
            base = 0
            t_sc = jax.tree.map(
                lambda g: jnp.zeros((1,) + g.shape[1:], g.dtype),
                self._tcache)
            d_sc = jax.tree.map(
                lambda g: jnp.zeros((1,) + g.shape[1:], g.dtype),
                self._dcache)
        req.slot = slot
        self._pending.append(_PendingAdmit(
            req=req, slot=slot, slot_cache=(t_sc, d_sc), chunk_idx=0,
            n_chunks=n_chunks, padded=padded, c=c,
            steps_at_start=self.stats["rounds"], base=base))

    def _advance_admission(self, p: "_PendingAdmit"):
        i = p.chunk_idx
        toks = jnp.asarray(p.padded[:, i * p.c:(i + 1) * p.c])
        start = jnp.asarray(p.base + i * p.c, jnp.int32)
        t_sc, d_sc = p.slot_cache
        if i < p.n_chunks - 1:
            p.slot_cache = self._chunk_fn(self.tvars, self.dvars, t_sc, d_sc,
                                          toks, start)
            p.chunk_idx += 1
        else:
            self._tcache, self._dcache, first = self._final_fn(
                self.tvars, self.dvars, self._tcache, self._dcache, t_sc,
                d_sc, toks, start,
                jnp.asarray(p.base + p.req.prompt.size, jnp.int32),
                jnp.asarray(p.slot, jnp.int32), self._next_key())
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
        for slot, req in enumerate(self._slots):
            if req is not None and self._finished(req):
                if not req.future.done():
                    req.future.set_result(
                        np.asarray(req.tokens[: req.n_new], np.int32))
                self._slots[slot] = None
                self._pos = self._pos.at[slot].set(self._park)

    def _loop(self):
        while True:
            if self._stop:
                self._fail_pending(
                    RuntimeError("SpeculativeDecodeEngine closed"))
                return
            self._state_lock.acquire()
            reserved = {p.slot for p in self._pending}
            self._stage_admissions(reserved)
            # one admission chunk per iteration: active slots' round gap is
            # bounded by one chunk's compute (see DecodeEngine._loop)
            if self._pending:
                p = self._pending[0]
                try:
                    self._advance_admission(p)
                except Exception as e:  # pragma: no cover
                    self._pending.remove(p)
                    if not p.req.future.done():
                        p.req.future.set_exception(e)
            self._retire_done()
            active = [s for s in self._slots if s is not None]
            if not active and not self._pending:
                self._state_lock.release()
                time.sleep(self.max_wait_s)
                continue
            if active:
                try:
                    (self._tcache, self._dcache, g, len_e, self._tok,
                     self._pos) = self._round_fn(
                        self.tvars, self.dvars, self._tcache, self._dcache,
                        self._tok, self._pos, self._next_key())
                    g_np, len_np = np.asarray(g), np.asarray(len_e)
                except Exception as e:
                    with self._lifecycle_lock:
                        self._stop = True  # before drain: no later enqueue
                    self._fail_pending(e)
                    self._state_lock.release()
                    return
                for slot, req in enumerate(self._slots):
                    if req is None:
                        continue
                    for j in range(int(len_np[slot])):
                        if self._finished(req):  # n_new reached or eos
                            break
                        req.tokens.append(int(g_np[slot, j]))
                        self.stats["accepted_tokens"] += 1
                self.stats["rounds"] += 1
                self._retire_done()
            self._state_lock.release()
