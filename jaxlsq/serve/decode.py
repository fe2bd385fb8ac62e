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
from concurrent.futures import Future
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["init_kv_cache", "prefill", "make_generate", "make_sampler",
           "make_speculative_generate", "DecodeEngine",
           "SpeculativeDecodeEngine"]


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
    write and cast back for the attention dots."""
    L = model.max_len if max_len is None else max_len
    hd = model.dim // model.num_heads
    shape = (batch_size, model.num_heads, L, hd)
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
    if t > cache[0][0].shape[2]:
        raise ValueError(f"prompt length {t} exceeds cache max_len "
                         f"{cache[0][0].shape[2]}")
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
    __slots__ = ("prompt", "n_new", "future", "tokens", "slot")

    def __init__(self, prompt: np.ndarray, n_new: int):
        self.prompt = prompt
        self.n_new = n_new
        self.future: Future = Future()
        self.tokens: list = []
        self.slot = -1


class DecodeEngine:
    """Iteration-level (token-level) continuous batching for autoregressive
    generation — the serving discipline the request-level ``ServingEngine``
    cannot express: new requests JOIN the running batch at the next token
    boundary instead of waiting for the whole batch to finish.

    TPU-native design (all static shapes; two compiled programs total plus
    one prefill program per prompt-length bucket):

    * One global KV cache of fixed shape (max_batch, H, max_len, hd) per
      layer.  Each batch slot holds one request at its own decode depth —
      the model's vector ``cache_index`` path (models/zoo.py) masks each
      slot's attention to its own [0, pos) prefix.
    * ``prefill``: the prompt is right-padded to a length bucket and run at
      B=1; the padded rows write garbage k/v BEYOND the true length, which
      is provably never read — decode at position p attends kpos <= p and
      overwrites row p before attending to it, so garbage rows are always
      overwritten before first exposure.  The slot's cache is written into
      the global cache in the same compiled program.
    * ``decode step``: one program advances ALL active slots one token
      (argmax).  Free slots run parked at max_len-1 (same
      overwrite-before-read argument); their output tokens are ignored.
    * The host loop (dispatcher thread) only admits/retires requests and
      relays tokens — everything shape-dependent is compiled once.

    Args:
      model: a ``QuantTransformerLM``-shaped module (QAT or serve mode).
      variables: its (possibly converted + sharded) variables.
      max_batch: number of concurrent decode slots.
      prompt_buckets: ascending prompt-length buckets (one compiled prefill
        per bucket); prompts longer than the largest bucket are rejected.
      cache_dtype: KV cache dtype (bf16 halves cache traffic).
      max_wait_ms: dispatcher sleep when completely idle.
    """

    def __init__(self, model, variables, *, max_batch: int = 8,
                 prompt_buckets: Sequence[int] = (32, 128),
                 cache_dtype=jnp.float32, max_wait_ms: float = 2.0,
                 eos_id: Optional[int] = None,
                 logits_to_token: Optional[Callable] = None,
                 rng=None):
        """``eos_id``: retire a request early when it emits this token (the
        result includes the eos).  ``logits_to_token``/``rng``: plug a
        sampler (see :func:`make_sampler`) — with ``rng`` set, the sampler
        is called as ``pick(logits, key)`` with per-step folded keys."""
        self.model = model
        self.variables = variables
        self.max_batch = max_batch
        self.buckets = sorted(prompt_buckets)
        self.max_len = model.max_len
        self.eos_id = eos_id
        self._rng = rng
        self._sampled = rng is not None
        self._counter = 0
        pick = logits_to_token or (
            lambda logits, *a: jnp.argmax(logits, -1).astype(jnp.int32))
        self._cache = init_kv_cache(model, max_batch, dtype=cache_dtype)
        self._pos = jnp.full((max_batch,), self.max_len - 1, jnp.int32)
        self._tok = jnp.zeros((max_batch,), jnp.int32)
        sampled = self._sampled

        def _prefill_insert(variables, cache, prompt, true_len, slot, key):
            """Run one padded prompt, write its k/v into global-cache slot
            ``slot``, return (cache', first token)."""
            slot_cache = jax.tree.map(
                lambda g: jnp.zeros((1,) + g.shape[1:], g.dtype), cache)
            logits, slot_cache = self.model.apply(
                variables, prompt, cache=slot_cache,
                cache_index=jnp.zeros((), jnp.int32))
            last = jax.lax.dynamic_index_in_dim(logits[0], true_len - 1,
                                                axis=0, keepdims=True)
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

        self._prefill_fn = jax.jit(_prefill_insert, donate_argnums=(1,))
        self._step_fn = jax.jit(_step, donate_argnums=(1,))

        self._queue: "queue.Queue[_GenRequest]" = queue.Queue()
        self._slots: list = [None] * max_batch
        self._lifecycle_lock = threading.Lock()
        # serializes device-state mutation (dispatcher iteration vs warmup)
        self._state_lock = threading.Lock()
        self._stop = False
        self.max_wait_s = max_wait_ms / 1e3
        self.stats = {"requests": 0, "steps": 0, "slot_tokens": 0,
                      "active_token_sum": 0}
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------ API

    def warmup(self):
        """Compile the decode step and one prefill per bucket up front (first
        compiles otherwise land on the first unlucky requests).  Must run
        before requests are in flight — it resets the cache/positions."""
        with self._state_lock:
            if any(slot is not None for slot in self._slots):
                raise RuntimeError(
                    "warmup() must run before requests are in flight "
                    "(it resets the KV cache)")
            zeros = jnp.zeros((self.max_batch,), jnp.int32)
            cache, nxt, pos = self._step_fn(self.variables, self._cache,
                                            zeros, self._pos, self._next_key())
            jax.block_until_ready(nxt)
            for b in self.buckets:
                cache, first = self._prefill_fn(
                    self.variables, cache, jnp.zeros((1, b), jnp.int32),
                    1, 0, self._next_key())
                jax.block_until_ready(first)
            # restore a clean parked state (warmup wrote junk rows, all of
            # which sit beyond every parked position and would be overwritten
            # before first exposure anyway; reset for tidiness)
            self._cache = jax.tree.map(jnp.zeros_like, cache)
            self._pos = jnp.full((self.max_batch,), self.max_len - 1,
                                 jnp.int32)

    def submit(self, prompt, n_new: int) -> Future:
        """Queue one generation request; Future resolves to an (n_new,) int32
        array of greedily decoded tokens."""
        prompt = np.asarray(prompt, np.int32)
        if prompt.ndim != 1 or prompt.size == 0:
            raise ValueError("prompt must be a non-empty 1-D token array")
        if prompt.size > self.buckets[-1]:
            raise ValueError(
                f"prompt length {prompt.size} exceeds the largest bucket "
                f"{self.buckets[-1]}")
        if prompt.size + n_new > self.max_len:
            raise ValueError("prompt + n_new exceeds model.max_len")
        req = _GenRequest(prompt, n_new)
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
        for req in list(self._slots) + self._drain_queue():
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

    def _admit(self, req: _GenRequest, slot: int):
        b = next(b for b in self.buckets if b >= req.prompt.size)
        padded = np.zeros((1, b), np.int32)
        padded[0, : req.prompt.size] = req.prompt
        self._cache, first = self._prefill_fn(
            self.variables, self._cache, jnp.asarray(padded),
            req.prompt.size, slot, self._next_key())
        self._tok = self._tok.at[slot].set(first)
        self._pos = self._pos.at[slot].set(req.prompt.size)
        req.tokens.append(int(first))
        req.slot = slot
        self._slots[slot] = req
        self.stats["requests"] += 1

    def _retire_done(self):
        for slot, req in enumerate(self._slots):
            if req is not None and self._finished(req):
                if not req.future.done():  # close() may have raced us
                    req.future.set_result(
                        np.asarray(req.tokens[: req.n_new], np.int32))
                self._slots[slot] = None
                # park the freed slot
                self._pos = self._pos.at[slot].set(self.max_len - 1)

    def _loop(self):
        while True:
            if self._stop:
                self._fail_pending(RuntimeError("DecodeEngine closed"))
                return
            # admit into free slots at the token boundary
            self._state_lock.acquire()
            for slot in range(self.max_batch):
                if self._slots[slot] is None:
                    try:
                        req = self._queue.get_nowait()
                    except queue.Empty:
                        break
                    try:
                        self._admit(req, slot)
                    except Exception as e:  # pragma: no cover
                        if not req.future.done():  # may be cancelled
                            req.future.set_exception(e)
            self._retire_done()
            active = [s for s in self._slots if s is not None]
            if not active:
                self._state_lock.release()
                time.sleep(self.max_wait_s)
                continue
            try:
                self._cache, nxt, self._pos = self._step_fn(
                    self.variables, self._cache, self._tok, self._pos,
                    self._next_key())
                toks = np.asarray(nxt)
            except Exception as e:  # device failure: fail fast, don't hang
                for req in self._slots:
                    if req is not None and not req.future.done():
                        req.future.set_exception(e)
                self._slots = [None] * self.max_batch
                with self._lifecycle_lock:
                    self._stop = True
                for req in self._drain_queue():
                    req.future.set_exception(e)
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


def make_speculative_generate(target, draft, prompt_len: int, n_new: int, *,
                              k: int = 4, cache_dtype=jnp.float32,
                              return_stats: bool = False,
                              jit: bool = True):
    """Greedy speculative decoding: a cheap ``draft`` LM proposes ``k``
    tokens per round, the ``target`` verifies them in ONE forward (k
    positions = one weight stream, the same HBM cost as a single decode
    step), and the longest agreeing prefix plus the target's correction is
    emitted.  Output is EXACTLY the target's greedy decode, by construction.

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


class SpeculativeDecodeEngine:
    """Token-level continuous batching WITH speculative decoding: every
    dispatcher iteration advances all active slots by one draft-propose /
    target-verify round (1..k+1 tokens each), instead of one token.

    Combines the two serving mechanisms above: the per-slot vector
    ``cache_index`` machinery (each slot at its own depth) and the
    speculative round (draft scans k tokens, target verifies them in ONE
    k-position forward).  Output per request is EXACTLY the target's greedy
    decode.  Slots accept/retire at round boundaries.

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
                 max_wait_ms: float = 2.0):
        if k < 1:
            raise ValueError("k must be >= 1")
        if target.vocab != draft.vocab:
            raise ValueError("target and draft must share a vocab")
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
        self.k = k
        self.max_len = min(target.max_len, draft.max_len)
        self._tcache = init_kv_cache(target, max_batch, dtype=cache_dtype,
                                     max_len=target.max_len)
        self._dcache = init_kv_cache(draft, max_batch, dtype=cache_dtype,
                                     max_len=draft.max_len)
        park = self.max_len - k - 2  # verify+draft write k+1 rows from pos
        self._pos = jnp.full((max_batch,), park, jnp.int32)
        self._park = park
        self._tok = jnp.zeros((max_batch,), jnp.int32)

        def _prefill_insert(tvars, dvars, tcache, dcache, prompt, true_len,
                            slot):
            def one(model, variables, cache):
                sc = jax.tree.map(
                    lambda g: jnp.zeros((1,) + g.shape[1:], g.dtype), cache)
                logits, sc = model.apply(variables, prompt, cache=sc,
                                         cache_index=jnp.zeros((), jnp.int32))
                new = jax.tree.map(
                    lambda g, s: jax.lax.dynamic_update_slice(
                        g, s.astype(g.dtype), (slot,) + (0,) * (g.ndim - 1)),
                    cache, sc)
                return logits, new

            tlogits, tcache = one(self.target, tvars, tcache)
            _, dcache = one(self.draft, dvars, dcache)
            last = jax.lax.dynamic_index_in_dim(tlogits[0], true_len - 1,
                                                axis=0, keepdims=False)
            first = jnp.argmax(last, -1).astype(jnp.int32)
            return tcache, dcache, first

        kk = self.k

        def _round(tvars, dvars, tcache, dcache, last, pos):
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

        self._prefill_fn = jax.jit(_prefill_insert, donate_argnums=(2, 3))
        self._round_fn = jax.jit(_round, donate_argnums=(2, 3))

        self._queue: "queue.Queue[_GenRequest]" = queue.Queue()
        self._slots: list = [None] * max_batch
        self._lifecycle_lock = threading.Lock()
        self._state_lock = threading.Lock()  # dispatcher iteration vs warmup
        self._stop = False
        self.max_wait_s = max_wait_ms / 1e3
        self.stats = {"requests": 0, "rounds": 0, "accepted_tokens": 0}
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, prompt, n_new: int) -> Future:
        prompt = np.asarray(prompt, np.int32)
        if prompt.ndim != 1 or prompt.size == 0:
            raise ValueError("prompt must be a non-empty 1-D token array")
        if prompt.size > self.buckets[-1]:
            raise ValueError(f"prompt length {prompt.size} exceeds the "
                             f"largest bucket {self.buckets[-1]}")
        if prompt.size + n_new + self.k + 1 > self.max_len:
            raise ValueError("prompt + n_new + k + 1 exceeds max_len "
                             "(speculative verification headroom)")
        req = _GenRequest(prompt, n_new)
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
        if any(slot is not None for slot in self._slots):
            raise RuntimeError("warmup() must run before requests are in "
                               "flight (it resets the KV caches)")
        zeros = jnp.zeros((self.max_batch,), jnp.int32)
        tcache, dcache, *_ = self._round_fn(
            self.tvars, self.dvars, self._tcache, self._dcache, zeros,
            self._pos)
        for b in self.buckets:
            tcache, dcache, first = self._prefill_fn(
                self.tvars, self.dvars, tcache, dcache,
                jnp.zeros((1, b), jnp.int32), 1, 0)
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

    _fail_pending = DecodeEngine._fail_pending
    _drain_queue = DecodeEngine._drain_queue
    _cancel_pending = DecodeEngine._cancel_pending

    def _admit(self, req: _GenRequest, slot: int):
        b = next(b for b in self.buckets if b >= req.prompt.size)
        padded = np.zeros((1, b), np.int32)
        padded[0, : req.prompt.size] = req.prompt
        self._tcache, self._dcache, first = self._prefill_fn(
            self.tvars, self.dvars, self._tcache, self._dcache,
            jnp.asarray(padded), req.prompt.size, slot)
        self._tok = self._tok.at[slot].set(first)
        self._pos = self._pos.at[slot].set(req.prompt.size)
        req.tokens.append(int(first))
        req.slot = slot
        self._slots[slot] = req
        self.stats["requests"] += 1

    def _retire_done(self):
        for slot, req in enumerate(self._slots):
            if req is not None and len(req.tokens) >= req.n_new:
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
            for slot in range(self.max_batch):
                if self._slots[slot] is None:
                    try:
                        req = self._queue.get_nowait()
                    except queue.Empty:
                        break
                    try:
                        self._admit(req, slot)
                    except Exception as e:  # pragma: no cover
                        if not req.future.done():  # may be cancelled
                            req.future.set_exception(e)
            self._retire_done()
            active = [s for s in self._slots if s is not None]
            if not active:
                self._state_lock.release()
                time.sleep(self.max_wait_s)
                continue
            try:
                (self._tcache, self._dcache, g, len_e, self._tok,
                 self._pos) = self._round_fn(
                    self.tvars, self.dvars, self._tcache, self._dcache,
                    self._tok, self._pos)
                g_np, len_np = np.asarray(g), np.asarray(len_e)
            except Exception as e:
                with self._lifecycle_lock:
                    self._stop = True  # before draining: no post-drain enqueue
                self._fail_pending(e)
                self._state_lock.release()
                return
            for slot, req in enumerate(self._slots):
                if req is None:
                    continue
                for j in range(int(len_np[slot])):
                    if len(req.tokens) < req.n_new:
                        req.tokens.append(int(g_np[slot, j]))
                        self.stats["accepted_tokens"] += 1
            self.stats["rounds"] += 1
            self._retire_done()
            self._state_lock.release()
