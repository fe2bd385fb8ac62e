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

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["init_kv_cache", "prefill", "make_generate"]


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
                  jit: bool = True):
    """Build ``generate(variables, prompt) -> (B, n_new) tokens``: prefill +
    ``lax.scan`` greedy decode fused into one compiled program.

    Args:
      model: a ``QuantTransformerLM`` (QAT or serve mode).
      prompt_len: static prompt length (one compiled program per length —
        bucket prompts like the serving engine buckets batch sizes).
      n_new: number of tokens to generate.
      logits_to_token: (B, vocab) -> (B,) int32; default greedy argmax.
      jit: wrap in jax.jit (disable to compose with an outer pjit).
    """
    if prompt_len + n_new > model.max_len:
        raise ValueError(
            f"prompt_len + n_new = {prompt_len + n_new} exceeds model.max_len "
            f"= {model.max_len}")
    pick = logits_to_token or (
        lambda logits: jnp.argmax(logits, axis=-1).astype(jnp.int32))

    def generate(variables, prompt: jnp.ndarray) -> jnp.ndarray:
        assert prompt.shape[1] == prompt_len, (
            f"prompt length {prompt.shape[1]} != compiled {prompt_len}")
        last_logits, cache, index = prefill(model, variables, prompt,
                                            cache_dtype=cache_dtype)
        first = pick(last_logits)

        def step(carry, _):
            tok, cache, idx = carry
            logits, cache = model.apply(variables, tok[:, None], cache=cache,
                                        cache_index=idx)
            nxt = pick(logits[:, -1])
            return (nxt, cache, idx + 1), nxt

        (_, _, _), rest = jax.lax.scan(
            step, (first, cache, index), None, length=n_new - 1)
        # rest: (n_new-1, B) time-major from scan → (B, n_new)
        return jnp.concatenate([first[:, None], rest.T], axis=1)

    return jax.jit(generate) if jit else generate
