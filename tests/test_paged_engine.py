"""PagedDecodeEngine (serve/paged_engine.py): continuous batching over
block-table KV memory.

Pins:
* staggered paged serving is TOKEN-EXACT vs the lockstep greedy reference
  (paged and dense caches hold identical bytes — test_paged.py — so the
  engine discipline is the only thing under test), on f32 and int8 pools;
* an underprovisioned pool (fewer pages than the dense equivalent) defers
  admissions FIFO under backpressure and still completes every request
  exactly; the deferral is observable in stats and pages return to the pool;
* zero-copy prefix sharing: suffix admissions point at the handle's complete
  pages (allocator refcounts prove sharing, not copying) and reproduce the
  concatenated-prompt reference exactly, including a partial trailing page;
* requests that could never fit the pool are rejected at submit; eos
  retirement frees a request's pages early.
"""

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jaxlsq.models import QuantTransformerLM, default_qconfig
from jaxlsq.models.toggles import disable_observer
from jaxlsq.serve import PagedDecodeEngine, init_kv_cache, prefill

VOCAB, DIM, DEPTH, HEADS, MAXLEN = 64, 32, 2, 4, 16
PS = 4  # page_size; MAXLEN/PS = 4 logical pages per slot


def _lm(qc):
    return QuantTransformerLM(vocab=VOCAB, dim=DIM, depth=DEPTH,
                              num_heads=HEADS, qconfig=qc, max_len=MAXLEN)


@pytest.fixture(scope="module")
def setup():
    qc = default_qconfig(8, 8, init_batches=1)
    model = _lm(qc)
    r = np.random.RandomState(5)
    variables = model.init(jax.random.key(2),
                           jnp.asarray(r.randint(0, VOCAB, (1, 8))),
                           training=False)
    return model, disable_observer(variables)


def _wait_pages(eng, want, timeout=60):
    """Page frees land one dispatcher beat AFTER the future resolves — poll."""
    deadline = time.time() + timeout
    while eng._alloc.pages_free != want and time.time() < deadline:
        time.sleep(0.01)
    return eng._alloc.pages_free


def _reference_tokens(model, variables, prompt, n_new, cache_dtype=None):
    """Lockstep greedy decode over the DENSE cache — the exactness oracle."""
    kw = {}
    if cache_dtype is not None:
        kw["cache"] = init_kv_cache(model, 1, dtype=cache_dtype)
    last, cache, idx = prefill(model, variables, jnp.asarray(prompt)[None],
                               **kw)
    tok = jnp.argmax(last, -1).astype(jnp.int32)
    toks = [int(tok[0])]
    for _ in range(n_new - 1):
        logits, cache = model.apply(variables, tok[:, None], cache=cache,
                                    cache_index=idx)
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        toks.append(int(tok[0]))
        idx = idx + 1
    return np.asarray(toks[:n_new], np.int32)


@pytest.mark.parametrize("cache_dtype", [jnp.float32, jnp.int8, jnp.int4])
def test_staggered_matches_lockstep(setup, cache_dtype):
    model, variables = setup
    r = np.random.RandomState(6)
    reqs = [(r.randint(0, VOCAB, size=r.randint(2, 7)), int(r.randint(2, 6)))
            for _ in range(7)]
    with PagedDecodeEngine(model, variables, num_pages=9, page_size=PS,
                           max_batch=3, prompt_buckets=(4, 8),
                           prefill_chunk=2,
                           cache_dtype=cache_dtype) as eng:
        futs = []
        for i, (p, n) in enumerate(reqs):
            futs.append(eng.submit(p, n))
            if i % 2 == 0:
                time.sleep(0.05)  # land mid-flight of earlier requests
        outs = [f.result(timeout=300) for f in futs]
        stats = dict(eng.stats)
        # retirement frees pages a beat after the future resolves
        free_after = _wait_pages(eng, 9)
    assert stats["requests"] == len(reqs)
    assert free_after == 9  # every retired request returned its pages
    for (p, n), got in zip(reqs, outs):
        want = _reference_tokens(model, variables, p, n,
                                 cache_dtype=cache_dtype)
        np.testing.assert_array_equal(got, want)


def test_underprovisioned_pool_defers_fifo(setup):
    """A pool holding ~1.5 requests' pages forces admission backpressure:
    requests wait for retirements, complete exactly, in order."""
    model, variables = setup
    r = np.random.RandomState(7)
    # each request: prompt 4 (bucket 4, padded 4), n_new 4 → end 8 → 2 pages
    reqs = [(r.randint(0, VOCAB, size=4), 4) for _ in range(6)]
    with PagedDecodeEngine(model, variables, num_pages=3, page_size=PS,
                           max_batch=4, prompt_buckets=(4,)) as eng:
        futs = [eng.submit(p, n) for p, n in reqs]
        outs = [f.result(timeout=300) for f in futs]
        deferred = eng.stats["admissions_deferred"]
        free_after = _wait_pages(eng, 3)
    # 3 pages fit one 2-page request at a time alongside nothing else —
    # later submissions must have been deferred at least once
    assert deferred > 0
    assert free_after == 3
    for (p, n), got in zip(reqs, outs):
        np.testing.assert_array_equal(
            got, _reference_tokens(model, variables, p, n))


@pytest.mark.parametrize("plen", [8, 6])  # 2 full pages / 1 full + partial
def test_prefix_zero_copy(setup, plen):
    model, variables = setup
    r = np.random.RandomState(8)
    prefix_toks = r.randint(0, VOCAB, size=plen)
    suffixes = [(r.randint(0, VOCAB, size=2), 3) for _ in range(3)]
    with PagedDecodeEngine(model, variables, num_pages=12, page_size=PS,
                           max_batch=3, prompt_buckets=(4,)) as eng:
        h = eng.register_prefix(prefix_toks)
        assert len(h.pages) == -(-plen // PS)
        free0 = eng._alloc.pages_free
        futs = [eng.submit(s, n, prefix=h) for s, n in suffixes]
        outs = [f.result(timeout=300) for f in futs]
        shared = eng.stats["prefix_pages_shared"]
        free_after = _wait_pages(eng, free0)
    # complete pages were SHARED (refcount bumps), not copied: every request
    # shared plen // PS pages and allocated only its fresh tail
    assert shared == 3 * (plen // PS)
    assert free_after == free0  # requests retired; handle pages still held
    for (s, n), got in zip(suffixes, outs):
        full = np.concatenate([prefix_toks, s])
        np.testing.assert_array_equal(
            got, _reference_tokens(model, variables, full, n))


def test_prefix_sharing_is_concurrent(setup):
    """Two slots decode simultaneously while POINTING AT THE SAME prefix
    pages — the strongest zero-copy evidence: during overlap, the allocator
    shows the complete prefix pages live exactly once."""
    model, variables = setup
    r = np.random.RandomState(9)
    prefix_toks = r.randint(0, VOCAB, size=8)  # 2 full pages
    with PagedDecodeEngine(model, variables, num_pages=10, page_size=PS,
                           max_batch=2, prompt_buckets=(4,)) as eng:
        h = eng.register_prefix(prefix_toks)
        futs = [eng.submit(r.randint(0, VOCAB, size=2), 4, prefix=h)
                for _ in range(2)]
        outs = [f.result(timeout=300) for f in futs]
        # refcounts: both requests shared both complete pages
        assert eng.stats["prefix_pages_shared"] == 4
    assert all(o.shape == (4,) for o in outs)


def test_rejects_pool_overflow(setup):
    model, variables = setup
    with PagedDecodeEngine(model, variables, num_pages=2, page_size=PS,
                           max_batch=2, prompt_buckets=(4, 8)) as eng:
        with pytest.raises(ValueError, match="pages"):
            eng.submit(np.zeros(8, np.int32), 6)  # needs 4 pages > pool 2
        # a fitting request still works
        out = eng.submit(np.zeros(4, np.int32), 2).result(timeout=300)
        assert out.shape == (2,)


def test_eos_frees_pages_early(setup):
    model, variables = setup
    r = np.random.RandomState(10)
    prompt = r.randint(0, VOCAB, size=4)
    ref = _reference_tokens(model, variables, prompt, 8)
    eos = int(ref[1])  # force retirement after 2 tokens
    with PagedDecodeEngine(model, variables, num_pages=4, page_size=PS,
                           max_batch=1, prompt_buckets=(4,),
                           eos_id=eos) as eng:
        out = eng.submit(prompt, 8).result(timeout=300)
        deadline = time.time() + 60
        while eng._alloc.pages_free != 4 and time.time() < deadline:
            time.sleep(0.01)
        assert eng._alloc.pages_free == 4
    np.testing.assert_array_equal(out[:2], ref[:2])
    assert int(out[1]) == eos and out.size == 2


def test_warmup_compiles_and_preserves_exactness(setup):
    model, variables = setup
    r = np.random.RandomState(11)
    p = r.randint(0, VOCAB, size=5)
    with PagedDecodeEngine(model, variables, num_pages=9, page_size=PS,
                           max_batch=3, prompt_buckets=(4, 8)) as eng:
        eng.warmup()
        out = eng.submit(p, 4).result(timeout=300)
    np.testing.assert_array_equal(
        out, _reference_tokens(model, variables, p, 4))


def test_window_frees_slid_pages(setup):
    """Sliding-window model (attn_window): pages that slid fully out of
    every future query's window are freed MID-FLIGHT, unblocking deferred
    admissions before the long request retires; tokens stay exact vs the
    windowed lockstep reference."""
    qc = default_qconfig(8, 8, init_batches=1)
    model = QuantTransformerLM(vocab=VOCAB, dim=DIM, depth=DEPTH,
                               num_heads=HEADS, qconfig=qc, max_len=MAXLEN,
                               attn_window=4)
    r = np.random.RandomState(12)
    variables = disable_observer(model.init(
        jax.random.key(4), jnp.asarray(r.randint(0, VOCAB, (1, 8))),
        training=False))
    long_p = r.randint(0, VOCAB, size=4)   # 4 + 8 new → 6 pages of 2
    short_p = r.randint(0, VOCAB, size=2)  # 2 + 2 new → 2 pages
    with PagedDecodeEngine(model, variables, num_pages=6, page_size=2,
                           max_batch=2, prompt_buckets=(4,)) as eng:
        fa = eng.submit(long_p, 8)   # reserves the whole pool
        fb = eng.submit(short_p, 2)  # must wait for slid-out pages
        outs = [fa.result(timeout=300), fb.result(timeout=300)]
        freed = eng.stats["window_pages_freed"]
        free_after = _wait_pages(eng, 6)
    assert freed >= 2  # pages 0..1 died once the window slid past them
    assert free_after == 6
    np.testing.assert_array_equal(
        outs[0], _reference_tokens(model, variables, long_p, 8))
    np.testing.assert_array_equal(
        outs[1], _reference_tokens(model, variables, short_p, 2))


def test_prefix_cross_engine_rejected(setup):
    model, variables = setup
    with PagedDecodeEngine(model, variables, num_pages=6, page_size=PS,
                           max_batch=1, prompt_buckets=(4,)) as a, \
         PagedDecodeEngine(model, variables, num_pages=6, page_size=PS,
                           max_batch=1, prompt_buckets=(4,)) as b:
        h = a.register_prefix(np.zeros(4, np.int32))
        with pytest.raises(ValueError, match="different engine"):
            b.submit(np.zeros(2, np.int32), 2, prefix=h)
