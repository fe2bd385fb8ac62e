"""PagedSpeculativeDecodeEngine: speculative continuous batching over
block-table KV memory — the two serving disciplines composed.

Greedy speculative decoding reproduces the target's greedy output EXACTLY
regardless of draft quality (decode.py), and paged pools hold bit-identical
bytes to dense caches (test_paged.py), so the paged speculative engine must
be token-exact vs a plain dense greedy lockstep.  Pins:

* staggered requests token-exact vs lockstep greedy, with a WEAK draft
  (different init — rejection paths run) and with a perfect (self) draft;
* one block table serves BOTH models' pools (position lockstep): prefix
  pages are shared zero-copy across target and draft at once;
* pool backpressure defers FIFO and completes; pages return after retire;
* mismatched target/draft max_len is rejected (one table, one page grid);
* page reservation includes the k+1 verify headroom (pool-overflow check).
"""

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jaxlsq.models import QuantTransformerLM, default_qconfig
from jaxlsq.models.toggles import disable_observer
from jaxlsq.serve import PagedSpeculativeDecodeEngine, prefill

VOCAB, DIM, DEPTH, HEADS, MAXLEN = 64, 32, 2, 4, 24
PS, K = 4, 2


def _lm(qc, max_len=MAXLEN):
    return QuantTransformerLM(vocab=VOCAB, dim=DIM, depth=DEPTH,
                              num_heads=HEADS, qconfig=qc, max_len=max_len)


@pytest.fixture(scope="module")
def setup():
    qc = default_qconfig(8, 8, init_batches=1)
    target = _lm(qc)
    draft = _lm(qc)
    r = np.random.RandomState(5)
    toks = jnp.asarray(r.randint(0, VOCAB, (1, 8)))
    tvars = disable_observer(target.init(jax.random.key(2), toks,
                                         training=False))
    dvars = disable_observer(draft.init(jax.random.key(9), toks,
                                        training=False))  # weak draft
    return target, draft, tvars, dvars


def _greedy_ref(model, variables, prompt, n_new):
    last, cache, idx = prefill(model, variables, jnp.asarray(prompt)[None])
    tok = jnp.argmax(last, -1).astype(jnp.int32)
    out = [int(tok[0])]
    for _ in range(n_new - 1):
        logits, cache = model.apply(variables, tok[:, None], cache=cache,
                                    cache_index=idx)
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        out.append(int(tok[0]))
        idx = idx + 1
    return np.asarray(out[:n_new], np.int32)


@pytest.mark.parametrize("perfect_draft", [False, True])
def test_staggered_exact_vs_greedy(setup, perfect_draft):
    target, draft, tvars, dvars = setup
    if perfect_draft:
        draft, dvars = target, tvars
    r = np.random.RandomState(6)
    reqs = [(r.randint(0, VOCAB, size=r.randint(2, 5)), int(r.randint(2, 6)))
            for _ in range(5)]
    with PagedSpeculativeDecodeEngine(
            target, draft, tvars, dvars, num_pages=12, page_size=PS,
            max_batch=2, prompt_buckets=(4,), k=K) as eng:
        futs = []
        for i, (p, n) in enumerate(reqs):
            futs.append(eng.submit(p, n))
            if i % 2 == 0:
                time.sleep(0.05)
        outs = [f.result(timeout=300) for f in futs]
        rounds = eng.stats["rounds"]
    assert rounds > 0
    for (p, n), got in zip(reqs, outs):
        np.testing.assert_array_equal(got, _greedy_ref(target, tvars, p, n))


def test_prefix_shared_across_both_pools(setup):
    target, draft, tvars, dvars = setup
    r = np.random.RandomState(7)
    pref = r.randint(0, VOCAB, size=8)  # 2 complete pages
    suffixes = [(r.randint(0, VOCAB, size=2), 3) for _ in range(3)]
    with PagedSpeculativeDecodeEngine(
            target, draft, tvars, dvars, num_pages=14, page_size=PS,
            max_batch=2, prompt_buckets=(4,), k=K) as eng:
        h = eng.register_prefix(pref)
        assert len(h.pages) == 2  # ONE set of page ids backs both pools
        futs = [eng.submit(s, n, prefix=h) for s, n in suffixes]
        outs = [f.result(timeout=300) for f in futs]
        shared = eng.stats["prefix_pages_shared"]
    assert shared == 3 * 2
    for (s, n), got in zip(suffixes, outs):
        full = np.concatenate([pref, s])
        np.testing.assert_array_equal(got,
                                      _greedy_ref(target, tvars, full, n))


def test_pool_backpressure_defers_and_completes(setup):
    target, draft, tvars, dvars = setup
    r = np.random.RandomState(8)
    # prompt 4, n_new 4, k 2 → end 4+4+3=11 → 3 pages each
    reqs = [(r.randint(0, VOCAB, size=4), 4) for _ in range(4)]
    with PagedSpeculativeDecodeEngine(
            target, draft, tvars, dvars, num_pages=4, page_size=PS,
            max_batch=3, prompt_buckets=(4,), k=K) as eng:
        futs = [eng.submit(p, n) for p, n in reqs]
        outs = [f.result(timeout=300) for f in futs]
        deferred = eng.stats["admissions_deferred"]
        deadline = time.time() + 60
        while eng._alloc.pages_free != 4 and time.time() < deadline:
            time.sleep(0.01)
        free_after = eng._alloc.pages_free
    assert deferred > 0  # 4-page pool holds one 3-page request at a time
    assert free_after == 4
    for (p, n), got in zip(reqs, outs):
        np.testing.assert_array_equal(got, _greedy_ref(target, tvars, p, n))


def test_reservation_includes_verify_headroom(setup):
    target, draft, tvars, dvars = setup
    with PagedSpeculativeDecodeEngine(
            target, draft, tvars, dvars, num_pages=2, page_size=PS,
            max_batch=1, prompt_buckets=(4,), k=K) as eng:
        # 4 + 4 + (k+1)=3 → 11 positions → 3 pages > pool 2
        with pytest.raises(ValueError, match="pages"):
            eng.submit(np.zeros(4, np.int32), 4)


def test_mismatched_max_len_rejected(setup):
    target, draft, tvars, dvars = setup
    qc = default_qconfig(8, 8, init_batches=1)
    with pytest.raises(ValueError, match="max_len must match"):
        PagedSpeculativeDecodeEngine(target, _lm(qc, max_len=16), tvars,
                                     dvars, num_pages=8, page_size=PS, k=K)


def test_warmup_then_exact(setup):
    target, draft, tvars, dvars = setup
    r = np.random.RandomState(9)
    p = r.randint(0, VOCAB, size=3)
    with PagedSpeculativeDecodeEngine(
            target, draft, tvars, dvars, num_pages=12, page_size=PS,
            max_batch=2, prompt_buckets=(4,), k=K) as eng:
        eng.warmup()
        out = eng.submit(p, 4).result(timeout=300)
    np.testing.assert_array_equal(out, _greedy_ref(target, tvars, p, 4))
