"""Paged KV cache (serve/paged.py): block-table pools vs the dense caches.

Pins:
* with the default linear table, paged prefill + decode through the LM is
  BIT-EXACT vs the dense cache on every layout (f32 / int8 / int4) — paged
  and dense hold identical bytes for the same tokens;
* page permutation is pure relabeling: scrambled tables reproduce the
  linear-table logits exactly;
* the scalar-prefetch Pallas kernel matches the gather-oracle on every
  layout, MHA and GQA, scalar and per-slot positions;
* stale garbage in unreferenced pool pages never leaks into the output;
* zero-copy prefix sharing: two slots pointing at the SAME prefix pages
  reproduce per-slot dense caches holding copied prefixes;
* the PageAllocator's refcount bookkeeping (alloc/share/free/exhaustion).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jaxlsq.models import QuantTransformerLM, default_qconfig
from jaxlsq.models.toggles import disable_observer
from jaxlsq.serve import init_kv_cache, init_paged_cache, prefill
from jaxlsq.serve.paged import (PageAllocator, PagedKVLayer, paged_attention,
                                paged_update, with_table)

LAYOUTS = ["f32", "int8", "int4"]


def _dtype(layout):
    return {"f32": jnp.float32, "int8": jnp.int8, "int4": "int4"}[layout]


def _mk_layer(r, P, KVH, ps, hd, layout, table):
    if layout == "int4":
        z = jnp.zeros((P, KVH, ps, hd // 2), jnp.uint8)
        return PagedKVLayer(kp=z, vp=z, table=table, page_size=ps,
                            ks=jnp.zeros((P, KVH, ps), jnp.float32),
                            vs=jnp.zeros((P, KVH, ps), jnp.float32))
    if layout == "int8":
        z = jnp.zeros((P, KVH, ps, hd), jnp.int8)
        return PagedKVLayer(kp=z, vp=z, table=table, page_size=ps,
                            ks=jnp.zeros((P, KVH, ps), jnp.float32),
                            vs=jnp.zeros((P, KVH, ps), jnp.float32))
    z = jnp.zeros((P, KVH, ps, hd), jnp.float32)
    return PagedKVLayer(kp=z, vp=z, table=table, page_size=ps)


@pytest.fixture(scope="module")
def lm():
    qc = default_qconfig(8, 8, init_batches=1)
    model = QuantTransformerLM(vocab=64, dim=32, depth=2, num_heads=4,
                               qconfig=qc, max_len=24)
    r = np.random.RandomState(0)
    toks = jnp.asarray(r.randint(0, 64, size=(2, 12)))
    variables = disable_observer(
        model.init(jax.random.key(0), toks, training=False))
    return model, variables, toks


@pytest.mark.parametrize("layout", LAYOUTS)
def test_paged_bit_exact_vs_dense_through_lm(lm, layout):
    model, variables, toks = lm
    dense = init_kv_cache(model, 2, dtype=_dtype(layout))
    paged = init_paged_cache(model, 2, page_size=4, dtype=_dtype(layout))
    ld, cd, _ = prefill(model, variables, toks[:, :6], cache=dense)
    lp, cp, _ = prefill(model, variables, toks[:, :6], cache=paged)
    np.testing.assert_array_equal(np.asarray(ld), np.asarray(lp))
    idx = jnp.asarray([6, 6], jnp.int32)
    for step in range(3):  # crosses the page-size-4 boundary at pos 8
        t1, cd = model.apply(variables, toks[:, 6 + step:7 + step],
                             cache=cd, cache_index=idx)
        t2, cp = model.apply(variables, toks[:, 6 + step:7 + step],
                             cache=cp, cache_index=idx)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
        idx = idx + 1


@pytest.mark.parametrize("layout", LAYOUTS)
def test_page_permutation_is_relabeling(lm, layout):
    model, variables, toks = lm
    linear = init_paged_cache(model, 2, page_size=4, dtype=_dtype(layout))
    pps = linear[0].table.shape[1]
    r = np.random.RandomState(3)
    perm = jnp.asarray(r.permutation(2 * pps).reshape(2, pps), jnp.int32)
    scrambled = with_table(linear, perm)
    l1, c1, _ = prefill(model, variables, toks[:, :7], cache=linear)
    l2, c2, _ = prefill(model, variables, toks[:, :7], cache=scrambled)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    idx = jnp.asarray(7, jnp.int32)
    t1, _ = model.apply(variables, toks[:, 7:8], cache=c1, cache_index=idx)
    t2, _ = model.apply(variables, toks[:, 7:8], cache=c2, cache_index=idx)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


CASES = [
    # B, H, KVH, t, hd, ps, written, idx_kind
    (2, 4, 4, 1, 32, 8, 30, "vector"),
    (2, 4, 2, 2, 32, 8, 30, "vector"),   # GQA + speculative t
    (1, 2, 1, 1, 32, 16, 17, "scalar"),  # lone partial page
    (2, 8, 2, 1, 64, 8, 24, "scalar"),
]


@pytest.mark.parametrize("layout", LAYOUTS)
@pytest.mark.parametrize(
    "case", CASES,
    ids=[f"B{c[0]}H{c[1]}kv{c[2]}t{c[3]}hd{c[4]}ps{c[5]}{c[7]}"
         for c in CASES])
def test_kernel_matches_gather_oracle(layout, case):
    b, h, kvh, t, hd, ps, written, idx_kind = case
    pps = -(-written // ps) + 1
    P = b * pps + 3
    r = np.random.RandomState(hash((layout,) + case) % 2**31)
    table = jnp.asarray(r.permutation(P)[:b * pps].reshape(b, pps), jnp.int32)
    layer = _mk_layer(r, P, kvh, ps, hd, layout, table)
    kk = jnp.asarray(r.randn(b, kvh, written, hd), jnp.float32)
    vv = jnp.asarray(r.randn(b, kvh, written, hd), jnp.float32)
    layer = paged_update(layer, kk, vv, jnp.int32(0))
    q = jnp.asarray(r.randn(b, h, t, hd), jnp.float32)
    if idx_kind == "scalar":
        idx = jnp.int32(written - t)
    else:
        idx = jnp.asarray(r.randint(t - 1, written - t, size=(b,)), jnp.int32)
    ref = paged_attention(q, layer, idx, impl="xla")
    out = paged_attention(q, layer, idx, impl="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_stale_pages_never_leak():
    """Unreferenced pool pages (and rows past the causal frontier) full of
    garbage must not change the output: masked scores underflow to exactly
    zero weight."""
    b, h, t, hd, ps, pps = 1, 2, 1, 32, 8, 3
    P = 8
    r = np.random.RandomState(7)
    table = jnp.asarray([[5, 1, 3]], jnp.int32)
    clean = _mk_layer(r, P, h, ps, hd, "f32", table)
    kk = jnp.asarray(r.randn(b, h, 10, hd), jnp.float32)
    vv = jnp.asarray(r.randn(b, h, 10, hd), jnp.float32)
    clean = paged_update(clean, kk, vv, jnp.int32(0))
    # poison every pool row, then rewrite the same tokens: referenced rows
    # beyond position 9 and all unreferenced pages keep the poison
    dirty = clean.replace(kp=jnp.full_like(clean.kp, 777.0),
                          vp=jnp.full_like(clean.vp, -777.0))
    dirty = paged_update(dirty, kk, vv, jnp.int32(0))
    q = jnp.asarray(r.randn(b, h, t, hd), jnp.float32)
    for impl, kw in (("xla", {}), ("pallas", {"interpret": True})):
        a = paged_attention(q, clean, jnp.int32(9), impl=impl, **kw)
        d = paged_attention(q, dirty, jnp.int32(9), impl=impl, **kw)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(d))


@pytest.mark.parametrize("layout", ["f32", "int8"])
def test_zero_copy_prefix_sharing(lm, layout):
    """Two slots whose tables POINT at the same prefix pages reproduce dense
    per-slot caches holding copied prefixes.  Prefix length = 8 = 2 full
    pages (page_size 4), so no partial-page copy is needed."""
    model, variables, toks = lm
    ps, plen = 4, 8
    prefix = toks[:1, :plen]  # one sequence, B=1
    # paged: B=2 cache over a pool; prefill the prefix ONCE through slot 0,
    # then point slot 1's table at the same prefix pages
    pps = -(-model.max_len // ps)
    P = 2 * pps
    paged = init_paged_cache(model, 2, page_size=ps, dtype=_dtype(layout))
    both = jnp.concatenate([prefix, prefix], 0)
    _, cp, _ = prefill(model, variables, both, cache=paged)
    # slot 1 now re-points its first 2 logical pages at slot 0's (the
    # writes slot 1 made to its own pages become unreferenced garbage)
    tab = np.asarray(cp[0].table).copy()
    tab[1, :plen // ps] = tab[0, :plen // ps]
    cp = with_table(cp, tab)
    # dense twin: the prefix copied into both slots
    dense = init_kv_cache(model, 2, dtype=_dtype(layout))
    _, cd, _ = prefill(model, variables, both, cache=dense)
    # diverging suffixes, per-slot decode
    idx = jnp.asarray([plen, plen], jnp.int32)
    suf = jnp.asarray([[3], [9]], jnp.int32)
    t1, _ = model.apply(variables, suf, cache=cd, cache_index=idx)
    t2, _ = model.apply(variables, suf, cache=cp, cache_index=idx)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


class TestPageAllocator:
    def test_alloc_free_cycle(self):
        a = PageAllocator(4)
        p = a.alloc(3)
        assert len(set(p)) == 3 and a.pages_free == 1
        a.free(p[:2])
        assert a.pages_free == 3
        with pytest.raises(RuntimeError, match="exhausted"):
            a.alloc(4)
        a.alloc(3)
        assert a.pages_free == 0

    def test_refcounted_sharing(self):
        a = PageAllocator(3)
        p = a.alloc(2)
        a.share(p)          # second reference
        a.free(p)
        assert a.pages_free == 1  # still referenced once
        a.free(p)
        assert a.pages_free == 3
        with pytest.raises(RuntimeError, match="double free"):
            a.free(p)
        with pytest.raises(RuntimeError, match="not live"):
            a.share(p)

    def test_exhaustion_is_clean(self):
        a = PageAllocator(2)
        a.alloc(2)
        before = a.pages_free
        with pytest.raises(RuntimeError):
            a.alloc(1)
        assert a.pages_free == before


def test_bad_table_rows_rejected(lm):
    model, _, _ = lm
    with pytest.raises(ValueError, match="table rows"):
        init_paged_cache(model, 2, page_size=4,
                         table=np.zeros((3, 6), np.int32))
    with pytest.raises(ValueError, match="cannot back"):
        init_paged_cache(model, 2, page_size=4, num_pages=3)
    with pytest.raises(ValueError, match="even head_dim"):
        m = QuantTransformerLM(vocab=8, dim=6, depth=1, num_heads=2,
                               qconfig=default_qconfig(8, 8), max_len=8)
        init_paged_cache(m, 1, page_size=4, dtype="int4")
