"""Sliding-window attention (`attn_window`): each query attends only to its
last W keys, identically in training, prefill, and decode.

Pins:
* window >= seq length is BIT-identical to full causal attention (train and
  decode paths), and a binding window changes the output;
* decode through the KV cache reproduces the windowed full forward at every
  position (the decode-exactness contract extends to windows), on f32 and
  int8 caches, MHA and GQA;
* locality oracle: in a depth-1 RoPE block, the last position's logits under
  window W equal running the model on ONLY the last W tokens (RoPE scores
  depend on relative offsets only) — the window really drops everything else;
* the fused Pallas kernel matches the einsum oracle under a window,
  INCLUDING blocks that slid fully out of the window (the online-softmax
  alpha-wipe path), on float and quantized caches;
* paged attention through a block table honors the window (pallas == xla ==
  dense);
* engine serving with a windowed model stays staggered-exact.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jaxlsq.models import QuantTransformerLM, default_qconfig
from jaxlsq.models.toggles import disable_observer
from jaxlsq.serve import init_kv_cache, prefill
from jaxlsq.serve.attention import decode_attention

VOCAB, DIM, DEPTH, HEADS, MAXLEN = 64, 32, 2, 4, 16


def _lm(qc, window=None, **kw):
    return QuantTransformerLM(vocab=VOCAB, dim=DIM, depth=DEPTH,
                              num_heads=HEADS, qconfig=qc, max_len=MAXLEN,
                              attn_window=window, **kw)


@pytest.fixture(scope="module")
def setup():
    qc = default_qconfig(8, 8, init_batches=1)
    r = np.random.RandomState(0)
    toks = jnp.asarray(r.randint(0, VOCAB, size=(2, 12)))
    variables = _lm(qc).init(jax.random.key(0), toks, training=False)
    return qc, disable_observer(variables), toks


def test_window_ge_len_is_full_attention(setup):
    qc, variables, toks = setup
    full = _lm(qc).apply(variables, toks, training=False)
    wide = _lm(qc, window=toks.shape[1]).apply(variables, toks,
                                               training=False)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(wide))


def test_window_binds(setup):
    qc, variables, toks = setup
    full = _lm(qc).apply(variables, toks, training=False)
    narrow = _lm(qc, window=3).apply(variables, toks, training=False)
    assert np.abs(np.asarray(full) - np.asarray(narrow)).max() > 1e-4


def test_window_validated(setup):
    qc, variables, toks = setup
    with pytest.raises(ValueError, match="attn_window"):
        _lm(qc, window=0).apply(variables, toks, training=False)


@pytest.mark.parametrize("cache_dtype,kvh", [(jnp.float32, None),
                                             (jnp.float32, 2),
                                             (jnp.int8, None)])
def test_decode_matches_full_forward(setup, cache_dtype, kvh):
    """Windowed decode == windowed full forward, position by position."""
    qc, _, toks = setup
    model = _lm(qc, window=4, num_kv_heads=kvh)
    r = np.random.RandomState(1)
    variables = disable_observer(model.init(jax.random.key(1), toks,
                                            training=False))
    full = model.apply(variables, toks, training=False)
    t0 = 5
    last, cache, idx = prefill(model, variables, toks[:, :t0],
                               cache=init_kv_cache(model, toks.shape[0],
                                                   dtype=cache_dtype))
    # int8: quantize-on-write noise vs the f32 full forward; a binding
    # window sharpens the softmax (4 keys), so per-row scale error averages
    # out less than in the full-prefix tests (0.05 there) — 0.1 observed max
    # ~0.073 on this fixture
    tol = 1e-1 if cache_dtype == jnp.int8 else 1e-5
    np.testing.assert_allclose(np.asarray(last), np.asarray(full[:, t0 - 1]),
                               atol=tol, rtol=tol)
    step = jax.jit(lambda v, t, c, i: model.apply(v, t, cache=c,
                                                  cache_index=i))
    for t in range(t0, toks.shape[1]):
        logits, cache = step(variables, toks[:, t:t + 1], cache, idx)
        np.testing.assert_allclose(np.asarray(logits[:, 0]),
                                   np.asarray(full[:, t]),
                                   atol=tol, rtol=tol)
        idx = idx + 1


def test_window_locality_oracle():
    """Depth-1 RoPE block: the last position under window W sees EXACTLY the
    last W tokens — its logits equal running the model on only those tokens
    (RoPE attention scores depend on relative offsets alone)."""
    qc = default_qconfig(8, 8, init_batches=1)
    W = 4
    model = QuantTransformerLM(vocab=VOCAB, dim=DIM, depth=1,
                               num_heads=HEADS, qconfig=qc, max_len=MAXLEN,
                               pos_embedding="rope", attn_window=W)
    r = np.random.RandomState(2)
    toks = jnp.asarray(r.randint(0, VOCAB, size=(1, 10)))
    variables = disable_observer(model.init(jax.random.key(3), toks,
                                            training=False))
    full = model.apply(variables, toks, training=False)
    tail = model.apply(variables, toks[:, -W:], training=False)
    np.testing.assert_allclose(np.asarray(full[:, -1]),
                               np.asarray(tail[:, -1]),
                               atol=1e-5, rtol=1e-5)


def _mk_cache(r, B, KVH, L, HD, layout):
    if layout == "f32":
        return (jnp.asarray(r.randn(B, KVH, L, HD).astype(np.float32)),
                jnp.asarray(r.randn(B, KVH, L, HD).astype(np.float32)))

    def q8(a):
        s = np.abs(a).max(-1) / 127.0 + 1e-9
        return (jnp.asarray(np.clip(np.round(a / s[..., None]), -127, 127)
                            .astype(np.int8)),
                jnp.asarray(s.astype(np.float32)))

    k = q8(r.randn(B, KVH, L, HD).astype(np.float32))
    v = q8(r.randn(B, KVH, L, HD).astype(np.float32))
    return k, v


@pytest.mark.parametrize("L", [32, 30])  # 30: tail block under skipping
@pytest.mark.parametrize("layout", ["f32", "int8"])
@pytest.mark.parametrize("pos", [30, 7])  # 7: whole later blocks masked;
def test_fused_kernel_window_matches_oracle(layout, pos, L):
    """block_l=8 → 4 blocks; window 5 walks only 2 (block skipping): the
    fb offset, clamped duplicate steps, and tail-block masking must all
    compose with the window mask."""
    r = np.random.RandomState(3)
    B, H, KVH, HD, W = 2, 4, 2, 8, 5
    pos = min(pos, L - 2)
    ck, cv = _mk_cache(r, B, KVH, L, HD, layout)
    q = jnp.asarray(r.randn(B, H, 1, HD).astype(np.float32))
    positions = jnp.asarray([pos, max(pos - 3, 0)], jnp.int32)
    pal = decode_attention(q, ck, cv, positions, impl="pallas", block_l=8,
                           window=W, interpret=True)
    xla = decode_attention(q, ck, cv, positions, impl="xla", window=W)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(xla),
                               atol=1e-5, rtol=1e-5)
    # and the window binds vs the unwindowed kernel
    nw = decode_attention(q, ck, cv, positions, impl="pallas", block_l=8,
                          interpret=True)
    assert np.abs(np.asarray(pal) - np.asarray(nw)).max() > 1e-4


def test_paged_window_matches_dense():
    from jaxlsq.serve.paged import PagedKVLayer, paged_attention

    r = np.random.RandomState(4)
    B, H, KVH, L, HD, PS, W = 2, 4, 4, 32, 8, 8, 5
    ck, cv = _mk_cache(r, B, KVH, L, HD, "f32")
    q = jnp.asarray(r.randn(B, H, 1, HD).astype(np.float32))
    pos = jnp.asarray([30, 11], jnp.int32)
    pps = L // PS
    table = jnp.arange(B * pps, dtype=jnp.int32).reshape(B, pps)
    kp = ck.transpose(0, 2, 1, 3).reshape(B * pps, PS, KVH, HD).transpose(
        0, 2, 1, 3)
    vp = cv.transpose(0, 2, 1, 3).reshape(B * pps, PS, KVH, HD).transpose(
        0, 2, 1, 3)
    layer = PagedKVLayer(kp=kp, vp=vp, table=table, page_size=PS)
    dense = decode_attention(q, ck, cv, pos, impl="xla", window=W)
    for impl in ("xla", "pallas"):
        got = paged_attention(q, layer, pos, impl=impl, window=W,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(dense),
                                   atol=1e-5, rtol=1e-5)


def test_windowed_engine_staggered_exact(setup):
    import time

    from jaxlsq.serve import DecodeEngine

    qc, _, toks = setup
    model = _lm(qc, window=4)
    variables = disable_observer(model.init(jax.random.key(5), toks,
                                            training=False))

    def ref(prompt, n_new):
        last, cache, idx = prefill(model, variables,
                                   jnp.asarray(prompt)[None])
        tok = jnp.argmax(last, -1).astype(jnp.int32)
        out = [int(tok[0])]
        for _ in range(n_new - 1):
            logits, cache = model.apply(variables, tok[:, None], cache=cache,
                                        cache_index=idx)
            tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            out.append(int(tok[0]))
            idx = idx + 1
        return np.asarray(out, np.int32)

    r = np.random.RandomState(6)
    reqs = [(r.randint(0, VOCAB, size=r.randint(2, 7)), int(r.randint(2, 5)))
            for _ in range(5)]
    with DecodeEngine(model, variables, max_batch=2,
                      prompt_buckets=(4, 8)) as eng:
        futs = []
        for i, (p, n) in enumerate(reqs):
            futs.append(eng.submit(p, n))
            if i % 2 == 0:
                time.sleep(0.05)
        outs = [f.result(timeout=300) for f in futs]
    for (p, n), got in zip(reqs, outs):
        np.testing.assert_array_equal(got, ref(p, n))


def test_windowed_lm_trains(setup):
    """One train step through the windowed mask: grads flow, loss finite."""
    qc, _, toks = setup
    model = _lm(qc, window=4)
    variables = model.init(jax.random.key(7), toks, training=True)

    def loss_fn(params, rest):
        logits = model.apply({**rest, "params": params}, toks[:, :-1],
                             training=False)
        tgt = jax.nn.one_hot(toks[:, 1:], VOCAB)
        return -jnp.mean(jnp.sum(tgt * jax.nn.log_softmax(logits), -1))

    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    val, grads = jax.value_and_grad(loss_fn)(params, rest)
    assert np.isfinite(float(val))
    gnorm = jax.tree.reduce(lambda a, g: a + float(jnp.sum(g * g)), grads,
                            0.0)
    assert gnorm > 0
