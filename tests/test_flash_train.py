"""Training-path flash attention (`train_attn_impl='flash'`): the upstream
fused Pallas kernel replaces the einsum's (B, H, t, t) score materialization
on the no-cache branch — long-context QAT memory.

Pins:
* flash forward logits match the einsum default at f32 tolerance, through
  the full quantized LM (fake-quant + LN + RoPE compose);
* one QAT train step's gradients match the einsum path's (the kernel's
  custom_vjp backward is exercised end-to-end through the quantizers);
* MHA-only and no-window constraints raise on the explicit 'flash' setting;
* decode is unaffected (the cache branch never routes through flash): a
  flash-configured LM decodes to the same logits as its full forward.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jaxlsq.models import QuantTransformerLM, default_qconfig
from jaxlsq.models.toggles import disable_observer
from jaxlsq.serve import prefill

VOCAB, DIM, HEADS, T = 64, 64, 2, 128  # t multiple of the kernel blocks


def _lm(qc, **kw):
    return QuantTransformerLM(vocab=VOCAB, dim=DIM, depth=2,
                              num_heads=HEADS, qconfig=qc, max_len=T,
                              pos_embedding="rope", **kw)


@pytest.fixture(scope="module")
def setup():
    qc = default_qconfig(8, 8, init_batches=1)
    r = np.random.RandomState(0)
    toks = jnp.asarray(r.randint(0, VOCAB, size=(2, T)))
    variables = _lm(qc).init(jax.random.key(0), toks, training=False)
    return qc, disable_observer(variables), toks


@pytest.mark.parametrize("t", [T, 60])  # 60: padded up to the kernel block
def test_flash_forward_matches_einsum(setup, t):
    qc, variables, toks = setup
    ein = _lm(qc).apply(variables, toks[:, :t], training=False)
    fla = _lm(qc, train_attn_impl="flash").apply(variables, toks[:, :t],
                                                 training=False)
    np.testing.assert_allclose(np.asarray(fla), np.asarray(ein),
                               atol=2e-5, rtol=2e-5)


def test_flash_grads_match_einsum(setup):
    qc, variables, toks = setup

    def loss(params, rest, model):
        logits = model.apply({**rest, "params": params}, toks[:, :-1],
                             training=False)
        tgt = jax.nn.one_hot(toks[:, 1:], VOCAB)
        return -jnp.mean(jnp.sum(tgt * jax.nn.log_softmax(logits), -1))

    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    ge = jax.grad(loss)(params, rest, _lm(qc))
    gf = jax.grad(loss)(params, rest, _lm(qc, train_attn_impl="flash"))
    for (pe, e), (pf, f) in zip(
            jax.tree_util.tree_leaves_with_path(ge),
            jax.tree_util.tree_leaves_with_path(gf)):
        scale = max(1.0, float(np.abs(np.asarray(e)).max()))
        np.testing.assert_allclose(np.asarray(f), np.asarray(e),
                                   atol=5e-4 * scale, rtol=0,
                                   err_msg=str(pe))


def test_bogus_impl_rejected(setup):
    qc, _, toks = setup
    m = _lm(qc, train_attn_impl="bogus")
    with pytest.raises(ValueError, match="train_attn_impl"):
        m.init(jax.random.key(1), toks, training=False)


def test_flash_gqa_matches_einsum(setup):
    """GQA under 'flash' (kv heads repeated into the upstream kernel) ==
    the einsum path's grouped dots, through the full quantized LM
    (VERDICT r3 next-#6: the flash x GQA hole)."""
    qc, _, toks = setup
    m_ein = _lm(qc, num_kv_heads=1)
    variables = m_ein.init(jax.random.key(2), toks, training=False)
    from jaxlsq.models.toggles import disable_observer
    variables = disable_observer(variables)
    ein = m_ein.apply(variables, toks, training=False)
    fla = _lm(qc, num_kv_heads=1, train_attn_impl="flash").apply(
        variables, toks, training=False)
    np.testing.assert_allclose(np.asarray(fla), np.asarray(ein),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("t,window,kvh", [
    (T, 32, None),       # aligned blocks, MHA
    (T, 32, 1),          # aligned blocks, GQA
    (100, 24, None),     # t not a multiple of the window (padding path)
    (T, 1, None),        # degenerate window: each query sees only itself
])
def test_banded_window_matches_einsum(setup, t, window, kvh):
    """'flash' + attn_window routes through the banded chunked-einsum
    formulation (O(t*W) score memory); must match the einsum windowed mask
    through the full quantized LM (VERDICT r3 next-#6: the flash x window
    hole)."""
    qc, _, toks = setup
    m_ein = _lm(qc, attn_window=window, num_kv_heads=kvh)
    variables = m_ein.init(jax.random.key(3), toks[:, :t], training=False)
    from jaxlsq.models.toggles import disable_observer
    variables = disable_observer(variables)
    ein = m_ein.apply(variables, toks[:, :t], training=False)
    ban = _lm(qc, attn_window=window, num_kv_heads=kvh,
              train_attn_impl="flash").apply(variables, toks[:, :t],
                                             training=False)
    np.testing.assert_allclose(np.asarray(ban), np.asarray(ein),
                               atol=2e-5, rtol=2e-5)


def test_banded_window_grads_match_einsum(setup):
    qc, _, toks = setup
    m_ein = _lm(qc, attn_window=32)
    m_ban = _lm(qc, attn_window=32, train_attn_impl="flash")
    variables = m_ein.init(jax.random.key(4), toks, training=False)
    from jaxlsq.models.toggles import disable_observer
    variables = disable_observer(variables)

    def loss(params, rest, model):
        logits = model.apply({**rest, "params": params}, toks[:, :-1],
                             training=False)
        tgt = jax.nn.one_hot(toks[:, 1:], VOCAB)
        return -jnp.mean(jnp.sum(tgt * jax.nn.log_softmax(logits), -1))

    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    ge = jax.grad(loss)(params, rest, m_ein)
    gb = jax.grad(loss)(params, rest, m_ban)
    for (pe, e), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(ge),
            jax.tree_util.tree_leaves_with_path(gb)):
        scale = max(1.0, float(np.abs(np.asarray(e)).max()))
        np.testing.assert_allclose(np.asarray(b), np.asarray(e),
                                   atol=5e-4 * scale, rtol=0,
                                   err_msg=str(pe))


def test_banded_window_uses_less_score_memory():
    """The structural claim: at t >> W the banded program's temp footprint
    is far below the einsum path's t^2 scores (compiled memory analysis —
    backend-independent)."""
    qc = default_qconfig(8, 8, init_batches=1)
    t, w = 1024, 64
    m_ein = _lm(qc, attn_window=w)
    m_ban = _lm(qc, attn_window=w, train_attn_impl="flash")
    r = np.random.RandomState(5)
    toks = jnp.asarray(r.randint(0, VOCAB, size=(2, t)))
    # max_len only gates decode; rebuild with room for t
    import dataclasses as dc
    m_ein = dc.replace(m_ein, max_len=t)
    m_ban = dc.replace(m_ban, max_len=t)
    variables = m_ein.init(jax.random.key(5), toks, training=False)

    def temp_bytes(model):
        f = jax.jit(lambda v, x: model.apply(v, x, training=False))
        mem = f.lower(variables, toks).compile().memory_analysis()
        return int(mem.temp_size_in_bytes)

    be, bb = temp_bytes(m_ein), temp_bytes(m_ban)
    # einsum scores: (2, 2, 1024, 1024) f32 x2 layers; banded: 2*t*W rows.
    # Require at least a 3x cut to keep the assert robust to fusion noise.
    assert bb * 3 < be, (bb, be)




def test_decode_unaffected_by_flash_config(setup):
    """The cache branch never routes through flash: a flash-configured LM's
    prefill+decode logits match its own full forward."""
    qc, variables, toks = setup
    model = _lm(qc, train_attn_impl="flash")
    short = toks[:, :12]
    # full forward THROUGH FLASH vs einsum-decode over the cache
    full = _lm(qc).apply(variables, short, training=False)
    t0 = 8
    last, cache, idx = prefill(model, variables, short[:, :t0])
    np.testing.assert_allclose(np.asarray(last), np.asarray(full[:, t0 - 1]),
                               atol=1e-5, rtol=1e-5)
    step = jax.jit(lambda v, t, c, i: model.apply(v, t, cache=c,
                                                  cache_index=i))
    for t in range(t0, short.shape[1]):
        logits, cache = step(variables, short[:, t:t + 1], cache, idx)
        np.testing.assert_allclose(np.asarray(logits[:, 0]),
                                   np.asarray(full[:, t]),
                                   atol=1e-5, rtol=1e-5)
        idx = idx + 1
