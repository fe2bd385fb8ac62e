"""Mixed-precision per-layer overrides (QConfig.with_overrides / resolve).

The follow-up to the sensitivity report: keep sensitive layers at higher
precision.  Pinned:

* a model built from ONE override-carrying config equals the same model with
  per-layer configs passed directly (bit-for-bit, params and outputs);
* first matching pattern wins; unmatched layers use the root config;
* ``for_serving`` mode fields propagate into every override at resolve time;
* ``convert`` packs per-layer carriers (int8 here, int4 there) and the
  serve-mode forward runs the mixed model end-to-end;
* the flagship LM trains a step with a per-block override.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from jaxlsq.models import (QuantDense, QuantTransformerLM, default_qconfig)
from jaxlsq.models.qconfig import QConfig
from jaxlsq.serve import convert


class TwoDense(nn.Module):
    qc_a: QConfig
    qc_b: QConfig

    @nn.compact
    def __call__(self, x, *, training=False):
        x = QuantDense(16, self.qc_a, name="lo")(x, training=training)
        return QuantDense(4, self.qc_b, name="hi")(nn.relu(x),
                                                   training=training)


def _x(seed=0, n=8, d=12):
    return jnp.asarray(np.random.RandomState(seed).randn(n, d)
                       .astype(np.float32))


def test_resolve_identity_and_first_match():
    qc8 = default_qconfig(8, 8)
    qc4 = default_qconfig(4, 8)
    assert qc8.resolve(("any", "path")) is qc8  # no overrides: zero cost
    mixed = qc8.with_overrides({"lo": qc4, "l": qc8})
    assert mixed.resolve(("lo",)).weight.spec == qc4.weight.spec  # 1st wins
    assert mixed.resolve(("hi",)).weight.spec == qc8.weight.spec
    with pytest.raises(ValueError, match="QConfig"):
        qc8.with_overrides({"lo": 4})


def test_override_equals_per_layer_configs():
    qc8 = default_qconfig(8, 8, init_batches=1)
    qc4 = default_qconfig(4, 4, init_batches=1)
    mixed = qc8.with_overrides({"lo": qc4})
    x = _x()
    m_mixed = TwoDense(qc_a=mixed, qc_b=mixed)
    m_direct = TwoDense(qc_a=qc4, qc_b=qc8)
    v1 = m_mixed.init(jax.random.key(0), x, training=False)
    v2 = m_direct.init(jax.random.key(0), x, training=False)
    assert jax.tree.structure(v1) == jax.tree.structure(v2)
    for a, b in zip(jax.tree.leaves(v1), jax.tree.leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    o1 = m_mixed.apply(v1, x, training=False)
    o2 = m_direct.apply(v2, x, training=False)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_convert_packs_per_layer_carriers_and_serves():
    qc8 = default_qconfig(8, 8, init_batches=1)
    qc4 = default_qconfig(4, 8, init_batches=1)
    mixed = qc8.with_overrides({"lo": qc4})
    x = _x()
    model = TwoDense(qc_a=mixed, qc_b=mixed)
    v = model.init(jax.random.key(1), x, training=False)
    sv = convert(v, mixed)
    lo = sv["quantized"]["lo"]["kernel"]
    hi = sv["quantized"]["hi"]["kernel"]
    assert lo.bits == 4 and lo.data.shape[0] == 6   # K=12 nibble-packed
    assert hi.bits == 8 and hi.data.shape[0] == 16
    sm = TwoDense(qc_a=mixed.for_serving("static", "xla"),
                  qc_b=mixed.for_serving("static", "xla"))
    out = sm.apply(sv, x, training=False)
    want = model.apply(v, x, training=False)  # QAT eval == serve (same fold)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_for_serving_propagates_into_overrides():
    qc8 = default_qconfig(8, 8)
    qc4 = default_qconfig(4, 8)
    mixed = qc8.with_overrides({"lo": qc4}).for_serving("static", "xla")
    r = mixed.resolve(("lo",))
    assert r.mode == "serve" and r.act_mode == "static"
    assert r.serve_impl == "xla"
    assert r.weight.spec == qc4.weight.spec  # the override's 4-bit spec


def test_lm_trains_with_block_override():
    import optax

    from jaxlsq.parallel import create_train_state, make_train_step

    qc = default_qconfig(8, 8, init_batches=1).with_overrides(
        {"mlp_up": default_qconfig(4, 8, init_batches=1)})
    lm = QuantTransformerLM(vocab=32, dim=16, depth=2, num_heads=2,
                            qconfig=qc, max_len=8)
    r = np.random.RandomState(3)
    toks = jnp.asarray(r.randint(0, 32, (4, 8)))
    tx = optax.sgd(1e-2)
    state = create_train_state(lm, tx, toks)

    def lm_loss(logits, batch):
        return optax.softmax_cross_entropy_with_integer_labels(
            logits[:, :-1], batch["label"][:, 1:]).mean()

    step = make_train_step(lm, tx, loss_fn=lm_loss)
    state, metrics = step(state, {"input": toks, "label": toks})
    assert np.isfinite(float(metrics["loss"]))
    # and the override reached the serving carriers
    sv = convert({**state.params, **state.model_state}, qc)
    mlp_up = sv["quantized"]["block0"]["mlp_up"]["kernel"]
    qkv = sv["quantized"]["block0"]["qkv"]["kernel"]
    assert mlp_up.bits == 4 and qkv.bits == 8
