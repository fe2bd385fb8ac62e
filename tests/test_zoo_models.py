"""Model-zoo coverage: MobileNetV2-class and quantized transformer LM —
QAT trains, converts, and serves end-to-end."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from jaxlsq.models import (QuantMobileNetV2, QuantTransformerLM,
                           default_qconfig)
from jaxlsq.parallel import create_train_state, make_train_step
from jaxlsq.serve import convert


def test_mobilenetv2_qat_step_and_convert():
    qc = default_qconfig(8, 8, per_channel_weights=True, init_batches=1)
    model = QuantMobileNetV2(num_classes=4, qconfig=qc,
                             stages=((1, 8, 1, 1), (6, 16, 1, 2)),
                             stem_width=8, head_width=32)
    tx = optax.sgd(1e-2)
    r = np.random.RandomState(0)
    x0 = jnp.asarray(r.randn(2, 16, 16, 3).astype(np.float32))
    state = create_train_state(model, tx, x0)
    step = make_train_step(model, tx)
    for _ in range(3):
        batch = {"input": jnp.asarray(r.randn(2, 16, 16, 3).astype(np.float32)),
                 "label": jnp.asarray(r.randint(0, 4, size=2))}
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    # depthwise conv quantizers exist (feature_group_count == channels)
    qp = state.params["qparams"]
    assert "depthwise" in qp["stage0_block0"]

    want, _ = model.apply({**state.params, **state.model_state}, x0,
                          training=False,
                          mutable=["quant_state", "qparams", "batch_stats"])
    sv = convert({**state.params, **state.model_state}, qc)
    sm = dataclasses.replace(model, qconfig=qc.for_serving("static", "xla"))
    got = sm.apply(sv, x0, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_transformer_lm_qat_and_serving():
    qc = default_qconfig(8, 8, per_channel_weights=True, init_batches=1)
    model = QuantTransformerLM(vocab=64, dim=32, depth=2, num_heads=4,
                               qconfig=qc, max_len=16)
    tx = optax.adam(1e-3)
    r = np.random.RandomState(1)
    tok0 = jnp.asarray(r.randint(0, 64, size=(2, 16)))
    state = create_train_state(model, tx, tok0)
    step = make_train_step(model, tx,
                           loss_fn=lambda logits, batch: optax
                           .softmax_cross_entropy_with_integer_labels(
                               logits[:, :-1], batch["label"][:, 1:]).mean())
    losses = []
    fixed = jnp.asarray(r.randint(0, 64, size=(2, 16)))
    for _ in range(8):
        state, metrics = step(state, {"input": fixed, "label": fixed})
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]  # memorizes the repeated batch

    want, _ = model.apply({**state.params, **state.model_state}, tok0,
                          training=False, mutable=["quant_state", "qparams"])
    sv = convert({**state.params, **state.model_state}, qc)
    sm = dataclasses.replace(model, qconfig=qc.for_serving("static", "xla"))
    got = sm.apply(sv, tok0, training=False)
    assert got.shape == (2, 16, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    # every block's qkv/proj/mlp matmuls got packed int8 kernels
    q = sv["quantized"]
    for blk in ("block0", "block1"):
        for layer in ("qkv", "proj", "mlp_up", "mlp_down"):
            assert q[blk][layer]["kernel"].data.dtype == jnp.int8
    assert "lm_head" in q


def test_transformer_greedy_decode_serving():
    """Autoregressive greedy decode through the serving path (the tokens/s
    workload shape)."""
    qc = default_qconfig(8, 8, init_batches=0)
    model = QuantTransformerLM(vocab=32, dim=16, depth=1, num_heads=2,
                               qconfig=qc, max_len=8)
    r = np.random.RandomState(2)
    tok0 = jnp.asarray(r.randint(0, 32, size=(1, 8)))
    variables = model.init(jax.random.key(0), tok0, training=False)
    sv = convert(variables, qc)
    sm = dataclasses.replace(model, qconfig=qc.for_serving("static", "xla"))

    toks = np.zeros((1, 8), np.int32)
    toks[0, 0] = 5
    for i in range(1, 8):
        logits = sm.apply(sv, jnp.asarray(toks), training=False)
        toks[0, i] = int(jnp.argmax(logits[0, i - 1]))
    assert toks[0, 1:].max() < 32
