"""QAT accuracy-parity harness (BASELINE.md: quantized accuracy near float).

Synthetic separable classification; identical data/seeds/optimizer across a
float baseline, W8A8 QAT, and W4A8 QAT.  Asserts the quantized models stay
within an accuracy budget of the float model, and that serving conversion
preserves the QAT model's test accuracy exactly (the deployment contract).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from jaxlsq.models import QConfig, QuantMLP, default_qconfig
from jaxlsq.parallel import create_train_state, make_train_step
from jaxlsq.serve import convert


def make_dataset(n=1024, d=24, classes=6, seed=0):
    r = np.random.RandomState(seed)
    centers = 3.0 * r.randn(classes, d).astype(np.float32)
    y = r.randint(0, classes, size=n)
    x = centers[y] + r.randn(n, d).astype(np.float32)
    n_tr = int(0.8 * n)
    return (jnp.asarray(x[:n_tr]), jnp.asarray(y[:n_tr]),
            jnp.asarray(x[n_tr:]), jnp.asarray(y[n_tr:]))


def train_and_eval(qconfig, xtr, ytr, xte, yte, steps=60, bs=64):
    model = QuantMLP(features=(48, 6), qconfig=qconfig)
    tx = optax.adam(5e-3)
    state = create_train_state(model, tx, xtr[:bs])
    step = make_train_step(model, tx)
    n = xtr.shape[0]
    r = np.random.RandomState(1)
    for i in range(steps):
        idx = r.randint(0, n, size=bs)
        state, _ = step(state, {"input": xtr[idx], "label": ytr[idx]})
    logits, _ = model.apply({**state.params, **state.model_state}, xte,
                            training=False, mutable=["quant_state", "qparams"])
    acc = float(jnp.mean(jnp.argmax(logits, -1) == yte))
    return model, state, acc


@pytest.fixture(scope="module")
def data():
    return make_dataset()


@pytest.fixture(scope="module")
def float_acc(data):
    xtr, ytr, xte, yte = data
    _, _, acc = train_and_eval(QConfig(), xtr, ytr, xte, yte)
    return acc


def test_float_baseline_learns(float_acc):
    assert float_acc > 0.9, f"baseline failed to learn: {float_acc}"


def test_w8a8_accuracy_parity(data, float_acc):
    xtr, ytr, xte, yte = data
    qc = default_qconfig(8, 8, per_channel_weights=True, init_batches=5)
    _, _, acc = train_and_eval(qc, xtr, ytr, xte, yte)
    assert acc >= float_acc - 0.02, f"W8A8 {acc} vs float {float_acc}"


def test_w4a8_accuracy_parity(data, float_acc):
    xtr, ytr, xte, yte = data
    qc = default_qconfig(4, 8, per_channel_weights=True, init_batches=5)
    _, _, acc = train_and_eval(qc, xtr, ytr, xte, yte)
    assert acc >= float_acc - 0.05, f"W4A8 {acc} vs float {float_acc}"


def test_serving_preserves_accuracy(data, float_acc):
    """Deployment contract: the converted int8 serving model classifies the
    test set identically to the QAT eval model."""
    xtr, ytr, xte, yte = data
    qc = default_qconfig(8, 8, per_channel_weights=True, init_batches=5)
    model, state, qat_acc = train_and_eval(qc, xtr, ytr, xte, yte)
    sv = convert({**state.params, **state.model_state}, qc)
    sm = dataclasses.replace(model, qconfig=qc.for_serving("static", "xla"))
    logits = sm.apply(sv, xte, training=False)
    serve_acc = float(jnp.mean(jnp.argmax(logits, -1) == yte))
    assert abs(serve_acc - qat_acc) <= 0.005, (serve_acc, qat_acc)
