"""Continuous-batching serving engine tests."""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from jaxlsq.serve import ServingEngine


def test_engine_basic_results():
    """Every request gets its own correct result regardless of batching."""
    def f(x):
        return 2.0 * x + 1.0

    with ServingEngine(f, example_shape=(8,), max_batch=4) as eng:
        xs = [np.full((8,), float(i), np.float32) for i in range(11)]
        futs = eng.submit_many(xs)
        for i, fut in enumerate(futs):
            np.testing.assert_allclose(fut.result(timeout=30),
                                       2.0 * xs[i] + 1.0)
    assert eng.stats["requests"] == 11
    assert eng.stats["batches"] >= 3  # max_batch=4 forces >= ceil(11/4)


def test_engine_batches_continuously():
    """Requests arriving while the chip is busy coalesce into later batches
    (fewer batches than requests under load)."""
    def f(x):
        return jnp.tanh(x @ jnp.ones((16, 16)))

    with ServingEngine(f, example_shape=(16,), max_batch=32) as eng:
        eng.warmup()
        futs = eng.submit_many(
            [np.random.randn(16).astype(np.float32) for _ in range(64)])
        [f_.result(timeout=30) for f_ in futs]
    assert eng.stats["requests"] == 64
    assert eng.stats["batches"] < 64  # coalescing actually happened


def test_engine_shape_validation():
    with ServingEngine(lambda x: x, example_shape=(4,)) as eng:
        with pytest.raises(ValueError):
            eng.submit(np.zeros((5,), np.float32))


def test_engine_error_propagates():
    def g(x):
        raise RuntimeError("boom")

    with ServingEngine(g, example_shape=(4,)) as eng:
        fut = eng.submit(np.zeros((4,), np.float32))
        with pytest.raises(RuntimeError, match="boom"):
            fut.result(timeout=30)


def test_engine_submit_after_close_raises():
    eng = ServingEngine(lambda x: x, example_shape=(2,))
    eng.close()
    with pytest.raises(RuntimeError, match="closed"):
        eng.submit(np.zeros((2,), np.float32))


def test_engine_close_flushes_pending():
    """Requests still queued at close() are executed, not dropped."""
    def slow(x):
        return x + 1.0

    eng = ServingEngine(slow, example_shape=(2,), max_batch=2)
    futs = eng.submit_many(
        [np.full((2,), float(i), np.float32) for i in range(6)])
    eng.close()
    for i, fut in enumerate(futs):
        np.testing.assert_allclose(fut.result(timeout=30), i + 1.0)


def test_engine_serves_converted_model():
    """End-to-end: engine wraps a converted (serve-mode) quantized model."""
    from jaxlsq.models import QuantMLP, default_qconfig
    from jaxlsq.parallel import create_train_state, make_train_step
    from jaxlsq.serve import convert

    qc = default_qconfig(8, 8, init_batches=1)
    model = QuantMLP(features=(16, 4), qconfig=qc)
    tx = optax.sgd(1e-2)
    r = np.random.RandomState(0)
    x0 = jnp.asarray(r.randn(4, 8).astype(np.float32))
    state = create_train_state(model, tx, x0)
    step = make_train_step(model, tx)
    for _ in range(3):
        state, _ = step(state, {
            "input": jnp.asarray(r.randn(4, 8).astype(np.float32)),
            "label": jnp.asarray(r.randint(0, 4, size=4))})

    sv = convert({**state.params, **state.model_state}, qc)
    sm = dataclasses.replace(model, qconfig=qc.for_serving("static", "xla"))

    def apply_fn(x):
        return sm.apply(sv, x, training=False)

    want = np.asarray(apply_fn(x0))
    with ServingEngine(apply_fn, example_shape=(8,), max_batch=8) as eng:
        futs = eng.submit_many([np.asarray(x0[i]) for i in range(4)])
        got = np.stack([f.result(timeout=60) for f in futs])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_engine_close_submit_race_never_hangs():
    """ADVICE r1 TOCTOU: a submit racing close() must either raise or resolve
    its Future — never leave it pending forever."""
    import threading
    from concurrent.futures import Future

    fn = jax.jit(lambda x: x * 2.0)
    futures: list = []

    def hammer(engine, stop_evt):
        while not stop_evt.is_set():
            try:
                futures.append(engine.submit(np.ones((3,), np.float32)))
            except RuntimeError:
                return

    for _ in range(5):  # a few rounds to give the race a chance
        eng = ServingEngine(fn, (3,), max_batch=4, max_wait_ms=0.5)
        stop_evt = threading.Event()
        t = threading.Thread(target=hammer, args=(eng, stop_evt))
        t.start()
        time.sleep(0.02)
        eng.close()
        stop_evt.set()
        t.join(timeout=5)
        assert not t.is_alive()
    for f in futures:
        np.testing.assert_allclose(f.result(timeout=10), 2.0)
