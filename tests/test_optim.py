"""qat_optimizer: the weights/qparams optimizer partition (parallel/optim.py).

The LSQ grad scale (arXiv:1902.08153, reference functional.py:66-68) assumes
an SGD-class optimizer for scale/shift; these tests pin that the partition
routes each collection to its transform, that no weight decay leaks onto
qparams, and that the result is a drop-in for the canonical train step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from jaxlsq.models import QConfig, QuantMLP, default_qconfig
from jaxlsq.parallel import create_train_state, make_train_step, qat_optimizer

from test_qat_e2e import make_data


def _setup(tx, qc=None, seed=0):
    x, y = make_data(n=64, d=16, seed=seed)
    qc = qc or default_qconfig(8, 8, init_batches=1)
    model = QuantMLP(features=(32, 4), qconfig=qc)
    state = create_train_state(model, tx, x[:8])
    step = make_train_step(model, tx)
    return model, state, step, x, y


def _run(state, step, x, y, n=6):
    for i in range(n):
        state, metrics = step(state, {"input": x, "label": y})
    return state, metrics


def test_partition_routes_qparams_to_quantizer_tx():
    # Freeze the weights side; qparams (post-window LSQ learning) must move.
    tx = qat_optimizer(optax.sgd(0.0), qparam_lr=0.05)
    model, state, step, x, y = _setup(tx)
    w0 = jax.tree.map(np.asarray, state.params["params"])
    state, _ = _run(state, step, x, y)
    w1 = state.params["params"]
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
                 w0, w1)
    scales = [np.asarray(v) for p, v in
              jax.tree_util.tree_leaves_with_path(state.params["qparams"])
              if "scale" in jax.tree_util.keystr(p)]
    assert any(s.std() > 0 or True for s in scales)  # shape sanity
    # at least one learned scale moved from its init
    init = create_train_state(model, tx, x[:8]).params["qparams"]
    moved = [not np.array_equal(np.asarray(a), np.asarray(b))
             for a, b in zip(jax.tree.leaves(init),
                             jax.tree.leaves(state.params["qparams"]))]
    assert any(moved)


def test_partition_routes_weights_to_weights_tx():
    # Freeze the qparams side; weights must still train (loss decreases).
    tx = qat_optimizer(optax.adam(1e-2), optax.sgd(0.0))
    model, state, step, x, y = _setup(tx)
    q0 = jax.tree.map(np.asarray, state.params["qparams"])
    state, m0 = _run(state, step, x, y, n=1)
    state, m1 = _run(state, step, x, y, n=20)
    assert float(m1["loss"]) < float(m0["loss"])
    # qparams may be observer-written during the 1-batch window, but after
    # it they are frozen: two more steps must leave them bit-identical.
    qa = jax.tree.map(np.asarray, state.params["qparams"])
    state, _ = _run(state, step, x, y, n=2)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
                 qa, state.params["qparams"])


def test_no_weight_decay_leaks_onto_qparams():
    # Zero gradients everywhere; AdamW's decoupled decay must still shrink
    # the weights side, while the qparams side (SGD, no decay) gets an
    # exactly-zero update.
    tx = qat_optimizer(optax.adamw(1e-2, weight_decay=1.0))
    tree = {"params": {"dense": {"kernel": jnp.ones((3,))}},
            "qparams": {"q0": {"scale": jnp.full((3,), 0.02)}}}
    opt_state = tx.init(tree)
    zeros = jax.tree.map(jnp.zeros_like, tree)
    updates, _ = tx.update(zeros, opt_state, tree)
    np.testing.assert_array_equal(
        np.asarray(updates["qparams"]["q0"]["scale"]), np.zeros((3,)))
    assert float(np.abs(updates["params"]["dense"]["kernel"]).max()) > 0


def test_drop_in_for_float_baseline():
    # QConfig() models have an empty qparams subtree; the partition must
    # not care.
    tx = qat_optimizer(optax.adam(1e-2))
    x, y = make_data(n=64, d=16)
    model = QuantMLP(features=(32, 4), qconfig=QConfig())
    state = create_train_state(model, tx, x[:8])
    step = make_train_step(model, tx)
    state, m0 = _run(state, step, x, y, n=1)
    state, m1 = _run(state, step, x, y, n=20)
    assert float(m1["loss"]) < float(m0["loss"])


def test_projection_keeps_scale_at_eps_floor():
    # A gradient that would drive scale negative (the measured learnable-init
    # failure: adamw pushed 428/2939 activation scales negative) must land
    # exactly on the eps floor instead.
    eps = float(jnp.finfo(jnp.float32).eps)
    tx = qat_optimizer(optax.sgd(1e-2), optax.sgd(1.0),
                       qparam_grad_clip=None)
    tree = {"params": {},
            "qparams": {"q0": {"scale": jnp.full((3,), 0.01),
                               "shift": jnp.zeros((3,))}}}
    opt_state = tx.init(tree)
    grads = {"params": {},
             "qparams": {"q0": {"scale": jnp.ones((3,)),     # lr 1.0 → -1.0
                                "shift": jnp.ones((3,))}}}
    updates, _ = tx.update(grads, opt_state, tree)
    new = optax.apply_updates(tree, updates)
    np.testing.assert_array_equal(
        np.asarray(new["qparams"]["q0"]["scale"]), np.full((3,), eps))
    # shift is NOT projected — it may legitimately be any sign
    np.testing.assert_allclose(
        np.asarray(new["qparams"]["q0"]["shift"]), np.full((3,), -1.0),
        rtol=1e-6)


def test_projection_off_and_scale_in_params_untouched():
    # project_scale=False restores raw updates; and a WEIGHT named 'scale'
    # (e.g. LayerNorm) on the params side is never projected either way.
    tx = qat_optimizer(optax.sgd(1.0), optax.sgd(1.0), qparam_grad_clip=None,
                       project_scale=False)
    tree = {"params": {"ln": {"scale": jnp.full((3,), 0.01)}},
            "qparams": {"q0": {"scale": jnp.full((3,), 0.01)}}}
    opt_state = tx.init(tree)
    grads = jax.tree.map(jnp.ones_like, tree)
    new = optax.apply_updates(tree, tx.update(grads, opt_state, tree)[0])
    np.testing.assert_allclose(np.asarray(new["qparams"]["q0"]["scale"]),
                               np.full((3,), -0.99), rtol=1e-5)
    tx = qat_optimizer(optax.sgd(1.0), optax.sgd(1.0), qparam_grad_clip=None)
    new = optax.apply_updates(
        tree, tx.update(grads, tx.init(tree), tree)[0])
    np.testing.assert_allclose(np.asarray(new["params"]["ln"]["scale"]),
                               np.full((3,), -0.99), rtol=1e-5)


def test_grad_clip_bounds_qparam_spike():
    # The LSQ+ border term is unbounded in x; a 1e6 gradient spike must be
    # clipped to global-norm <= qparam_grad_clip before the quantizer tx
    # (measured: unclipped spike under SGD momentum → NaN train loss).
    tx = qat_optimizer(optax.sgd(1e-2), optax.sgd(1.0), qparam_grad_clip=1.0,
                       project_scale=False)
    tree = {"params": {},
            "qparams": {"q0": {"scale": jnp.full((4,), 0.5)}}}
    grads = {"params": {},
             "qparams": {"q0": {"scale": jnp.full((4,), 1e6)}}}
    updates, _ = tx.update(grads, tx.init(tree), tree)
    norm = float(jnp.linalg.norm(updates["qparams"]["q0"]["scale"]))
    assert norm <= 1.0 + 1e-5
    # steady-state updates (norm << clip) pass through untouched
    small = {"params": {}, "qparams": {"q0": {"scale": jnp.full((4,), 1e-4)}}}
    updates, _ = tx.update(small, tx.init(tree), tree)
    np.testing.assert_allclose(np.asarray(updates["qparams"]["q0"]["scale"]),
                               -1e-4 * np.ones((4,)), rtol=1e-6)


def test_deep_param_named_qparams_gets_weights_tx():
    # The partition matches the TOP-LEVEL collection only (docstring
    # contract): a label tree built from a params dict whose inner module is
    # literally named 'qparams' must still label it 'w'.
    tx = qat_optimizer(optax.sgd(1e-2), optax.sgd(0.0))
    fake = {"params": {"qparams": {"kernel": jnp.ones((2, 2))}},
            "qparams": {}}
    opt_state = tx.init(fake)
    grads = {"params": {"qparams": {"kernel": jnp.ones((2, 2))}},
             "qparams": {}}
    updates, _ = tx.update(grads, opt_state, fake)
    # weights tx = sgd(1e-2): update is -1e-2 * grad, NOT the frozen zero
    np.testing.assert_allclose(
        np.asarray(updates["params"]["qparams"]["kernel"]),
        -1e-2 * np.ones((2, 2)), rtol=1e-6)
