"""Distributed tests without a cluster (SURVEY.md §4): 8 virtual CPU devices.

Asserts the DP-correctness property the reference leaves implicit: the
all-reduced dS/dB under a sharded batch equals the single-device global-batch
result, and grad scaling uses the GLOBAL numel (jit-with-sharding traces at
logical shapes — SURVEY.md §2c).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from jaxlsq import QuantSpec, fake_quant
from jaxlsq.models import QuantMLP, default_qconfig
from jaxlsq.parallel import (
    QATTrainState,
    create_train_state,
    make_eval_step,
    make_mesh,
    make_train_step,
    shard_batch,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.shape == (8, 1)
    mesh2 = make_mesh(model=4)
    assert mesh2.devices.shape == (2, 4)
    with pytest.raises(ValueError):
        make_mesh(data=5, model=3)


def test_dp_fakequant_grads_match_single_device():
    """dS/dB of a data-sharded fake-quant == single-device global-batch grads."""
    mesh = make_mesh()
    spec = QuantSpec(quant_min=0, quant_max=255)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 32).astype(np.float32))
    scale, shift = jnp.array([0.1]), jnp.array([0.05])

    def loss(x, s, b):
        return jnp.sum(fake_quant(x, s, b, spec, impl="reference") ** 2)

    # single device
    ref = jax.grad(loss, argnums=(1, 2))(x, scale, shift)

    # sharded over data
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    ss = jax.device_put(scale, NamedSharding(mesh, P()))
    bs = jax.device_put(shift, NamedSharding(mesh, P()))
    sharded = jax.jit(jax.grad(loss, argnums=(1, 2)))(xs, ss, bs)

    for a, b in zip(ref, sharded):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_grad_scale_uses_global_numel():
    """The 1/sqrt(N·qmax) factor must see the global N: doubling the (sharded)
    batch scales the sum-grad by 2/sqrt(2) = sqrt(2) for identical data."""
    mesh = make_mesh()
    spec = QuantSpec(quant_min=0, quant_max=15)
    rng = np.random.RandomState(1)
    half = rng.randn(32, 16).astype(np.float32)
    x1 = jnp.asarray(half)
    x2 = jnp.asarray(np.concatenate([half, half], axis=0))
    scale, shift = jnp.array([0.1]), jnp.array([0.0])

    def ds(x):
        xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))
        g = jax.jit(jax.grad(
            lambda a, s, b: jnp.sum(fake_quant(a, s, b, spec, impl="reference")),
            argnums=1))(xs, scale, shift)
        return float(g[0])

    # sum-grad doubles with data, grad-scale shrinks by sqrt(2)
    np.testing.assert_allclose(ds(x2), 2 * ds(x1) / np.sqrt(2), rtol=1e-5)


def _data(n=64, d=16, classes=4, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d).astype(np.float32)
    w = rng.randn(d, classes).astype(np.float32)
    y = np.argmax(x @ w, axis=1)
    return {"input": jnp.asarray(x), "label": jnp.asarray(y)}


def test_dp_train_step_matches_single_device():
    """Full QAT train step: replicated-state + sharded-batch result equals the
    unsharded step, bitwise-tolerant."""
    qc = default_qconfig(8, 8, init_batches=2, impl="reference")
    model = QuantMLP(features=(16, 4), qconfig=qc)
    tx = optax.sgd(1e-2)
    batch = _data()

    state1 = create_train_state(model, tx, batch["input"][:8])
    step1 = make_train_step(model, tx, donate=False)

    mesh = make_mesh()
    state8 = create_train_state(model, tx, batch["input"][:8])
    step8 = make_train_step(model, tx, mesh=mesh, donate=False)
    batch8 = shard_batch(batch, mesh)

    for i in range(4):
        state1, m1 = step1(state1, batch)
        state8, m8 = step8(state8, batch8)
        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                                   rtol=1e-5)

    s1 = np.asarray(state1.params["qparams"]["dense_0"]["act_fq"]["qp"]["scale"])
    s8 = np.asarray(state8.params["qparams"]["dense_0"]["act_fq"]["qp"]["scale"])
    np.testing.assert_allclose(s1, s8, rtol=1e-5)
    assert int(state8.step) == 4


def test_eval_step_sharded():
    qc = default_qconfig(8, 8, init_batches=0, impl="reference")
    model = QuantMLP(features=(16, 4), qconfig=qc)
    tx = optax.sgd(1e-2)
    batch = _data()
    mesh = make_mesh()
    state = create_train_state(model, tx, batch["input"][:8])
    ev = make_eval_step(model, mesh=mesh)
    logits = ev(state, shard_batch(batch, mesh))
    assert logits.shape == (64, 4)
    assert np.all(np.isfinite(np.asarray(logits)))


@pytest.mark.parametrize("impl", ["reference", "pallas"])
@pytest.mark.parametrize("per_channel", [False, True])
def test_fake_quant_under_shard_map(impl, per_channel):
    """Explicit-SPMD path (SURVEY.md §5): fake_quant's VJP inside shard_map
    over 'data', with dS/dB all-reduced by lax.psum and grad scaling on the
    GLOBAL numel, equals the unsharded global-batch result."""
    from jax import shard_map

    mesh = make_mesh(data=8, model=1)
    spec = QuantSpec.make(8, signed=False, per_channel=per_channel, axis=1)
    r = np.random.RandomState(0)
    bs, d = 32, 24
    x = jnp.asarray(r.randn(bs, d).astype(np.float32))
    g = jnp.asarray(r.randn(bs, d).astype(np.float32))
    c = d if per_channel else 1
    s = jnp.asarray(0.05 + 0.02 * r.rand(c).astype(np.float32))
    b = jnp.asarray(0.01 * r.randn(c).astype(np.float32))
    n_global = x.size

    def fq(a, ss, bb):
        return fake_quant(a, ss, bb, spec, numel=n_global, impl=impl)

    # unsharded global reference
    want_out, vjp = jax.vjp(fq, x, s, b)
    want_dx, want_ds, want_db = vjp(g)

    def local(xl, gl, ss, bb):
        out, lvjp = jax.vjp(fq, xl, ss, bb)
        dx, ds, db = lvjp(gl)
        return (out, dx,
                jax.lax.psum(ds, "data"), jax.lax.psum(db, "data"))

    sm = shard_map(
        local, mesh=mesh,
        in_specs=(P("data"), P("data"), P(), P()),
        out_specs=(P("data"), P("data"), P(), P()),
        check_vma=False)
    out, dx, ds, db = jax.jit(sm)(x, g, s, b)

    np.testing.assert_allclose(np.asarray(out), np.asarray(want_out),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(want_dx),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(ds), np.asarray(want_ds),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(db), np.asarray(want_db),
                               rtol=1e-5, atol=1e-7)


def test_sequence_parallel_lm_train_step():
    """Long-context / sequence parallelism (SURVEY §5 SP item): the LM train
    step with tokens sharded over BOTH batch ('data') and sequence ('model')
    axes produces the same loss and gradients-applied state as unsharded —
    the fake-quant ops are elementwise along sequence, so XLA partitions
    them freely and inserts attention/collective comms itself."""
    import optax

    from jaxlsq.models import QuantTransformerLM, default_qconfig

    qc = default_qconfig(8, 8, init_batches=1)
    model = QuantTransformerLM(vocab=64, dim=32, depth=1, num_heads=4,
                               qconfig=qc, max_len=16)
    tx = optax.sgd(1e-2)
    r = np.random.RandomState(0)
    tokens = jnp.asarray(r.randint(0, 64, size=(4, 16)))

    def loss_fn(logits, batch):
        import optax as _o
        return _o.softmax_cross_entropy_with_integer_labels(
            logits[:, :-1], batch["label"][:, 1:]).mean()

    def run(mesh, token_spec):
        state = create_train_state(model, tx, tokens[:2])
        step = make_train_step(model, tx, loss_fn=loss_fn, jit=False)
        if mesh is None:
            jitted = jax.jit(step)
            batch = {"input": tokens, "label": tokens}
        else:
            sh = NamedSharding(mesh, token_spec)
            rep = NamedSharding(mesh, P())
            jitted = jax.jit(step, in_shardings=(rep, {"input": sh, "label": sh}),
                             out_shardings=(rep, rep))
            state = jax.device_put(state, rep)
            batch = {"input": jax.device_put(tokens, sh),
                     "label": jax.device_put(tokens, sh)}
        new_state, metrics = jitted(state, batch)
        return float(metrics["loss"]), new_state

    base_loss, base_state = run(None, None)
    mesh = make_mesh(data=2, model=4)
    sp_loss, sp_state = run(mesh, P("data", "model"))  # batch AND seq sharded

    np.testing.assert_allclose(sp_loss, base_loss, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(base_state.params),
                    jax.tree.leaves(sp_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_grad_accumulation_matches_full_batch():
    """accum_steps=4 microbatching == one full-batch step, exactly, when the
    activation quantizers carry numel=<full batch numel> (the documented
    contract; weight quantizers are batch-independent).  Observer updates see
    microbatches sequentially, so use learnable-init (no observer)."""
    import dataclasses

    import optax

    from jaxlsq.models import QuantMLP
    from jaxlsq.models.qconfig import QConfig
    from jaxlsq.observers import LSQQuantizer
    from jaxlsq.core.spec import QuantSpec

    B, F = 16, 8
    full_act_numel = B * F  # per-layer activation numel at the full batch
    wq = LSQQuantizer(spec=QuantSpec.weight_default(8), otype="weight")
    aq = LSQQuantizer(spec=QuantSpec.activation_default(8),
                      otype="activation", init_mode="learnable", n_batches=-1,
                      numel=full_act_numel)
    qc = QConfig(weight=wq, activation=aq)
    model = QuantMLP(features=(F, 4), qconfig=qc)
    tx = optax.sgd(1e-2)
    r = np.random.RandomState(0)
    batch = {"input": jnp.asarray(r.randn(B, F).astype(np.float32)),
             "label": jnp.asarray(r.randint(0, 4, size=B))}

    def run(accum):
        state = create_train_state(model, tx, batch["input"][:2])
        step = make_train_step(model, tx, accum_steps=accum, donate=False)
        for _ in range(3):
            state, metrics = step(state, batch)
        return state, float(metrics["loss"])

    s1, l1 = run(1)
    s4, l4 = run(4)
    np.testing.assert_allclose(l4, l1, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=1e-7)
