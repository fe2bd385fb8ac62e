"""Pipeline-parallel train step tests (parallel/pipeline.py).

The load-bearing assertion: a GPipe step over S stages with MB microbatches
is NUMERICALLY the gradient-accumulation step (`make_train_step(accum_steps=
MB)`) — same per-microbatch observer updates, same loss normalization, same
grads — because the scanned schedule visits microbatches in submission order
on every stage and observer writes carry no gradient
(observers/quantizer.py:171).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from jaxlsq.models import QuantTransformerLM, default_qconfig
from jaxlsq.parallel import (
    create_pipeline_state,
    create_train_state,
    make_pipeline_train_step,
    make_train_step,
    pipeline_mesh,
    stack_pipeline_variables,
    unstack_pipeline_variables,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")

VOCAB, DIM, DEPTH, T = 32, 16, 4, 8


def _model(qc=None, **kw):
    qc = qc or default_qconfig(8, 8, init_batches=1)
    return QuantTransformerLM(vocab=VOCAB, dim=DIM, depth=DEPTH, num_heads=4,
                              qconfig=qc, max_len=T, **kw)


def _tokens(b=8, seed=0):
    r = np.random.RandomState(seed)
    return jnp.asarray(r.randint(0, VOCAB, size=(b, T)))


def _lm_loss_batch(logits, batch):
    return optax.softmax_cross_entropy_with_integer_labels(
        logits[:, :-1], batch["label"][:, 1:]).mean()


def test_stack_unstack_roundtrip():
    model = _model()
    toks = _tokens(2)
    variables = model.init(jax.random.key(0), toks, training=False)
    for coll in ("params", "qparams", "quant_state"):
        stacked = stack_pipeline_variables(variables[coll], DEPTH, 2)
        assert "block0" not in stacked and "blocks" in stacked
        back = unstack_pipeline_variables(stacked, DEPTH)
        for a, b in zip(jax.tree.leaves(variables[coll]),
                        jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_depth_not_divisible_raises():
    model = _model()
    mesh = pipeline_mesh(stage=3, data=1)
    with pytest.raises(ValueError, match="divisible"):
        make_pipeline_train_step(model, optax.sgd(1e-2), mesh,
                                 num_microbatches=2)


def test_moe_blocks_rejected():
    model = _model(moe_experts=4)
    mesh = pipeline_mesh(stage=2, data=1)
    with pytest.raises(NotImplementedError, match="pipeline over MoE"):
        make_pipeline_train_step(model, optax.sgd(1e-2), mesh,
                                 num_microbatches=2)


@pytest.mark.parametrize("pos,kvh", [("learned", None), ("rope", None),
                                     ("rope", 2)])
def test_pipeline_matches_accum_step(pos, kvh):
    """S=4 pipeline with MB=2 == single-device accum_steps=2, over several
    steps: loss trajectory and every trained parameter (quantizer scales
    included) agree — the pipeline IS the accumulation step, rescheduled.
    init_batches=0 keeps every quantizer in learning mode (the observer
    window-closing step has a documented one-step grad deferral — see
    test_observer_window_transition)."""
    model = _model(qc=default_qconfig(8, 8, init_batches=0),
                   pos_embedding=pos, num_kv_heads=kvh)
    tx = optax.sgd(1e-2)
    mesh = pipeline_mesh(stage=4, data=1)
    MB = 2

    # reference: gradient accumulation on one device
    sref = create_train_state(model, tx, _tokens(2))
    step_ref = make_train_step(model, tx, loss_fn=_lm_loss_batch,
                               accum_steps=MB, donate=False)

    spipe = create_pipeline_state(model, tx, mesh, _tokens(2))
    step_pipe = make_pipeline_train_step(model, tx, mesh,
                                         num_microbatches=MB, donate=False)

    for i in range(3):
        toks = _tokens(8, seed=10 + i)
        batch = {"input": toks, "label": toks}
        sref, mref = step_ref(sref, batch)
        spipe, mpipe = step_pipe(spipe, batch)
        np.testing.assert_allclose(float(mpipe["loss"]),
                                   float(mref["loss"]), rtol=1e-5)

    # compare every trained leaf (unstack the pipeline blocks first)
    for coll in ("params", "qparams"):
        got = unstack_pipeline_variables(spipe.params[coll], DEPTH)
        want = sref.params[coll]
        ga, wa = jax.tree.leaves(got), jax.tree.leaves(want)
        assert len(ga) == len(wa)
        for a, b in zip(ga, wa):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)
    # quant_state (observer stats, init counters) must track too
    got = unstack_pipeline_variables(
        spipe.model_state["quant_state"], DEPTH)
    for a, b in zip(jax.tree.leaves(got),
                    jax.tree.leaves(sref.model_state["quant_state"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_observer_window_transition():
    """The one documented deviation from the accum step: on the step where
    the observer window closes (init_batches=1 ⇒ a write lands between
    microbatch 0 and 1), the post-write microbatch's scale gradients are
    deferred to the next step.  Loss and observer state still match
    EXACTLY; qparams drift is bounded by lr·|dS|/MB."""
    model = _model(qc=default_qconfig(8, 8, init_batches=1))
    tx = optax.sgd(1e-2)
    mesh = pipeline_mesh(stage=4, data=1)
    toks = _tokens(8, seed=10)
    batch = {"input": toks, "label": toks}

    sref = create_train_state(model, tx, _tokens(2))
    step_ref = make_train_step(model, tx, loss_fn=_lm_loss_batch,
                               accum_steps=2, donate=False)
    sref, mref = step_ref(sref, batch)

    spipe = create_pipeline_state(model, tx, mesh, _tokens(2))
    step_pipe = make_pipeline_train_step(model, tx, mesh,
                                         num_microbatches=2, donate=False)
    spipe, mpipe = step_pipe(spipe, batch)

    np.testing.assert_allclose(float(mpipe["loss"]), float(mref["loss"]),
                               rtol=1e-6)
    got_qs = unstack_pipeline_variables(
        spipe.model_state["quant_state"], DEPTH)
    for a, b in zip(jax.tree.leaves(got_qs),
                    jax.tree.leaves(sref.model_state["quant_state"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    got_qp = unstack_pipeline_variables(spipe.params["qparams"], DEPTH)
    for a, b in zip(jax.tree.leaves(got_qp),
                    jax.tree.leaves(sref.params["qparams"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_pipeline_with_data_parallelism():
    """(data=2, stage=2) mesh: with learnable-init quantizers pinned to the
    global microbatch numel (no observer writes, so gradient exactness is
    isolated from the observer pmean-sync — that sync is pinned separately
    below), DP×PP grads == the data=1 pipeline."""
    from jaxlsq.core.spec import QuantSpec
    from jaxlsq.models.qconfig import QConfig
    from jaxlsq.observers import LSQQuantizer

    B, MB = 8, 2
    act_numel = (B // MB) * T * DIM  # per-microbatch GLOBAL activation numel
    wq = LSQQuantizer(spec=QuantSpec.weight_default(8), otype="weight")
    aq = LSQQuantizer(spec=QuantSpec.activation_default(8),
                      otype="activation", init_mode="learnable",
                      n_batches=-1, numel=act_numel)
    qc = QConfig(weight=wq, activation=aq)
    model = _model(qc=qc)
    tx = optax.sgd(1e-2)
    toks = _tokens(B, seed=33)
    batch = {"input": toks, "label": toks}

    def run(data):
        mesh = pipeline_mesh(stage=2, data=data)
        s = create_pipeline_state(model, tx, mesh, _tokens(2))
        step = make_pipeline_train_step(model, tx, mesh,
                                        num_microbatches=MB, donate=False)
        s, m = step(s, batch)
        return s, float(m["loss"])

    s1, l1 = run(1)
    s2, l2 = run(2)
    np.testing.assert_allclose(l2, l1, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_pipeline_dp_observer_state_replica_consistent():
    """With observers ENABLED under (data=2, stage=2), the mutated
    quantizer/observer state must come back replica-CONSISTENT: each data
    replica's observers stream only their own batch shard, and the step
    pmeans the float state over 'data' before returning (without it, the
    out_shardings claim replication over silently divergent buffers)."""
    qc = default_qconfig(8, 8, init_batches=3)  # observer window ACTIVE
    model = _model(qc=qc)
    tx = optax.sgd(1e-2)
    mesh = pipeline_mesh(stage=2, data=2)
    # batch halves must DIFFER so shard-local observers would diverge
    toks = _tokens(8, seed=44)
    state = create_pipeline_state(model, tx, mesh, _tokens(2))
    step = make_pipeline_train_step(model, tx, mesh, num_microbatches=2,
                                    donate=False)
    state, metrics = step(state, {"input": toks, "label": toks})
    assert np.isfinite(float(metrics["loss"]))

    def check(path, leaf):
        shards = getattr(leaf, "addressable_shards", None)
        if not shards or leaf.ndim == 0:
            return
        names = [getattr(k, "key", None) for k in path]
        if "blocks" in names:
            return  # stage-sharded by design
        first = np.asarray(shards[0].data)
        for s in shards[1:]:
            np.testing.assert_array_equal(
                np.asarray(s.data), first,
                err_msg="/".join(str(n) for n in names))

    jax.tree_util.tree_map_with_path(
        check, state.model_state.get("quant_state", {}))
    jax.tree_util.tree_map_with_path(check, state.params.get("qparams", {}))


def test_pipeline_state_feeds_plain_model_and_serving():
    """Unstacked pipeline-trained variables drive the PLAIN LM forward and
    the serving converter — checkpoint/serving interop."""
    from jaxlsq.serve import convert

    qc = default_qconfig(8, 8, init_batches=1)
    model = _model(qc=qc)
    tx = optax.sgd(1e-2)
    mesh = pipeline_mesh(stage=4, data=1)
    s = create_pipeline_state(model, tx, mesh, _tokens(2))
    step = make_pipeline_train_step(model, tx, mesh, num_microbatches=2,
                                    donate=False)
    toks = _tokens(8, seed=50)
    s, _ = step(s, {"input": toks, "label": toks})

    variables = {
        "params": unstack_pipeline_variables(s.params["params"], DEPTH),
        "qparams": unstack_pipeline_variables(s.params["qparams"], DEPTH),
        "quant_state": unstack_pipeline_variables(
            s.model_state["quant_state"], DEPTH),
    }
    out, _ = model.apply(variables, toks, training=False,
                         mutable=["quant_state", "qparams"])
    assert out.shape == (8, T, VOCAB)
    assert np.all(np.isfinite(np.asarray(out)))

    sv = convert(variables, qc)
    sm = dataclasses.replace(model,
                             qconfig=qc.for_serving("static", impl="xla"))
    got = sm.apply(sv, toks, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(out),
                               rtol=5e-4, atol=5e-4)


def test_remat_is_numerically_identical():
    """remat=True (jax.checkpoint around each block) recomputes instead of
    stashing — same loss, same updated params, bit-for-bit-tolerant."""
    model = _model(qc=default_qconfig(8, 8, init_batches=0))
    tx = optax.sgd(1e-2)
    mesh = pipeline_mesh(stage=4, data=1)
    toks = _tokens(8, seed=77)
    batch = {"input": toks, "label": toks}

    def run(remat):
        s = create_pipeline_state(model, tx, mesh, _tokens(2))
        step = make_pipeline_train_step(model, tx, mesh, num_microbatches=2,
                                        donate=False, remat=remat)
        s, m = step(s, batch)
        return s, float(m["loss"])

    s0, l0 = run(False)
    s1, l1 = run(True)
    np.testing.assert_allclose(l1, l0, rtol=1e-7)
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_pipeline_state_checkpoint_roundtrip(tmp_path):
    """The stage-stacked QATTrainState checkpoints and restores through the
    standard utils (stacked (S, L, …) leaves are ordinary pytree leaves)."""
    from jaxlsq.utils.checkpoint import restore_checkpoint, save_checkpoint

    model = _model()
    tx = optax.sgd(1e-2)
    mesh = pipeline_mesh(stage=4, data=1)
    s = create_pipeline_state(model, tx, mesh, _tokens(2))
    step = make_pipeline_train_step(model, tx, mesh, num_microbatches=2,
                                    donate=False)
    toks = _tokens(8, seed=91)
    s, _ = step(s, {"input": toks, "label": toks})

    save_checkpoint(str(tmp_path), s, step=1)
    target = create_pipeline_state(model, tx, mesh, _tokens(2))
    restored = restore_checkpoint(str(tmp_path), target)
    for a, b in zip(jax.tree.leaves(s), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and a restored state keeps training under the pipelined step
    from jaxlsq.parallel import pipeline_sharding

    restored = jax.tree.map(jax.device_put, restored,
                            pipeline_sharding(mesh, restored))
    s2, m2 = step(restored, {"input": toks, "label": toks})
    assert np.isfinite(float(m2["loss"]))
