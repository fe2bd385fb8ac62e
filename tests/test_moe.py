"""QuantMoE tests: routing/capacity semantics, LSQ quantization granularity,
aux-loss train-step integration, serving conversion parity, and expert
parallelism over a mesh 'expert' axis.

The reference has no MoE (it is a quantization library); these tests pin the
TPU-native extension's own contracts (models/moe.py docstring):
  * GShard-style static-capacity dispatch == a dense MLP when nothing drops;
  * per-EXPERT LSQ scales (the stacked analogue of per-channel);
  * serve-mode weight-only einsum == einsum with dequantize_weight (oracle);
  * expert-parallel train step == single-device step.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jaxlsq.models import QuantMoE, default_qconfig, load_balance_loss
from jaxlsq.models.qconfig import QConfig
from jaxlsq.parallel import create_train_state, make_train_step
from jaxlsq.parallel.moe import EXPERT_SCOPES, moe_sharding
from jaxlsq.serve import convert, dequantize_weight

D, H, E = 8, 12, 4


def rng(seed=0):
    return np.random.RandomState(seed)


def _x(n=16, d=D, seed=0):
    return jnp.asarray(rng(seed).randn(n, d).astype(np.float32))


def _float_qc():
    return QConfig()  # no quantizers: pure routing/capacity semantics


# --------------------------------------------------------------------------
# routing / capacity semantics
# --------------------------------------------------------------------------

def test_top_k_validation():
    moe = QuantMoE(hidden=H, num_experts=E, qconfig=_float_qc(), top_k=5)
    with pytest.raises(ValueError, match="top_k"):
        moe.init(jax.random.key(0), _x())


def test_single_expert_equals_dense_mlp():
    """E=1, top_k=1, full capacity: the dispatch/combine machinery must be an
    exact permutation — QuantMoE degenerates to the plain 2-layer gelu MLP."""
    moe = QuantMoE(hidden=H, num_experts=1, qconfig=_float_qc(), top_k=1,
                   capacity_factor=1.0)
    x = _x(10)
    variables = moe.init(jax.random.key(1), x)
    y = moe.apply(variables, x, training=False, mutable=["losses"])[0]

    p = variables["params"]
    h = jax.nn.gelu(x @ p["experts_up"]["kernel"][0]
                    + p["experts_up"]["bias"])
    want = h @ p["experts_down"]["kernel"][0] + p["experts_down"]["bias"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_permutation_equivariance_no_drop():
    """With capacity ≥ N nothing drops, so each token's output depends only on
    itself: permuting tokens permutes outputs."""
    moe = QuantMoE(hidden=H, num_experts=E, qconfig=_float_qc(), top_k=2,
                   capacity_factor=float(E))  # C = N, nothing drops
    x = _x(12, seed=3)
    variables = moe.init(jax.random.key(2), x)
    perm = rng(4).permutation(12)
    y = moe.apply(variables, x, training=False, mutable=["losses"])[0]
    yp = moe.apply(variables, x[perm], training=False, mutable=["losses"])[0]
    np.testing.assert_allclose(np.asarray(yp), np.asarray(y)[perm],
                               rtol=1e-4, atol=1e-5)


def test_capacity_drop_zeroes_overflow_tokens():
    """C=1 per expert with top_k=1: at most E tokens survive; dropped tokens'
    MoE output is exactly zero (they ride the caller's residual)."""
    n = 16
    moe = QuantMoE(hidden=H, num_experts=E, qconfig=_float_qc(), top_k=1,
                   capacity_factor=E / n * 1.0)  # C = ceil(1*n*cf/E) = 1
    x = _x(n, seed=5)
    variables = moe.init(jax.random.key(3), x)
    y = np.asarray(moe.apply(variables, x, training=False,
                             mutable=["losses"])[0])
    nonzero_rows = np.any(y != 0.0, axis=-1).sum()
    assert nonzero_rows <= E
    # and zero rows are EXACTLY zero
    zero_rows = y[~np.any(y != 0.0, axis=-1)]
    np.testing.assert_array_equal(zero_rows, np.zeros_like(zero_rows))


def test_leading_dims_flatten():
    """(B, T, d) inputs route per token and reshape back."""
    moe = QuantMoE(hidden=H, num_experts=E, qconfig=_float_qc(),
                   capacity_factor=float(E))
    xb = jnp.asarray(rng(6).randn(3, 5, D).astype(np.float32))
    variables = moe.init(jax.random.key(4), xb)
    yb = moe.apply(variables, xb, training=False, mutable=["losses"])[0]
    yf = moe.apply(variables, xb.reshape(15, D), training=False,
                   mutable=["losses"])[0]
    assert yb.shape == (3, 5, D)
    np.testing.assert_allclose(np.asarray(yb).reshape(15, D),
                               np.asarray(yf), rtol=1e-5, atol=1e-6)


def test_load_balance_loss_values():
    """Uniform routing ⇒ 1.0 (the minimum); fully collapsed routing ⇒ E."""
    n = 64
    uniform = jnp.full((n, E), 1.0 / E)
    top1_cycled = jnp.arange(n) % E
    np.testing.assert_allclose(
        float(load_balance_loss(uniform, top1_cycled)), 1.0, rtol=1e-6)
    collapsed = jax.nn.one_hot(jnp.zeros(n, jnp.int32), E)
    top1_same = jnp.zeros(n, jnp.int32)
    np.testing.assert_allclose(
        float(load_balance_loss(collapsed, top1_same)), float(E), rtol=1e-6)


# --------------------------------------------------------------------------
# quantization granularity + train step
# --------------------------------------------------------------------------

def test_per_expert_lsq_scales():
    """per_channel weight QConfig ⇒ one learned LSQ scale PER EXPERT (the
    stacked axis-0 analogue of per-output-channel)."""
    qc = default_qconfig(8, 8, per_channel_weights=True, init_batches=1)
    moe = QuantMoE(hidden=H, num_experts=E, qconfig=qc)
    variables = moe.init(jax.random.key(5), _x())
    for scope in EXPERT_SCOPES:
        s = variables["qparams"][scope]["weight_fq"]["qp"]["scale"]
        assert s.shape == (E,)


def test_train_step_folds_aux_loss():
    """make_train_step's objective == task loss + the weighted load-balance
    aux written to the 'losses' collection; params actually move."""
    qc = default_qconfig(8, 8, init_batches=1)
    moe = QuantMoE(hidden=H, num_experts=E, qconfig=qc, aux_loss_weight=0.03)
    x = _x(16, seed=7)
    tx = optax.sgd(1e-2)
    state = create_train_state(moe, tx, x)

    def loss_fn(out, batch):
        return jnp.mean((out - batch["label"]) ** 2)

    batch = {"input": x, "label": jnp.asarray(
        rng(8).randn(16, D).astype(np.float32))}

    # manual forward with the same state: task loss + weighted aux
    out, mut = moe.apply(
        {**state.params, **state.model_state}, x, training=True,
        mutable=["quant_state", "qparams", "losses"])
    want = float(loss_fn(out, batch) + mut["losses"]["aux"])
    assert float(mut["losses"]["aux"]) > 0.0

    step = make_train_step(moe, tx, loss_fn=loss_fn, donate=False)
    new_state, metrics = step(state, batch)
    np.testing.assert_allclose(float(metrics["loss"]), want, rtol=1e-6)
    # the router receives gradient through the combine gates
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     state.params["params"]["router"],
                     new_state.params["params"]["router"])
    assert max(jax.tree.leaves(d)) > 0.0


# --------------------------------------------------------------------------
# serving conversion
# --------------------------------------------------------------------------

def _trained_moe(steps=4, per_channel=True):
    qc = default_qconfig(8, 8, per_channel_weights=per_channel,
                         init_batches=2)
    moe = QuantMoE(hidden=H, num_experts=E, qconfig=qc,
                   capacity_factor=float(E))
    tx = optax.sgd(1e-2)
    r = rng(20)
    x0 = jnp.asarray(r.randn(16, D).astype(np.float32))
    state = create_train_state(moe, tx, x0)

    def loss_fn(out, batch):
        return jnp.mean((out - batch["label"]) ** 2)

    step = make_train_step(moe, tx, loss_fn=loss_fn, donate=False)
    for _ in range(steps):
        batch = {"input": jnp.asarray(r.randn(16, D).astype(np.float32)),
                 "label": jnp.asarray(r.randn(16, D).astype(np.float32))}
        state, _ = step(state, batch)
    return moe, qc, state


@pytest.mark.parametrize("per_channel", [False, True])
def test_convert_e2e_matches_eval_fake_quant(per_channel):
    """Converted serve MoE (static act quant, f32 einsum) == QAT eval —
    the torch.quantization.convert parity contract extended to the stacked
    expert layout (per-expert scales on axis 0)."""
    moe, qc, state = _trained_moe(per_channel=per_channel)
    x = _x(12, seed=21)
    want, _ = moe.apply({**state.params, **state.model_state}, x,
                        training=False, mutable=["quant_state", "qparams"])

    serve_vars = convert({**state.params, **state.model_state}, qc)
    packed = serve_vars["quantized"]["experts_up"]["kernel"]
    assert packed.data.shape == (E, D, H) and packed.bits == 8
    assert packed.axis == 0
    assert packed.scale.shape == ((E,) if per_channel else (1,))

    serve_moe = dataclasses.replace(
        moe, qconfig=qc.for_serving(act_mode="static", precision="highest"))
    got = serve_moe.apply(serve_vars, x, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_serve_einsum_matches_dequant_oracle():
    """The fused weight-only expert einsum == einsum against
    dequantize_weight(packed): the scale/zp fold is algebraically lossless
    (serve/matmul.py's wo identity, stacked)."""
    from jaxlsq.models.moe import _ExpertDense

    moe, qc, state = _trained_moe()
    serve_vars = convert({**state.params, **state.model_state}, qc)
    x = _x(12, seed=22)

    serve_moe = dataclasses.replace(
        moe, qconfig=qc.for_serving(act_mode="none", precision="highest"))
    got = serve_moe.apply(serve_vars, x, training=False)

    # oracle: dequantize both expert stacks, run the float einsums with the
    # SAME dispatch (rebuild it via a float model sharing the router params)
    deq_params = {"params": {
        "router": serve_vars["params"]["router"],
        "experts_up": {
            "kernel": dequantize_weight(
                serve_vars["quantized"]["experts_up"]["kernel"]),
            "bias": serve_vars["params"]["experts_up"]["bias"]},
        "experts_down": {
            "kernel": dequantize_weight(
                serve_vars["quantized"]["experts_down"]["kernel"]),
            "bias": serve_vars["params"]["experts_down"]["bias"]},
    }}
    float_moe = dataclasses.replace(moe, qconfig=_float_qc())
    want = float_moe.apply(deq_params, x, training=False,
                           mutable=["losses"])[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("per_channel", [False, True])
def test_serve_static_int8_matches_simulated(per_channel):
    """The stacked int8×int8 expert einsum (both operands int8 on the MXU,
    full dequant epilogue) == the float-simulated static path to f32
    rounding — the same identity static_int8_matmul pins for 2-D."""
    moe, qc, state = _trained_moe(per_channel=per_channel)
    serve_vars = convert({**state.params, **state.model_state}, qc)
    x = _x(12, seed=23)
    sim = dataclasses.replace(
        moe, qconfig=qc.for_serving("static", precision="highest"))
    want = sim.apply(serve_vars, x, training=False)
    m_int = dataclasses.replace(moe, qconfig=qc.for_serving("static_int8"))
    got = m_int.apply(serve_vars, x, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_serve_rejects_dynamic_act_mode():
    moe, qc, state = _trained_moe(steps=1)
    serve_vars = convert({**state.params, **state.model_state}, qc)
    sm = dataclasses.replace(moe, qconfig=qc.for_serving(act_mode="dynamic"))
    with pytest.raises(ValueError, match="dynamic"):
        sm.apply(serve_vars, _x(4), training=False)


# --------------------------------------------------------------------------
# expert parallelism
# --------------------------------------------------------------------------

needs8 = pytest.mark.skipif(jax.device_count() < 8,
                            reason="needs 8 virtual devices")


def _ep_mesh():
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, axis_names=("data", "expert"))


@needs8
def test_moe_sharding_tree_placement():
    """Stacked (E, …) leaves under expert scopes shard over 'expert'; the
    router, biases-with-non-E-leading-dim, scalars, and opt_state mirrors all
    follow the same rule."""
    qc = default_qconfig(8, 8, per_channel_weights=True, init_batches=1)
    moe = QuantMoE(hidden=H, num_experts=E, qconfig=qc)
    tx = optax.sgd(1e-2, momentum=0.9)
    state = create_train_state(moe, tx, _x())
    mesh = _ep_mesh()
    sh = moe_sharding(mesh, state, num_experts=E, axis="expert")

    assert sh.params["params"]["experts_up"]["kernel"].spec == \
        P("expert", None, None)
    assert sh.params["params"]["router"]["kernel"].spec == P()
    # per-expert LSQ qparams ride the expert axis
    assert sh.params["qparams"]["experts_up"]["weight_fq"]["qp"][
        "scale"].spec == P("expert")
    # optimizer momentum mirrors the param placement through the same paths
    mom = jax.tree.leaves(
        jax.tree.map(lambda s: s.spec,
                     sh.opt_state[0].trace["params"]["experts_up"]))
    assert P("expert", None, None) in mom


@needs8
def test_expert_parallel_train_step_matches_single_device():
    """EP train step (stacked expert weights sharded over 'expert', batch over
    'data') == the unsharded step: loss and updated params agree."""
    qc = default_qconfig(8, 8, per_channel_weights=True, init_batches=1)
    moe = QuantMoE(hidden=H, num_experts=E, qconfig=qc,
                   capacity_factor=float(E))
    tx = optax.sgd(1e-2)
    r = rng(30)
    x = jnp.asarray(r.randn(16, D).astype(np.float32))
    batch = {"input": x,
             "label": jnp.asarray(r.randn(16, D).astype(np.float32))}

    def loss_fn(out, b):
        return jnp.mean((out - b["label"]) ** 2)

    state1 = create_train_state(moe, tx, x)
    step1 = make_train_step(moe, tx, loss_fn=loss_fn, donate=False)
    state1, m1 = step1(state1, batch)

    mesh = _ep_mesh()
    state8 = create_train_state(moe, tx, x)
    sh = moe_sharding(mesh, state8, num_experts=E, axis="expert")
    state8 = jax.tree.map(jax.device_put, state8, sh)
    step8 = make_train_step(moe, tx, loss_fn=loss_fn, mesh=mesh,
                            donate=False, state_sharding=sh)
    batch8 = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(
            mesh, P("data", *([None] * (a.ndim - 1))))), batch)
    state8, m8 = step8(state8, batch8)

    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    # the updated expert stack stays expert-sharded (no silent gather-out)
    out_sh = state8.params["params"]["experts_up"]["kernel"].sharding
    assert out_sh.spec == P("expert", None, None)


# --------------------------------------------------------------------------
# MoE transformer LM (zoo integration)
# --------------------------------------------------------------------------

class TestMoELM:
    """QuantTransformerLM(moe_experts=E): MoE MLP blocks inside the flagship
    LM — train step sums every block's aux loss; decode through the KV cache
    matches the full forward when capacity never drops (routing is per-token,
    so it must be position/batch-composition independent)."""

    VOCAB, LDIM, MAXLEN = 32, 16, 16

    @pytest.fixture(scope="class")
    def moe_lm(self):
        from jaxlsq.models import QuantTransformerLM
        from jaxlsq.models.toggles import disable_observer

        qc = default_qconfig(8, 8, init_batches=1)
        # capacity_factor = E/top_k ⇒ C = N: no drops, per-token routing
        model = QuantTransformerLM(
            vocab=self.VOCAB, dim=self.LDIM, depth=2, num_heads=4,
            qconfig=qc, max_len=self.MAXLEN,
            moe_experts=E, moe_top_k=2, moe_capacity_factor=E / 2.0)
        r = rng(40)
        tokens = jnp.asarray(r.randint(0, self.VOCAB, size=(2, 10)))
        variables = disable_observer(
            model.init(jax.random.key(41), tokens, training=False))
        return model, variables, tokens

    def test_decode_matches_full_forward(self, moe_lm):
        from tests.test_decode import _decode_logits

        model, variables, tokens = moe_lm
        full = model.apply(variables, tokens, training=False)
        dec, _ = _decode_logits(model, variables, tokens, t0=4)
        np.testing.assert_allclose(np.asarray(dec),
                                   np.asarray(full[:, 4:]),
                                   rtol=2e-4, atol=2e-4)

    def test_train_step_sums_block_aux_losses(self, moe_lm):
        from jaxlsq.models import QuantTransformerLM

        model, _, tokens = moe_lm
        tx = optax.sgd(1e-2)
        state = create_train_state(model, tx, tokens)

        def loss_fn(logits, batch):
            return optax.softmax_cross_entropy_with_integer_labels(
                logits[:, :-1], batch["label"][:, 1:]).mean()

        # every block contributes one aux scalar
        out, mut = model.apply(
            {**state.params, **state.model_state}, tokens, training=True,
            mutable=["quant_state", "qparams", "losses", "batch_stats"])
        aux = [float(mut["losses"][f"block{i}"]["moe"]["aux"])
               for i in range(2)]
        assert all(a > 0 for a in aux)
        batch = {"input": tokens, "label": tokens}
        want = float(loss_fn(out, batch)) + sum(aux)

        step = make_train_step(model, tx, loss_fn=loss_fn, donate=False)
        _, metrics = step(state, batch)
        np.testing.assert_allclose(float(metrics["loss"]), want, rtol=1e-5)

    @needs8
    def test_ep_dp_lm_train_step_matches_single_device(self, moe_lm):
        """The LM train step with expert stacks sharded over 'expert' and the
        batch over 'data' == the single-device step."""
        model, _, tokens = moe_lm
        tx = optax.sgd(1e-2)
        batch = {"input": tokens, "label": tokens}

        def loss_fn(logits, b):
            return optax.softmax_cross_entropy_with_integer_labels(
                logits[:, :-1], b["label"][:, 1:]).mean()

        state1 = create_train_state(model, tx, tokens)
        step1 = make_train_step(model, tx, loss_fn=loss_fn, donate=False)
        state1, m1 = step1(state1, batch)

        mesh = _ep_mesh()
        state8 = create_train_state(model, tx, tokens)
        sh = moe_sharding(mesh, state8, num_experts=E, axis="expert")
        state8 = jax.tree.map(jax.device_put, state8, sh)
        step8 = make_train_step(model, tx, loss_fn=loss_fn, mesh=mesh,
                                donate=False, state_sharding=sh)
        batch8 = jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(
                mesh, P("data", *([None] * (a.ndim - 1))))), batch)
        state8, m8 = step8(state8, batch8)

        np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                                   rtol=1e-5)
        for a, b in zip(jax.tree.leaves(state1.params),
                        jax.tree.leaves(state8.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)

    def test_serve_decode_matches_serve_forward(self, moe_lm):
        """Converted MoE LM (int8 packed expert stacks) under the serving
        config: KV-cache decode == the serve-mode full forward — routing,
        static act quant, and the fused expert einsum all agree between the
        t=1 decode program and the full-sequence program."""
        from tests.test_decode import _decode_logits

        model, variables, tokens = moe_lm
        qc = model.qconfig
        sv = convert(variables, qc)
        for scope in EXPERT_SCOPES:
            p = sv["quantized"]["block0"]["moe"][scope]["kernel"]
            assert p.data.dtype == jnp.int8 and p.axis == 0
        sm = dataclasses.replace(
            model,
            qconfig=qc.for_serving("static", impl="xla",
                                   precision="highest"))
        full = sm.apply(sv, tokens, training=False)
        dec, _ = _decode_logits(sm, sv, tokens, t0=4)
        np.testing.assert_allclose(np.asarray(dec),
                                   np.asarray(full[:, 4:]),
                                   rtol=2e-4, atol=2e-4)

    def test_engine_serves_moe_lm(self, moe_lm):
        """Token-level continuous batching over the converted MoE LM: the
        staggered engine output == lockstep greedy decode on the same serve
        model (per-slot routing stays independent because capacity never
        drops at these sizes)."""
        from jaxlsq.serve.decode import DecodeEngine, prefill

        model, variables, tokens = moe_lm
        qc = model.qconfig
        sv = convert(variables, qc)
        sm = dataclasses.replace(
            model, qconfig=qc.for_serving("static", impl="xla"))
        r = rng(60)
        reqs = [(r.randint(0, self.VOCAB, size=r.randint(2, 6)),
                 int(r.randint(2, 5))) for _ in range(3)]
        with DecodeEngine(sm, sv, max_batch=2, prompt_buckets=(4, 8),
                          prefill_chunk=2) as eng:
            futs = [eng.submit(p, n) for p, n in reqs]
            outs = [f.result(timeout=600) for f in futs]
        for (p, n), got in zip(reqs, outs):
            last, cache, idx = prefill(sm, sv, jnp.asarray(p)[None])
            tok = jnp.argmax(last, -1).astype(jnp.int32)
            want = [int(tok[0])]
            for _ in range(n - 1):
                logits, cache = sm.apply(sv, tok[:, None], cache=cache,
                                         cache_index=idx)
                tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                want.append(int(tok[0]))
                idx = idx + 1
            np.testing.assert_array_equal(got, np.asarray(want, np.int32))


@needs8
def test_ep_serving_forward_matches_unsharded():
    """Expert-parallel SERVING: moe_sharding places the packed int8 expert
    stacks (PackedWeight data/scale/zp) over the 'expert' axis; the jitted
    serve forward equals the unsharded one and never gathers the stacks."""
    import re

    moe, qc, state = _trained_moe()
    sv = convert({**state.params, **state.model_state}, qc)
    sm = dataclasses.replace(moe, qconfig=qc.for_serving("static"))
    x = _x(16, seed=70)
    want = sm.apply(sv, x, training=False)

    mesh = _ep_mesh()
    sh = moe_sharding(mesh, sv, num_experts=E, axis="expert")
    sv8 = jax.tree.map(jax.device_put, sv, sh)
    xin = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    fwd = jax.jit(lambda v, a: sm.apply(v, a, training=False))
    compiled = fwd.lower(sv8, xin).compile()
    got = compiled(sv8, xin)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    # the int8 stacks stay sharded: no all-gather result carries s8[E,·,·]
    for line in compiled.as_text().splitlines():
        if re.search(r"=\s*\S+\s+all-gather\(", line):
            assert f"s8[{E}," not in line.split("=", 1)[0], line.strip()


def test_toggles_reach_expert_quantizers():
    """disable_fake_quant walks the MoE scopes (act_fq/weight_fq live under
    experts_up/experts_down like any QuantDense): with fake-quant disabled
    the MoE output equals the float model sharing the same parameters."""
    from jaxlsq.models.toggles import disable_fake_quant

    qc = default_qconfig(8, 8, init_batches=0)
    moe = QuantMoE(hidden=H, num_experts=E, qconfig=qc,
                   capacity_factor=float(E))
    x = _x(10, seed=81)
    variables = moe.init(jax.random.key(9), x)
    off = disable_fake_quant(variables)
    got = moe.apply(off, x, training=False,
                    mutable=["losses", "quant_state", "qparams"])[0]

    fmoe = QuantMoE(hidden=H, num_experts=E, qconfig=_float_qc(),
                    capacity_factor=float(E))
    want = fmoe.apply({"params": variables["params"]}, x, training=False,
                      mutable=["losses"])[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_w4_expert_stacks_pack_and_serve_int4():
    """4-bit-trained expert stacks convert to nibble-packed int4 carriers
    (K axis halved) and the weight-only serve path matches QAT eval."""
    qc = default_qconfig(4, 8, per_channel_weights=True, init_batches=2)
    moe = QuantMoE(hidden=H, num_experts=E, qconfig=qc,
                   capacity_factor=float(E))
    tx = optax.sgd(1e-2)
    r = rng(90)
    x0 = jnp.asarray(r.randn(16, D).astype(np.float32))
    state = create_train_state(moe, tx, x0)

    def loss_fn(out, batch):
        return jnp.mean((out - batch["label"]) ** 2)

    step = make_train_step(moe, tx, loss_fn=loss_fn, donate=False)
    for _ in range(3):
        batch = {"input": jnp.asarray(r.randn(16, D).astype(np.float32)),
                 "label": jnp.asarray(r.randn(16, D).astype(np.float32))}
        state, _ = step(state, batch)

    want, _ = moe.apply({**state.params, **state.model_state}, x0,
                        training=False, mutable=["quant_state", "qparams"])
    sv = convert({**state.params, **state.model_state}, qc)
    up = sv["quantized"]["experts_up"]["kernel"]
    assert up.bits == 4 and up.data.shape == (E, D // 2, H)
    for mode, prec in (("static", "highest"), ("static_int8", None)):
        sm = dataclasses.replace(
            moe, qconfig=qc.for_serving(mode, precision=prec))
        got = sm.apply(sv, x0, training=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4, err_msg=mode)


@pytest.mark.parametrize("bits", [8, 4])
def test_serve_pallas_matches_xla(bits):
    """serve_impl='pallas' (expert-scanned 2-D wo_matmul launches) == the
    XLA einsum path, for int8 and int4 stacks."""
    qc = default_qconfig(bits, 8, per_channel_weights=True, init_batches=2)
    moe = QuantMoE(hidden=H, num_experts=E, qconfig=qc,
                   capacity_factor=float(E))
    tx = optax.sgd(1e-2)
    r = rng(95)
    x0 = jnp.asarray(r.randn(16, D).astype(np.float32))
    state = create_train_state(moe, tx, x0)

    def loss_fn(out, batch):
        return jnp.mean((out - batch["label"]) ** 2)

    step = make_train_step(moe, tx, loss_fn=loss_fn, donate=False)
    state, _ = step(state, {"input": x0, "label": x0})
    sv = convert({**state.params, **state.model_state}, qc)
    assert sv["quantized"]["experts_up"]["kernel"].bits == bits

    # reference = the f32-exact XLA path (the Pallas kernel accumulates in
    # f32, so it should sit much closer to f32 than the bf16 XLA einsum)
    want = dataclasses.replace(
        moe, qconfig=qc.for_serving("static", impl="xla",
                                    precision="highest")).apply(
        sv, x0, training=False)
    got = dataclasses.replace(
        moe, qconfig=qc.for_serving("static", impl="pallas")).apply(
        sv, x0, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_convert_structure_matches_serve_init():
    """convert() output structure == serve-mode QuantMoE.init structure —
    checkpoints round-trip through either path (the dense-layer contract,
    test_serve.py, extended to stacked experts incl. int4 dummy shapes)."""
    for bits in (8, 4):
        qc = default_qconfig(bits, 8, per_channel_weights=True,
                             init_batches=1)
        moe = QuantMoE(hidden=H, num_experts=E, qconfig=qc)
        variables = moe.init(jax.random.key(11), _x())
        sv = convert(variables, qc)
        serve_moe = dataclasses.replace(moe, qconfig=qc.for_serving("static"))
        tmpl = serve_moe.init(jax.random.key(12), _x(), training=False)
        assert jax.tree.structure(sv) == jax.tree.structure(tmpl), bits
        for a, b in zip(jax.tree.leaves(sv), jax.tree.leaves(tmpl)):
            assert a.shape == b.shape and a.dtype == b.dtype, bits


def test_route_invariants_fuzz():
    """Property fuzz over the pure routing function (models/moe.py::route):
    for random (N, E, top_k, C) —
      * each (expert, slot) holds at most ONE token;
      * each expert receives at most C tokens;
      * combine rows are sub-convex (sum in [0, 1+eps]), exactly the
        renormalized kept gates;
      * dispatch is exactly the support of combine;
      * with C >= N nothing drops: every row's combine sums to 1.
    """
    from jaxlsq.models.moe import route

    r = rng(123)
    for trial in range(25):
        N = int(r.randint(1, 33))
        Ee = int(r.randint(1, 9))
        k = int(r.randint(1, Ee + 1))
        C = int(r.randint(1, N + 3))
        gates = jax.nn.softmax(
            jnp.asarray(r.randn(N, Ee).astype(np.float32)) * 2.0, axis=-1)
        dispatch, combine = route(gates, k, C)
        d = np.asarray(dispatch)
        cmb = np.asarray(combine)
        assert d.shape == (N, Ee, C)
        # one token per (expert, slot)
        assert (d.sum(axis=0) <= 1 + 1e-6).all(), (trial, N, Ee, k, C)
        # per-expert load <= capacity
        assert (d.sum(axis=(0, 2)) <= C + 1e-6).all()
        # combine support == dispatch; rows sub-convex
        np.testing.assert_array_equal(cmb > 0, d > 0)
        rows = cmb.sum(axis=(1, 2))
        assert (rows <= 1 + 1e-5).all() and (rows >= -1e-6).all()
        if C >= N:  # nothing can drop
            np.testing.assert_allclose(rows, np.ones(N), rtol=1e-5)


def test_moe_sharding_leaves_shared_bias_replicated():
    """A SHARED 1-D leaf under an expert scope whose length coincidentally
    equals num_experts (hidden == E makes the (N,) bias shape (E,)) must NOT
    be sharded over the expert axis — only stacked (E, ...) leaves are."""
    qc = default_qconfig(8, 8, init_batches=1)
    m = QuantMoE(hidden=4, num_experts=4, qconfig=qc, top_k=2)
    v = m.init(jax.random.key(0), jnp.ones((4, 4)), training=True)
    devs = np.asarray(jax.devices()[:4]).reshape(1, 4)
    emesh = Mesh(devs, axis_names=("data", "expert"))
    sh = moe_sharding(emesh, v, num_experts=4)
    bias_sh = sh["params"]["experts_up"]["bias"]
    kern_sh = sh["params"]["experts_up"]["kernel"]
    assert bias_sh.is_fully_replicated, bias_sh
    assert not kern_sh.is_fully_replicated, kern_sh
    # and the layout actually materializes (the old behavior device_put a
    # (4,) bias one element per device)
    placed = jax.device_put(v, sh)
    jax.block_until_ready(placed)


def test_engine_warns_on_binding_moe_capacity():
    """Serving a QuantMoE LM whose capacity can bind couples co-batched
    requests; the engines must surface that nondeterminism up front."""
    import warnings as _w

    from jaxlsq.models import QuantTransformerLM
    from jaxlsq.serve.decode import DecodeEngine

    qc = default_qconfig(8, 8, init_batches=1)
    lm = QuantTransformerLM(vocab=32, dim=16, depth=1, num_heads=2,
                            qconfig=qc, max_len=12, moe_experts=4,
                            moe_top_k=1, moe_capacity_factor=1.25)  # < 4/1
    toks = jnp.asarray(np.random.RandomState(0).randint(0, 32, (1, 6)))
    v = lm.init(jax.random.key(0), toks, training=False)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        with DecodeEngine(lm, v, max_batch=2, prompt_buckets=(4,)):
            pass
    assert any("capacity can bind" in str(r.message) for r in rec), \
        [str(r.message) for r in rec]
