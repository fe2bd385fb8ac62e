"""Serving-path tests: packing, fused weight-only matmul, conversion, TP.

Oracle chain (SURVEY.md §4 golden-model strategy):
  fake_quant(w) == dequant(pack(w))          — the convert seam is exact
  wo_matmul     == x @ dequant(pack(w))      — the fused epilogue is exact
  serve model   == QAT eval model            — end-to-end conversion parity
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from jaxlsq import QuantSpec, fake_quant
from jaxlsq.models import QuantCNN, QuantMLP, default_qconfig
from jaxlsq.parallel import create_train_state, make_mesh, make_train_step
from jaxlsq.serve import (PackedWeight, convert, dequantize_weight,
                          dynamic_int8_matmul, pack_int4, quantize_weight,
                          shard_converted, unpack_int4, wo_matmul)


def rng(seed=0):
    return np.random.RandomState(seed)


# --------------------------------------------------------------------------
# pack / unpack
# --------------------------------------------------------------------------

def test_int4_pack_roundtrip():
    q = jnp.asarray(rng().randint(-8, 8, size=(16, 6)), jnp.int8)
    for axis in (0, 1):
        qa = q if axis == 0 else q.T
        p = pack_int4(qa, k_axis=0)
        assert p.shape[0] == qa.shape[0] // 2
        np.testing.assert_array_equal(unpack_int4(p, 0), qa)


def test_int4_pack_odd_k_zero_pads():
    """Odd contraction dims zero-pad one row (RGB stem convs)."""
    q = jnp.asarray(rng(60).randint(-8, 8, size=(3, 4)), jnp.int8)
    p = pack_int4(q, k_axis=0)
    assert p.shape == (2, 4)
    u = unpack_int4(p, 0)
    np.testing.assert_array_equal(u[:3], q)
    np.testing.assert_array_equal(u[3], np.zeros(4, np.int8))


@pytest.mark.parametrize("per_channel", [False, True])
@pytest.mark.parametrize("bits", [8, 4])
def test_pack_dequant_matches_fake_quant(per_channel, bits):
    """dequant(pack(w)) == eval-mode fake_quant(w): the serving handoff is
    bit-exact with the QAT numerics (lsq_kernel.h:6-14)."""
    spec = QuantSpec.make(bits, signed=True, symmetric=True,
                          per_channel=per_channel, axis=1)
    w = jnp.asarray(rng(1).randn(32, 24).astype(np.float32))
    c = 24 if per_channel else 1
    scale = jnp.asarray(0.02 + 0.01 * rng(2).rand(c).astype(np.float32))
    shift = jnp.zeros((c,), jnp.float32)
    packed = quantize_weight(w, scale, shift, spec, bits=bits)
    want = fake_quant(w, scale, shift, spec, eval_mode=True)
    np.testing.assert_allclose(dequantize_weight(packed), want, rtol=0, atol=0)


def test_pack_affine_zero_point():
    spec = QuantSpec.make(8, signed=False, symmetric=False, per_channel=False)
    w = jnp.asarray(rng(3).rand(16, 8).astype(np.float32))  # positive weights
    scale = jnp.asarray([0.01], jnp.float32)
    shift = jnp.asarray([-0.05], jnp.float32)
    packed = quantize_weight(w, scale, shift, spec, bits=8)
    # zp = round(clamp(-shift/scale, tmin, tmax)) (observers.py:397-401)
    assert int(packed.zero_point[0]) == 5
    want = fake_quant(w, scale, shift, spec, eval_mode=True)
    np.testing.assert_allclose(dequantize_weight(packed), want, atol=0)


# --------------------------------------------------------------------------
# fused weight-only matmul
# --------------------------------------------------------------------------

@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("per_channel", [False, True])
def test_wo_matmul_matches_dequant_matmul(impl, bits, per_channel):
    spec = QuantSpec.make(bits, signed=True, symmetric=True,
                          per_channel=per_channel, axis=1)
    k, n, m = 64, 48, 24
    w = jnp.asarray(rng(4).randn(k, n).astype(np.float32))
    c = n if per_channel else 1
    scale = jnp.asarray(0.05 + 0.02 * rng(5).rand(c).astype(np.float32))
    shift = jnp.zeros((c,), jnp.float32)
    packed = quantize_weight(w, scale, shift, spec, bits=bits)
    x = jnp.asarray(rng(6).randn(m, k).astype(np.float32))
    want = x @ dequantize_weight(packed)
    got = wo_matmul(x, packed, impl=impl)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_wo_matmul_batched_and_unaligned():
    """Leading batch dims flatten; odd M/N/K exercise the padding path."""
    spec = QuantSpec.make(8, signed=True, symmetric=True)
    k, n = 50, 30
    w = jnp.asarray(rng(7).randn(k, n).astype(np.float32))
    packed = quantize_weight(w, jnp.asarray([0.03]), jnp.zeros((1,)), spec,
                             bits=8)
    x = jnp.asarray(rng(8).randn(3, 5, k).astype(np.float32))
    want = x @ dequantize_weight(packed)
    for impl in ("xla", "pallas"):
        got = wo_matmul(x, packed, impl=impl)
        assert got.shape == (3, 5, n)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_wo_matmul_affine_zp_correction():
    """Nonzero weight zero-point exercises the in-kernel zp-subtract."""
    spec = QuantSpec.make(8, signed=False, symmetric=False)
    k, n = 32, 16
    w = jnp.asarray(0.5 + rng(9).rand(k, n).astype(np.float32))
    packed = quantize_weight(w, jnp.asarray([0.01]),
                             jnp.asarray([-0.2]), spec, bits=8)
    assert int(packed.zero_point[0]) != 0
    x = jnp.asarray(rng(10).randn(8, k).astype(np.float32))
    want = x @ dequantize_weight(packed)
    for impl in ("xla", "pallas"):
        np.testing.assert_allclose(wo_matmul(x, packed, impl=impl), want,
                                   rtol=1e-5, atol=1e-5)


def test_dynamic_int8_matmul_close():
    spec = QuantSpec.make(8, signed=True, symmetric=True, per_channel=True,
                          axis=1)
    k, n, m = 128, 64, 16
    w = 0.1 * jnp.asarray(rng(11).randn(k, n).astype(np.float32))
    scale = jnp.asarray(0.002 + 0.001 * rng(12).rand(n).astype(np.float32))
    packed = quantize_weight(w, scale, jnp.zeros((n,)), spec, bits=8)
    x = jnp.asarray(rng(13).randn(m, k).astype(np.float32))
    want = x @ dequantize_weight(packed)
    got = dynamic_int8_matmul(x, packed)
    # activation quant noise: per-tensor int8 ⇒ ~1e-2 relative error budget
    err = float(jnp.max(jnp.abs(got - want)) / (jnp.max(jnp.abs(want)) + 1e-9))
    assert err < 0.02


def test_dynamic_int8_requires_int8_weights():
    spec = QuantSpec.make(4, signed=True, symmetric=True)
    w = jnp.asarray(rng(14).randn(8, 8).astype(np.float32))
    packed = quantize_weight(w, jnp.asarray([0.1]), jnp.zeros((1,)), spec,
                             bits=4)
    with pytest.raises(ValueError):
        dynamic_int8_matmul(jnp.ones((2, 8)), packed)


# --------------------------------------------------------------------------
# end-to-end conversion
# --------------------------------------------------------------------------

def _trained_mlp(weight_bits=8, per_channel=True, steps=6):
    qc = default_qconfig(weight_bits, 8, per_channel_weights=per_channel,
                         init_batches=2)
    model = QuantMLP(features=(32, 10), qconfig=qc)
    tx = optax.sgd(1e-2)
    r = rng(20)
    x0 = jnp.asarray(r.randn(8, 16).astype(np.float32))
    state = create_train_state(model, tx, x0)
    step = make_train_step(model, tx)
    for i in range(steps):
        batch = {"input": jnp.asarray(r.randn(8, 16).astype(np.float32)),
                 "label": jnp.asarray(r.randint(0, 10, size=8))}
        state, _ = step(state, batch)
    return model, qc, state


@pytest.mark.parametrize("weight_bits", [8, 4])
def test_convert_e2e_matches_eval_fake_quant(weight_bits):
    """Converted serve model (static act quant) == QAT model in eval mode.

    This is the parity contract of torch.quantization.convert: serving
    numerics == fake-quant numerics once observers are frozen (SURVEY.md §3.4).
    """
    model, qc, state = _trained_mlp(weight_bits=weight_bits)
    x = jnp.asarray(rng(21).randn(4, 16).astype(np.float32))

    # QAT eval reference: fake-quant everywhere, frozen state
    want, _ = model.apply({**state.params, **state.model_state}, x,
                          training=False,
                          mutable=["quant_state", "qparams"])

    serve_vars = convert({**state.params, **state.model_state}, qc)
    assert "qparams" not in serve_vars and "quant_state" not in serve_vars
    serve_model = dataclasses.replace(
        model, qconfig=qc.for_serving(act_mode="static", impl="xla"))
    got = serve_model.apply(serve_vars, x, training=False)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_convert_weight_only_close():
    """Weight-only serving (float activations) stays close to the float-act
    QAT eval output — only the act-quant noise differs."""
    model, qc, state = _trained_mlp(weight_bits=8)
    x = jnp.asarray(rng(22).randn(4, 16).astype(np.float32))
    want, _ = model.apply({**state.params, **state.model_state}, x,
                          training=False,
                          mutable=["quant_state", "qparams"])
    serve_vars = convert({**state.params, **state.model_state}, qc)
    serve_model = dataclasses.replace(
        model, qconfig=qc.for_serving(act_mode="none", impl="xla"))
    got = serve_model.apply(serve_vars, x, training=False)
    scale = float(jnp.max(jnp.abs(want)) + 1e-9)
    assert float(jnp.max(jnp.abs(got - want))) / scale < 0.1


def test_convert_structure_matches_serve_init():
    """convert() output structure == serve-mode model.init structure, so
    checkpoints round-trip through either path."""
    model, qc, state = _trained_mlp(weight_bits=8, steps=2)
    serve_vars = convert({**state.params, **state.model_state}, qc)
    serve_model = dataclasses.replace(model, qconfig=qc.for_serving("static"))
    tmpl = serve_model.init(jax.random.key(0), jnp.zeros((1, 16)),
                            training=False)
    t1 = jax.tree.structure(serve_vars)
    t2 = jax.tree.structure(jax.device_get(tmpl))
    assert t1 == t2
    for a, b in zip(jax.tree.leaves(serve_vars), jax.tree.leaves(tmpl)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_convert_cnn_runs():
    qc = default_qconfig(8, 8, per_channel_weights=True, init_batches=1)
    model = QuantCNN(num_classes=4, qconfig=qc, widths=(8, 8))
    tx = optax.sgd(1e-2)
    r = rng(23)
    x0 = jnp.asarray(r.randn(2, 16, 16, 3).astype(np.float32))
    state = create_train_state(model, tx, x0)
    step = make_train_step(model, tx)
    for _ in range(3):
        batch = {"input": jnp.asarray(r.randn(2, 16, 16, 3).astype(np.float32)),
                 "label": jnp.asarray(r.randint(0, 4, size=2))}
        state, _ = step(state, batch)
    want, _ = model.apply({**state.params, **state.model_state}, x0,
                          training=False,
                          mutable=["quant_state", "qparams", "batch_stats"])
    # non-quant collections pass through untouched
    probe = convert({**state.params, **state.model_state,
                     "batch_stats": {"x": jnp.ones(3)}}, qc)
    assert "batch_stats" in probe
    serve_vars = convert({**state.params, **state.model_state}, qc)
    serve_model = dataclasses.replace(model,
                                      qconfig=qc.for_serving("static"))
    got = serve_model.apply(serve_vars, x0, training=False)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------------
# tensor-parallel serving
# --------------------------------------------------------------------------

def test_tp_sharded_wo_matmul():
    """Column-parallel packed weight under jit == unsharded result; XLA
    inserts the collectives (SURVEY.md §5 'Distributed communication')."""
    mesh = make_mesh(data=2, model=4)
    spec = QuantSpec.make(8, signed=True, symmetric=True, per_channel=True,
                          axis=1)
    k, n = 64, 32
    w = jnp.asarray(rng(30).randn(k, n).astype(np.float32))
    scale = jnp.asarray(0.05 + 0.01 * rng(31).rand(n).astype(np.float32))
    packed = quantize_weight(w, scale, jnp.zeros((n,)), spec, bits=8)
    x = jnp.asarray(rng(32).randn(16, k).astype(np.float32))
    want = wo_matmul(x, packed, impl="xla")

    with mesh:
        sharded = jax.tree.map(
            lambda l: l, packed,
            is_leaf=lambda l: isinstance(l, PackedWeight))
        sharded = shard_converted({"quantized": {"l": {"kernel": packed}}},
                                  mesh)["quantized"]["l"]["kernel"]
        got = jax.jit(lambda a, p: wo_matmul(a, p, impl="xla"))(x, sharded)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_shard_converted_full_model_tree():
    model, qc, state = _trained_mlp(weight_bits=8, steps=2)
    serve_vars = convert({**state.params, **state.model_state}, qc)
    mesh = make_mesh(data=2, model=4)
    sharded = shard_converted(serve_vars, mesh)
    x = jnp.asarray(rng(33).randn(4, 16).astype(np.float32))
    serve_model = dataclasses.replace(model, qconfig=qc.for_serving("static"))
    want = serve_model.apply(serve_vars, x, training=False)
    with mesh:
        got = jax.jit(
            lambda v, a: serve_model.apply(v, a, training=False))(sharded, x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_wo_matmul_bf16_activations():
    """bf16 activations (the serving dtype) through both impls; f32 accum."""
    spec = QuantSpec.make(8, signed=True, symmetric=True, per_channel=True,
                          axis=1)
    k, n = 64, 32
    w = jnp.asarray(rng(40).randn(k, n).astype(np.float32))
    scale = jnp.asarray(0.03 + 0.01 * rng(41).rand(n).astype(np.float32))
    packed = quantize_weight(w, scale, jnp.zeros((n,)), spec, bits=8)
    x = jnp.asarray(rng(42).randn(8, k), dtype=jnp.bfloat16)
    want = (x.astype(jnp.float32) @ dequantize_weight(packed)).astype(
        jnp.bfloat16)
    for impl in ("xla", "pallas"):
        got = wo_matmul(x, packed, impl=impl)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=2e-2, atol=2e-2)


def test_conv_int4_serving():
    """4-bit conv weights through pack/unpack (k_axis = the HWIO 'in' axis)
    and the serve-mode QuantConv."""
    from jaxlsq.models import QuantCNN

    qc = default_qconfig(4, 8, per_channel_weights=True, init_batches=1)
    model = QuantCNN(num_classes=4, qconfig=qc, widths=(8,))
    r = rng(50)
    x0 = jnp.asarray(r.randn(2, 8, 8, 3).astype(np.float32))
    v = model.init(jax.random.key(0), x0, training=False)
    want, _ = model.apply(v, x0, training=False,
                          mutable=["quant_state", "qparams"])
    sv = convert(v, qc)
    p = sv["quantized"]["conv_0"]["kernel"]
    assert p.bits == 4
    assert p.data.shape == (3, 3, 3 // 2 + 1, 8) or p.data.shape[2] == 1 \
        or p.data.shape[2] * 2 == p.orig_shape[2]
    sm = dataclasses.replace(model, qconfig=qc.for_serving("static", "xla"))
    got = sm.apply(sv, x0, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_negative_learned_act_scale_converts_correctly():
    """A learned activation scale that drifted negative must freeze to its
    effective magnitude |s| (the QAT kernels clamp s = max(|s|, eps),
    lsq_kernel.h:157) — not to eps."""
    from jaxlsq.serve.convert import _act_qparams

    spec = QuantSpec.make(8, signed=False)
    qp = {"scale": jnp.asarray([-0.05]), "shift": jnp.asarray([-0.1])}
    scale, zp = _act_qparams(qp, spec)
    np.testing.assert_allclose(float(scale[0]), 0.05)
    assert int(zp[0]) == 2  # round(0.1 / 0.05)


def test_serving_bits_unsigned_4bit_falls_back_to_int8():
    """An unsigned 4-bit range [0,15] has 16 levels but does not fit the
    signed int4 carrier — serving_bits must pick int8, and convert must
    succeed end-to-end."""
    from jaxlsq.serve import serving_bits

    uspec = QuantSpec.make(4, signed=False, symmetric=True)
    assert serving_bits(uspec) == 8
    sspec = QuantSpec.make(4, signed=True, symmetric=True)
    assert serving_bits(sspec) == 4
    w = jnp.asarray(rng(70).rand(8, 4).astype(np.float32))
    packed = quantize_weight(w, jnp.asarray([0.01]), jnp.zeros((1,)), uspec,
                             bits=serving_bits(uspec))
    assert packed.bits == 8
    np.testing.assert_allclose(
        dequantize_weight(packed),
        fake_quant(w, jnp.asarray([0.01]), jnp.zeros((1,)), uspec,
                   eval_mode=True), atol=0)


def test_shard_converted_embedding_replicates():
    """Per-row (axis 0) embedding tables replicate under TP even when the
    vocab is not divisible by the mesh axis (sharding rows would break
    gathers)."""
    import dataclasses as _dc

    from jaxlsq.models import QuantEmbed, default_qconfig as _dq
    from jaxlsq.serve import shard_converted

    qc = _dq(8, 8, per_channel_weights=True, init_batches=0)
    emb = QuantEmbed(37, 16, qc)  # vocab 37: indivisible by any axis size
    toks = jnp.asarray([[0, 36]])
    v = emb.init(jax.random.key(0), toks, training=False)
    sv = convert(v, qc)
    mesh = make_mesh(data=2, model=4)
    sharded = shard_converted(sv, mesh)
    p = sharded["quantized"]["embedding"]
    assert p.data.shape == (37, 16)
    sm = _dc.replace(emb, qconfig=qc.for_serving("static"))
    with mesh:
        got = jax.jit(lambda vv, t: sm.apply(vv, t, training=False))(
            sharded, toks)
    want = sm.apply(sv, toks, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)


def test_conv_dynamic_act_mode_rejected():
    from jaxlsq.models import QuantCNN

    qc = default_qconfig(8, 8, init_batches=0)
    model = QuantCNN(num_classes=4, qconfig=qc, widths=(8,))
    x0 = jnp.zeros((1, 8, 8, 3), jnp.float32)
    v = model.init(jax.random.key(0), x0, training=False)
    sv = convert(v, qc)
    sm = dataclasses.replace(model, qconfig=qc.for_serving("dynamic"))
    with pytest.raises(ValueError, match="dynamic"):
        sm.apply(sv, x0, training=False)


def test_static_int8_matmul_matches_float_simulation():
    """int8*int8 with the integer dequant epilogue == the float-simulated
    static path (quantize x, float matmul) to f32 rounding — the i32
    accumulator is exact."""
    from jaxlsq.serve import static_int8_matmul
    from jaxlsq.models.layers import _static_act_quant

    wspec = QuantSpec.make(8, signed=True, symmetric=True, per_channel=True,
                           axis=1)
    aspec = QuantSpec.make(8, signed=False)  # affine acts, nonzero zp
    k, n, m = 96, 48, 16
    w = jnp.asarray(rng(80).randn(k, n).astype(np.float32))
    sw = jnp.asarray(0.02 + 0.01 * rng(81).rand(n).astype(np.float32))
    packed = quantize_weight(w, sw, jnp.zeros((n,)), wspec, bits=8)
    x = jnp.asarray(rng(82).randn(m, k).astype(np.float32))
    ascale = jnp.asarray([0.03], jnp.float32)
    azp = jnp.asarray([120], jnp.int32)

    got = static_int8_matmul(x, packed, ascale, azp,
                             aspec.quant_min, aspec.quant_max)
    x_sim = _static_act_quant(x, ascale, azp, aspec)
    want = x_sim @ dequantize_weight(packed)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_static_int8_with_weight_zero_point():
    """Affine weights too: all four epilogue correction terms live."""
    from jaxlsq.serve import static_int8_matmul
    from jaxlsq.models.layers import _static_act_quant

    wspec = QuantSpec.make(8, signed=False, symmetric=False)
    aspec = QuantSpec.make(8, signed=False)
    k, n, m = 64, 32, 8
    w = jnp.asarray(0.3 + rng(83).rand(k, n).astype(np.float32))
    packed = quantize_weight(w, jnp.asarray([0.01]), jnp.asarray([-0.15]),
                             wspec, bits=8)
    assert int(packed.zero_point[0]) != 0
    x = jnp.asarray(rng(84).randn(m, k).astype(np.float32))
    ascale, azp = jnp.asarray([0.05]), jnp.asarray([128], jnp.int32)
    got = static_int8_matmul(x, packed, ascale, azp,
                             aspec.quant_min, aspec.quant_max)
    want = _static_act_quant(x, ascale, azp, aspec) @ dequantize_weight(packed)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_serve_model_static_int8_close_to_static():
    """Model-level act_mode='static_int8' tracks the float-simulated 'static'
    path (identical quant decisions; only f32-vs-i32 accumulation differs)."""
    model, qc, state = _trained_mlp(weight_bits=8)
    x = jnp.asarray(rng(85).randn(4, 16).astype(np.float32))
    sv = convert({**state.params, **state.model_state}, qc)
    sm_f = dataclasses.replace(model, qconfig=qc.for_serving("static", "xla"))
    sm_i = dataclasses.replace(model,
                               qconfig=qc.for_serving("static_int8", "xla"))
    want = sm_f.apply(sv, x, training=False)
    got = sm_i.apply(sv, x, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_quantize_weight_default_bits_carrier_fit():
    """ADVICE r1: default bits follows the signed-int4 carrier fit (like
    convert.serving_bits) — unsigned 4-bit [0,15] falls back to int8, and
    signed [-8,7] packs to int4, without passing bits explicitly."""
    w = jnp.asarray(np.random.default_rng(0).standard_normal((8, 6)), jnp.float32)
    s = jnp.asarray([0.1], jnp.float32)
    z = jnp.asarray([0.0], jnp.float32)
    u4 = QuantSpec(quant_min=0, quant_max=15)
    p = quantize_weight(w, s, z, u4)  # must not raise
    assert p.bits == 8
    s4 = QuantSpec(quant_min=-8, quant_max=7, symmetric=True)
    assert quantize_weight(w, s, z, s4).bits == 4


def test_auto_impl_detects_tp_sharded_weight():
    """ADVICE r1: impl='auto' must not route a TP-sharded (non-replicated)
    weight into the Pallas kernel (no SPMD rule -> forced all-gather)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from jaxlsq.serve.matmul import _is_cross_device_sharded

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >=2 devices")
    mesh = Mesh(np.array(devs[:2]), ("model",))
    x = jnp.zeros((4, 256), jnp.int8)
    sharded = jax.device_put(x, NamedSharding(mesh, P(None, "model")))
    replicated = jax.device_put(x, NamedSharding(mesh, P(None, None)))
    assert _is_cross_device_sharded(sharded)
    assert not _is_cross_device_sharded(replicated)
    assert not _is_cross_device_sharded(jnp.zeros((4, 4)))


def test_serve_mode_requires_weight_quantizer():
    """ADVICE r1: a weight-unquantized QConfig in serve mode raises a clear
    ValueError instead of an AttributeError on NoneType."""
    from jaxlsq.models.layers import QuantDense

    qc = dataclasses.replace(default_qconfig(8, 8).for_serving(), weight=None)
    layer = QuantDense(features=4, qconfig=qc)
    with pytest.raises(ValueError, match="weight quantizer"):
        layer.init(jax.random.PRNGKey(0), jnp.zeros((2, 8)))


def test_static_int8_conv_matches_float_simulated():
    """static_int8_conv (integer conv + dequant epilogue) must agree with the
    float-simulated static path to f32 rounding, including SAME padding
    (integer zp => padded positions contribute exactly 0) and strides."""
    from jaxlsq.serve.matmul import static_int8_conv
    from jaxlsq.serve.pack import dequantize_weight

    r = np.random.RandomState(0)
    wspec = QuantSpec.make(8, signed=True, symmetric=True, per_channel=True,
                           axis=3)
    kh, kw, cin, cout = 3, 3, 8, 16
    w = jnp.asarray(0.1 * r.randn(kh, kw, cin, cout).astype(np.float32))
    wscale = jnp.asarray((0.002 + 0.001 * r.rand(cout)).astype(np.float32))
    packed = quantize_weight(w, wscale, jnp.zeros((cout,)), wspec, bits=8)

    aspec = QuantSpec.make(8, signed=False)  # quint8-style [0, 255-ish]
    x = jnp.asarray(r.randn(2, 10, 10, cin).astype(np.float32))
    ascale = jnp.asarray([0.05], jnp.float32)
    azp = jnp.asarray([7], jnp.int32)

    for strides, padding in [((1, 1), "SAME"), ((2, 2), "SAME"),
                             ((1, 1), "VALID")]:
        got = static_int8_conv(x, packed, ascale, azp, aspec.quant_min,
                               aspec.quant_max, strides=strides,
                               padding=padding)
        # float-simulated reference: fake-quant acts, conv vs dequant weights
        from jaxlsq.models.layers import _static_act_quant

        xs = _static_act_quant(x, ascale, azp, aspec)
        want = jax.lax.conv_general_dilated(
            xs, dequantize_weight(packed), window_strides=strides,
            padding=padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_static_int8_conv_grouped():
    """Depthwise/grouped conv epilogue: per-output-channel wsum covers only
    that group's input channels."""
    from jaxlsq.serve.matmul import static_int8_conv
    from jaxlsq.serve.pack import dequantize_weight
    from jaxlsq.models.layers import _static_act_quant

    r = np.random.RandomState(1)
    wspec = QuantSpec.make(8, signed=True, symmetric=True, per_channel=True,
                           axis=3)
    cin = 8
    w = jnp.asarray(0.1 * r.randn(3, 3, 1, cin).astype(np.float32))
    wscale = jnp.asarray((0.002 + 0.001 * r.rand(cin)).astype(np.float32))
    packed = quantize_weight(w, wscale, jnp.zeros((cin,)), wspec, bits=8)
    aspec = QuantSpec.make(8, signed=False)
    x = jnp.asarray(r.randn(2, 6, 6, cin).astype(np.float32))
    ascale, azp = jnp.asarray([0.04], jnp.float32), jnp.asarray([3], jnp.int32)
    got = static_int8_conv(x, packed, ascale, azp, aspec.quant_min,
                           aspec.quant_max, feature_group_count=cin)
    xs = _static_act_quant(x, ascale, azp, aspec)
    want = jax.lax.conv_general_dilated(
        xs, dequantize_weight(packed), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=cin,
        preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_quant_cnn_static_int8_serving_end_to_end():
    """QuantCNN converted with act_mode='static_int8': conv layers take the
    integer conv path and logits match the float-simulated static path."""
    qc = default_qconfig(8, 8, per_channel_weights=True, init_batches=1)
    model = QuantCNN(num_classes=4, qconfig=qc, widths=(8, 16))
    r = np.random.RandomState(2)
    x = jnp.asarray(r.randn(2, 16, 16, 3).astype(np.float32))
    variables = model.init(jax.random.key(0), x, training=False)
    sv = convert(variables, qc)
    m_int = dataclasses.replace(model,
                                qconfig=qc.for_serving("static_int8", "xla"))
    m_sim = dataclasses.replace(model, qconfig=qc.for_serving("static", "xla"))
    got = m_int.apply(sv, x, training=False)
    want = m_sim.apply(sv, x, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)


def test_static_int8_conv_affine_weights():
    """ADVICE r2: affine weights (zero_point != 0) previously required the
    float-simulated path (and were SILENTLY mis-handled when zp was a tracer
    under jit).  Now the epilogue's ones-kernel window-sum conv makes the
    integer path exact for any PackedWeight — checked eagerly AND under jit
    (traced zp), with SAME padding and strides."""
    from jaxlsq.serve.matmul import static_int8_conv
    from jaxlsq.serve.pack import dequantize_weight
    from jaxlsq.models.layers import _static_act_quant

    r = np.random.RandomState(3)
    wspec = QuantSpec.make(8, signed=True, symmetric=False, per_channel=True,
                           axis=3)
    kh, kw, cin, cout = 3, 3, 6, 12
    w = jnp.asarray((0.1 * r.randn(kh, kw, cin, cout) + 0.05)
                    .astype(np.float32))
    wscale = jnp.asarray((0.002 + 0.001 * r.rand(cout)).astype(np.float32))
    wshift = jnp.asarray((0.01 * r.randn(cout)).astype(np.float32))
    packed = quantize_weight(w, wscale, wshift, wspec, bits=8)
    assert bool(jnp.any(packed.zero_point != 0))  # the affine case for real

    aspec = QuantSpec.make(8, signed=False)
    x = jnp.asarray(r.randn(2, 9, 9, cin).astype(np.float32))
    ascale = jnp.asarray([0.05], jnp.float32)
    azp = jnp.asarray([5], jnp.int32)

    xs = _static_act_quant(x, ascale, azp, aspec)
    for strides, padding in [((1, 1), "SAME"), ((2, 2), "SAME"),
                             ((1, 1), "VALID")]:
        want = jax.lax.conv_general_dilated(
            xs, dequantize_weight(packed), window_strides=strides,
            padding=padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        got = static_int8_conv(x, packed, ascale, azp, aspec.quant_min,
                               aspec.quant_max, strides=strides,
                               padding=padding)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
        # under jit, zero_point is a tracer: must take the affine epilogue
        # (not silently assume symmetry) and produce the same result
        got_jit = jax.jit(
            lambda x, p: static_int8_conv(
                x, p, ascale, azp, aspec.quant_min, aspec.quant_max,
                strides=strides, padding=padding))(x, packed)
        np.testing.assert_allclose(np.asarray(got_jit), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_static_int8_conv_affine_grouped():
    """Affine + depthwise: the window-sum conv must sum only the group's own
    input channels (one ones-kernel output channel per group)."""
    from jaxlsq.serve.matmul import static_int8_conv
    from jaxlsq.serve.pack import dequantize_weight
    from jaxlsq.models.layers import _static_act_quant

    r = np.random.RandomState(4)
    wspec = QuantSpec.make(8, signed=True, symmetric=False, per_channel=True,
                           axis=3)
    cin = 8
    w = jnp.asarray((0.1 * r.randn(3, 3, 1, cin) + 0.03).astype(np.float32))
    wscale = jnp.asarray((0.002 + 0.001 * r.rand(cin)).astype(np.float32))
    wshift = jnp.asarray((0.01 * r.randn(cin)).astype(np.float32))
    packed = quantize_weight(w, wscale, wshift, wspec, bits=8)
    assert bool(jnp.any(packed.zero_point != 0))
    aspec = QuantSpec.make(8, signed=False)
    x = jnp.asarray(r.randn(2, 6, 6, cin).astype(np.float32))
    ascale, azp = jnp.asarray([0.04], jnp.float32), jnp.asarray([3], jnp.int32)
    got = static_int8_conv(x, packed, ascale, azp, aspec.quant_min,
                           aspec.quant_max, feature_group_count=cin)
    xs = _static_act_quant(x, ascale, azp, aspec)
    want = jax.lax.conv_general_dilated(
        xs, dequantize_weight(packed), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=cin,
        preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
