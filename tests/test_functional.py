"""Tests of the fake_quant/lsq custom_vjp functional API (jaxlsq/ops/functional.py).

Gradient tests per SURVEY.md §4: custom_vjp vs finite differences away from
rounding boundaries; explicit tests of the three dS branches and the strict
inequality mask (lsq_kernel.h:109,118-121).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jaxlsq import QuantSpec, fake_quant, lsq
from jaxlsq.core import golden_backward, golden_forward


def _inputs(spec, shape=(8, 16), seed=1):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    c = shape[spec.axis] if spec.per_channel else 1
    scale = jnp.asarray(0.1 + 0.05 * rng.rand(c).astype(np.float32))
    shift = jnp.asarray(
        np.zeros(c, np.float32) if spec.symmetric
        else (0.1 * rng.randn(c)).astype(np.float32))
    return x, scale, shift


@pytest.mark.parametrize("spec", [
    QuantSpec(quant_min=0, quant_max=255),
    QuantSpec(quant_min=-128, quant_max=127, symmetric=True),
    QuantSpec(quant_min=0, quant_max=255, per_channel=True, axis=1),
])
def test_vjp_matches_golden_backward(spec):
    x, scale, shift = _inputs(spec)
    g = jnp.asarray(np.random.RandomState(2).randn(*x.shape).astype(np.float32))

    out, vjp = jax.vjp(lambda a, s, b: fake_quant(a, s, b, spec), x, scale, shift)
    dX, dS, dB = vjp(g)
    eX, eS, eB = golden_backward(g, x, scale, shift, spec)

    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(golden_forward(x, scale, shift, spec)))
    np.testing.assert_allclose(np.asarray(dX), np.asarray(eX), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dS), np.asarray(eS), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dB), np.asarray(eB), rtol=1e-5, atol=1e-6)


def test_jit_and_grad_compose():
    spec = QuantSpec(quant_min=0, quant_max=255)
    x, scale, shift = _inputs(spec)

    @jax.jit
    def loss(x, s, b):
        return jnp.sum(fake_quant(x, s, b, spec) ** 2)

    val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, scale, shift)
    assert np.isfinite(float(val))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in grads)


def test_ste_dx_finite_difference():
    """dX is the STE mask: for in-range points away from rounding boundaries,
    d out/d x ≈ 1; for saturated points, 0."""
    spec = QuantSpec(quant_min=0, quant_max=15, use_grad_scaling=False)
    scale = jnp.array([0.25])
    shift = jnp.array([0.0])
    # x/s = 1.3 → in-range and away from .5; x/s = 40 → saturated high
    x = jnp.array([[0.325, 10.0]])
    _, vjp = jax.vjp(lambda a: fake_quant(a, scale, shift, spec), x)
    (dX,) = vjp(jnp.ones_like(x))
    np.testing.assert_array_equal(np.asarray(dX)[0], [1.0, 0.0])


def test_ds_three_branches():
    """dS branches (lsq_kernel.h:118-121): in-range → g*(xfq-x)/s;
    saturated-low → g*(qmin-zp); saturated-high → g*(qmax-zp)."""
    spec = QuantSpec(quant_min=0, quant_max=15, use_grad_scaling=False)
    s, b = 0.5, 0.0
    scale, shift = jnp.array([s]), jnp.array([b])
    zp = 0.0
    # in-range: x=1.3 → xq=2.6, xfq=(3-0)*0.5=1.5, dS=(1.5-1.3)/0.5=0.4
    # sat-low: x=-2 → xq clamp to 0 → dS = qmin - zp = 0
    # sat-high: x=100 → dS = qmax - zp = 15
    x = jnp.array([[1.3, -2.0, 100.0]])
    _, vjp = jax.vjp(lambda sc: fake_quant(x, sc, shift, spec), scale)
    (dS,) = vjp(jnp.ones_like(x))
    expect = (1.5 - 1.3) / s + (0.0 - zp) + (15.0 - zp)
    np.testing.assert_allclose(float(dS[0]), expect, rtol=1e-5)


def test_db_only_outside_range():
    """dB = (!mask)*g for affine (lsq_kernel.h:118); zero when symmetric."""
    spec = QuantSpec(quant_min=0, quant_max=15, use_grad_scaling=False)
    scale, shift = jnp.array([0.5]), jnp.array([0.0])
    x = jnp.array([[1.3, -2.0, 100.0]])  # in, low, high
    _, vjp = jax.vjp(lambda b: fake_quant(x, scale, b, spec), shift)
    (dB,) = vjp(jnp.ones_like(x))
    np.testing.assert_allclose(float(dB[0]), 2.0, rtol=1e-6)  # two saturated elems

    sym = QuantSpec(quant_min=-8, quant_max=7, symmetric=True, use_grad_scaling=False)
    _, vjp = jax.vjp(lambda b: fake_quant(x, scale, b, sym), shift)
    (dB,) = vjp(jnp.ones_like(x))
    assert float(dB[0]) == 0.0


def test_strict_inequality_mask():
    """mask uses strict inequalities on the UNROUNDED xq (lsq_kernel.h:108-109):
    a point exactly at qmin/qmax after clamping is masked out."""
    spec = QuantSpec(quant_min=0, quant_max=15, use_grad_scaling=False)
    scale, shift = jnp.array([1.0]), jnp.array([0.0])
    x = jnp.array([[0.0, 15.0, 14.999, 0.001]])
    _, vjp = jax.vjp(lambda a: fake_quant(a, scale, shift, spec), x)
    (dX,) = vjp(jnp.ones_like(x))
    np.testing.assert_array_equal(np.asarray(dX)[0], [0.0, 0.0, 1.0, 1.0])


def test_eval_mode_no_param_grads():
    spec = QuantSpec(quant_min=0, quant_max=255)
    x, scale, shift = _inputs(spec)
    out, vjp = jax.vjp(
        lambda a, s, b: fake_quant(a, s, b, spec, eval_mode=True), x, scale, shift)
    dX, dS, dB = vjp(jnp.ones_like(x))
    # forward identical to full mode (lsq_kernel.h: eval changes backward only)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(fake_quant(x, scale, shift, spec)))
    assert float(jnp.sum(jnp.abs(dS))) == 0.0
    assert float(jnp.sum(jnp.abs(dB))) == 0.0
    assert float(jnp.sum(jnp.abs(dX))) > 0.0


def test_init_mode_identity_forward_and_param_descent():
    """init_mode: forward is identity; dX passes through; scale/shift grads
    descend ||x_fq - x||² (lsq_kernel.h:112-116)."""
    spec = QuantSpec(quant_min=0, quant_max=255, use_grad_scaling=False)
    x, scale, shift = _inputs(spec)
    out, vjp = jax.vjp(
        lambda a, s, b: fake_quant(a, s, b, spec, init_mode=True), x, scale, shift)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    g = jnp.asarray(np.random.RandomState(3).randn(*x.shape).astype(np.float32))
    dX, dS, dB = vjp(g)
    np.testing.assert_array_equal(np.asarray(dX), np.asarray(g))
    # Gradient descent on scale with this grad should reduce ||x_fq - x||².
    def mse(s):
        return float(jnp.mean((golden_forward(x, s, shift, spec) - x) ** 2))
    step = 1e-3
    assert mse(scale - step * dS) <= mse(scale) + 1e-9


def test_reference_signature_lsq():
    """The reference-compatible entry point with its defaults (functional.py:8-19)."""
    x = jnp.asarray(np.random.RandomState(0).rand(4, 4).astype(np.float32))
    out = lsq(x, jnp.array([0.01]), jnp.array([0.0]))
    # default quint8 affine 0..255
    spec = QuantSpec(quant_min=0, quant_max=255)
    np.testing.assert_array_equal(
        np.asarray(out),
        np.asarray(golden_forward(x, jnp.array([0.01]), jnp.array([0.0]), spec)))
    with pytest.raises(AssertionError):
        # symmetric range must cover zero — mirrors functional.py:90-91
        try:
            lsq(x, jnp.array([0.01]), jnp.array([0.0]),
                quant_min=1, quant_max=10, is_affine=False)
        except ValueError as e:
            raise AssertionError(str(e))


def test_qparam_shape_contract():
    spec = QuantSpec(quant_min=0, quant_max=255)
    x = jnp.ones((2, 3))
    with pytest.raises(ValueError):
        fake_quant(x, jnp.ones(()), jnp.zeros((1,)), spec)  # 0-D scale rejected
    # per-channel broadcast of size-1 qparams (lsq.cpp:122-129)
    pc = QuantSpec(quant_min=0, quant_max=255, per_channel=True, axis=1)
    out = fake_quant(x, jnp.array([0.1]), jnp.zeros((1,)), pc)
    assert out.shape == x.shape


def test_bf16_input():
    """TPU-native dtype: bf16 inputs run and stay finite (reference CUDA supports
    fp16 via AT_DISPATCH...AND_HALF, lsq_cuda.cu:45; we support bf16)."""
    spec = QuantSpec(quant_min=0, quant_max=255)
    x = jnp.asarray(np.random.RandomState(0).randn(8, 8), dtype=jnp.bfloat16)
    out = fake_quant(x, jnp.array([0.1]), jnp.array([0.0]), spec)
    assert out.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))


def test_remat_compatibility():
    """jax.checkpoint (remat) through the custom-vjp fake quantizer: grads
    through a rematerialized block equal the plain ones for both impls —
    the memory/FLOPs trade big-model training relies on works out of the box."""
    spec = QuantSpec.make(8, signed=False)
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(16, 32).astype(np.float32))
    w = jnp.asarray(r.randn(32, 8).astype(np.float32))
    s, b = jnp.asarray([0.1]), jnp.asarray([0.02])

    def block(xx, ww, ss, bb, impl):
        return jnp.tanh(fake_quant(xx, ss, bb, spec, impl=impl) @ ww)

    for impl in ("reference", "pallas"):
        g1 = jax.grad(lambda w_, s_, b_: jnp.sum(block(x, w_, s_, b_, impl)),
                      argnums=(0, 1, 2))(w, s, b)
        g2 = jax.grad(
            lambda w_, s_, b_: jnp.sum(jax.checkpoint(
                lambda a, ww, ss, bb: block(a, ww, ss, bb, impl))(
                    x, w_, s_, b_)), argnums=(0, 1, 2))(w, s, b)
        for a, c in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-6, atol=1e-7)


def test_vmap_batching_rule():
    """fake_quant composes with jax.vmap (ensembles / per-example qparams)
    for both impls — SURVEY.md §7 step 2 'batch-rule compatibility'."""
    spec = QuantSpec.make(8, signed=False)
    r = np.random.RandomState(3)
    x = jnp.asarray(r.randn(4, 16, 32).astype(np.float32))
    s = jnp.asarray(0.05 + 0.01 * r.rand(4, 1).astype(np.float32))
    b = jnp.asarray(0.01 * r.randn(4, 1).astype(np.float32))
    for impl in ("reference", "pallas"):
        f = jax.vmap(lambda xx, ss, bb: fake_quant(xx, ss, bb, spec,
                                                   impl=impl))
        out = f(x, s, b)
        want = jnp.stack([fake_quant(x[i], s[i], b[i], spec, impl=impl)
                          for i in range(4)])
        np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
        g = jax.grad(lambda ss: jnp.sum(f(x, ss, b)))(s)
        assert g.shape == (4, 1) and np.all(np.isfinite(np.asarray(g)))


def test_fp16_input():
    """fp16 inputs (reference CUDA dispatches half, lsq_cuda.cu:45): run,
    keep dtype, stay finite, and agree with the f32 path to half precision —
    both kernel impls (VERDICT r1 next-#9)."""
    spec = QuantSpec(quant_min=0, quant_max=255)
    r = np.random.RandomState(0)
    x16 = jnp.asarray(r.randn(16, 64), dtype=jnp.float16)
    s, b = jnp.array([0.1]), jnp.array([0.05])
    for impl in ("reference", "pallas"):
        out = fake_quant(x16, s, b, spec, impl=impl)
        assert out.dtype == jnp.float16
        want = fake_quant(x16.astype(jnp.float32), s, b, spec, impl="reference")
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(want), rtol=2e-3, atol=2e-3)


def test_fp16_grads_accumulate_f32():
    """fp16 grads through the custom VJP: dS/dB come back in the qparam dtype
    (f32 accumulation — PARITY.md deviation 8), dX in fp16."""
    import jax

    spec = QuantSpec(quant_min=0, quant_max=255)
    r = np.random.RandomState(1)
    x16 = jnp.asarray(r.randn(16, 64), dtype=jnp.float16)
    s, b = jnp.array([0.1]), jnp.array([0.05])
    for impl in ("reference", "pallas"):
        def f(x, ss, bb):
            return jnp.sum(fake_quant(x, ss, bb, spec, impl=impl)
                           .astype(jnp.float32) ** 2)
        dx, ds, db = jax.grad(f, argnums=(0, 1, 2))(x16, s, b)
        assert dx.dtype == jnp.float16
        assert ds.dtype == jnp.float32 and db.dtype == jnp.float32
        assert np.isfinite(float(ds[0])) and np.isfinite(float(db[0]))
