"""Pallas kernel tests: fused fwd/bwd kernels (interpret mode on CPU) vs the
golden jnp model — exact f32 parity expected (same op order, f32 math).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from jaxlsq import QuantSpec, fake_quant
from jaxlsq.core import golden_backward, golden_forward
from jaxlsq.ops import pallas_kernels as pk

SPECS = [
    QuantSpec(quant_min=0, quant_max=255),
    QuantSpec(quant_min=-128, quant_max=127, symmetric=True),
    QuantSpec(quant_min=0, quant_max=127, type_min=0, type_max=255),
    QuantSpec(quant_min=-8, quant_max=7, symmetric=True),
    QuantSpec(quant_min=-128, quant_max=127, symmetric=True, per_channel=True, axis=0),
    QuantSpec(quant_min=0, quant_max=255, per_channel=True, axis=1),
    QuantSpec(quant_min=0, quant_max=255, per_channel=True, axis=2),
]

# Aligned, unaligned, tiny, multi-dim shapes.
SHAPES = [(256, 128), (33, 7, 5), (1, 130), (4, 16, 3, 3)]


def _inputs(spec, shape, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    c = shape[spec.axis] if spec.per_channel else 1
    scale = jnp.asarray(0.05 + 0.1 * rng.rand(c).astype(np.float32))
    shift = jnp.asarray(
        np.zeros(c, np.float32) if spec.symmetric
        else 0.1 * rng.randn(c).astype(np.float32))
    g = jnp.asarray(rng.randn(*shape).astype(np.float32))
    return x, scale, shift, g


@pytest.mark.parametrize("spec", SPECS)
@pytest.mark.parametrize("shape", SHAPES)
def test_pallas_forward_matches_golden(spec, shape):
    if spec.per_channel and spec.axis >= len(shape):
        pytest.skip("axis out of range for this shape")
    x, scale, shift, _ = _inputs(spec, shape)
    ours = pk.pallas_forward(x, scale, shift, spec=spec, interpret=True)
    ref = golden_forward(x, scale, shift, spec)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=0, atol=0)


@pytest.mark.parametrize("spec", SPECS)
@pytest.mark.parametrize("shape", [(256, 128), (33, 7, 5)])
@pytest.mark.parametrize("eval_mode,init_mode",
                         [(False, False), (True, False), (False, True)])
def test_pallas_backward_matches_golden(spec, shape, eval_mode, init_mode):
    if spec.per_channel and spec.axis >= len(shape):
        pytest.skip("axis out of range for this shape")
    x, scale, shift, g = _inputs(spec, shape)
    dX, dS, dB = pk.pallas_backward(
        g, x, scale, shift, spec=spec, eval_mode=eval_mode,
        init_mode=init_mode, interpret=True)
    eX, eS, eB = golden_backward(
        g, x, scale, shift, spec, eval_mode=eval_mode, init_mode=init_mode)
    np.testing.assert_allclose(np.asarray(dX), np.asarray(eX), rtol=0, atol=0)
    # partial-sum association differs from golden's single big sum → tiny fp drift
    np.testing.assert_allclose(np.asarray(dS), np.asarray(eS), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dB), np.asarray(eB), rtol=2e-5, atol=1e-6)


def test_pallas_init_mode_forward_is_identity_no_copy():
    spec = QuantSpec(quant_min=0, quant_max=255)
    x = jnp.ones((8, 8))
    out = pk.pallas_forward(x, jnp.array([0.1]), jnp.array([0.0]),
                            spec=spec, init_mode=True, interpret=True)
    assert out is x  # identity passthrough


def test_pallas_bf16_accumulates_f32():
    """bf16 input: dS partials accumulate in f32 (SURVEY.md §7 deviation)."""
    spec = QuantSpec(quant_min=0, quant_max=255)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 128), dtype=jnp.bfloat16)
    g = jnp.asarray(rng.randn(64, 128), dtype=jnp.bfloat16)
    scale, shift = jnp.array([0.1]), jnp.array([0.0])
    dX, dS, dB = pk.pallas_backward(g, x, scale, shift, spec=spec, interpret=True)
    assert dX.dtype == jnp.bfloat16
    assert dS.dtype == scale.dtype
    # golden in f32 on the f32-cast inputs should be close
    eX, eS, eB = golden_backward(
        g.astype(jnp.float32), x.astype(jnp.float32), scale, shift, spec)
    np.testing.assert_allclose(float(dS[0]), float(eS[0]), rtol=1e-3)


def test_functional_pallas_impl_end_to_end():
    """fake_quant(impl='pallas') runs the kernels through custom_vjp."""
    import jax

    spec = QuantSpec(quant_min=0, quant_max=255)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(32, 128).astype(np.float32))
    scale, shift = jnp.array([0.1]), jnp.array([0.05])

    def loss(x, s, b):
        return jnp.sum(fake_quant(x, s, b, spec, impl="pallas") ** 2)

    val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, scale, shift)

    def loss_ref(x, s, b):
        return jnp.sum(fake_quant(x, s, b, spec, impl="reference") ** 2)

    val_r, grads_r = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(x, scale, shift)
    np.testing.assert_allclose(float(val), float(val_r), rtol=1e-6)
    for a, b in zip(grads, grads_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_pallas_fp16_accumulates_f32():
    """fp16 mirror of the bf16 test: dS partials accumulate in f32
    (lsq_cuda.cu:45 dispatches half; we deviate by accumulating f32 —
    PARITY.md deviation 8)."""
    spec = QuantSpec(quant_min=0, quant_max=255)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 128), dtype=jnp.float16)
    g = jnp.asarray(rng.randn(64, 128), dtype=jnp.float16)
    scale, shift = jnp.array([0.1]), jnp.array([0.0])
    dX, dS, dB = pk.pallas_backward(g, x, scale, shift, spec=spec, interpret=True)
    assert dX.dtype == jnp.float16
    assert dS.dtype == scale.dtype
    eX, eS, eB = golden_backward(
        g.astype(jnp.float32), x.astype(jnp.float32), scale, shift, spec)
    np.testing.assert_allclose(float(dS[0]), float(eS[0]), rtol=2e-3)
    np.testing.assert_allclose(float(dB[0]), float(eB[0]), rtol=2e-3, atol=1e-3)


@pytest.mark.parametrize("case", [
    ("pt_u8", dict(bits=8, signed=False), (64, 256)),
    ("pt_s8_odd", dict(bits=8, signed=True, symmetric=True), (33, 7, 5)),
    ("pc_s4", dict(bits=4, signed=True, symmetric=False, per_channel=True,
                   axis=1), (32, 24, 3)),
    ("pc_s6_ax0", dict(bits=6, signed=True, symmetric=True, per_channel=True,
                       axis=0), (17, 130)),
], ids=lambda c: c[0])
def test_fused_fwdbwd_matches_golden(case):
    """pallas_fwdbwd (VERDICT r2 next-#8: single-kernel fwd+bwd for the
    remat chain) must equal golden fwd + bwd: out and dX bit-for-bit, dS/dB
    at the reduction tolerance."""
    from jaxlsq.core.golden import golden_backward, golden_forward
    from jaxlsq.ops.pallas_kernels import pallas_fwdbwd

    _, kw, shape = case
    bits = kw.pop("bits")
    spec = QuantSpec.make(bits, **kw)
    r = np.random.RandomState(7)
    x = jnp.asarray(3 * r.randn(*shape).astype(np.float32))
    g = jnp.asarray(r.randn(*shape).astype(np.float32))
    c = shape[spec.axis] if spec.per_channel else 1
    s = jnp.asarray((0.05 + 0.1 * r.rand(c)).astype(np.float32))
    b = (jnp.zeros((c,), jnp.float32) if spec.symmetric
         else jnp.asarray(0.05 * r.randn(c).astype(np.float32)))
    out, dX, dS, dB = pallas_fwdbwd(g, x, s, b, spec=spec)
    wf = golden_forward(x, s, b, spec)
    wdX, wdS, wdB = golden_backward(g, x, s, b, spec)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(wf))
    np.testing.assert_array_equal(np.asarray(dX), np.asarray(wdX))
    np.testing.assert_allclose(np.asarray(dS), np.asarray(wdS),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dB), np.asarray(wdB),
                               rtol=1e-4, atol=1e-5)
