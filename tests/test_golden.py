"""Golden-model unit tests: jaxlsq.core.golden vs an independent numpy oracle.

The oracle below is a second, independent transcription of the reference math
(torchlsq/csrc/ops/kernels/lsq_kernel.h, SURVEY.md §0) written directly in numpy.
Covers per-tensor/per-channel × symmetric/affine × eval/init/full modes ×
4-8-bit ranges × the 7-bit-in-8-bit carrier-narrowing case (functional.py:69-71).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from jaxlsq.core import QuantSpec, golden_backward, golden_forward, effective_grad_scale

F32EPS = np.finfo(np.float32).eps


# --------------------------------------------------------------------- oracle

def oracle(x, scale, shift, spec, grad=None, eval_mode=False, init_mode=False):
    """Independent numpy LSQ forward+backward, scalar-math style."""
    x = np.asarray(x, np.float32)
    qmin, qmax = float(spec.quant_min), float(spec.quant_max)
    tmin, tmax = float(spec.type_min), float(spec.type_max)

    if spec.per_channel:
        sh = [1] * x.ndim
        sh[spec.axis] = -1
        s = np.asarray(scale, np.float32).reshape(sh)
        b = np.asarray(shift, np.float32).reshape(sh)
    else:
        s = np.float32(scale[0])
        b = np.float32(shift[0])
    s = np.maximum(np.abs(s), F32EPS)

    # round-half-to-even == np.round == C nearbyint in default FP env
    zp = np.round(np.clip(-b / s, tmin, tmax))
    xq_unrounded = np.clip(x / s + zp, qmin, qmax)
    out = (np.round(xq_unrounded) - zp) * s
    if init_mode:
        out = x

    if grad is None:
        return out

    g = np.asarray(grad, np.float32)
    mask = (qmin < xq_unrounded) & (xq_unrounded < qmax)
    dX = g if init_mode else g * mask
    if eval_mode:
        z = np.zeros(np.shape(scale), np.float32)
        return out, dX, z, z.copy()

    xfq = (np.round(xq_unrounded) - zp) * s
    geff = 2.0 * (xfq - x) if init_mode else g
    dB_elem = np.where(mask, 0.0, geff)
    if spec.symmetric:
        dB_elem = np.zeros_like(dB_elem)
    dS_elem = np.where(
        mask,
        geff * (xfq - x) / s,
        np.where(xq_unrounded <= qmin, geff * (qmin - zp), geff * (qmax - zp)),
    )
    if spec.use_grad_scaling:
        n = x.size * qmax
        if spec.per_channel:
            n /= x.shape[spec.axis]
        gs = spec.grad_scaler / np.sqrt(n)
    else:
        gs = spec.grad_scaler
    if spec.per_channel:
        axes = tuple(a for a in range(x.ndim) if a != spec.axis)
        dS = dS_elem.sum(axes) * gs
        dB = dB_elem.sum(axes) * gs
    else:
        dS = np.array([dS_elem.sum()]) * gs
        dB = np.array([dB_elem.sum()]) * gs
    return out, dX, dS, dB


SPECS = [
    # quint8 activations, affine per-tensor (reference default, functional.py:8-19)
    QuantSpec(quant_min=0, quant_max=255),
    # qint8 symmetric weights
    QuantSpec(quant_min=-128, quant_max=127, symmetric=True),
    # 7-bit-in-8-bit narrowing (avoid_torch_overflow), quint8 carrier
    QuantSpec(quant_min=0, quant_max=127, type_min=0, type_max=255),
    # 7-bit-in-8-bit signed
    QuantSpec(quant_min=-64, quant_max=63, type_min=-128, type_max=127, symmetric=True),
    # 4-bit signed symmetric
    QuantSpec(quant_min=-8, quant_max=7, symmetric=True),
    # 4-bit unsigned affine
    QuantSpec(quant_min=0, quant_max=15),
    # per-channel qint8 weights, axis 0
    QuantSpec(quant_min=-128, quant_max=127, symmetric=True, per_channel=True, axis=0),
    # per-channel affine activations, axis 1
    QuantSpec(quant_min=0, quant_max=255, per_channel=True, axis=1),
    # no grad scaling, custom scaler
    QuantSpec(quant_min=0, quant_max=255, use_grad_scaling=False, grad_scaler=0.5),
]


def _make_inputs(spec, shape=(4, 6, 5), seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(*shape).astype(np.float32) * 2.0
    c = shape[spec.axis] if spec.per_channel else 1
    scale = (0.05 + rng.rand(c) * 0.2).astype(np.float32)
    shift = (rng.randn(c) * 0.1).astype(np.float32)
    if spec.symmetric:
        shift = np.zeros_like(shift)
    grad = rng.randn(*shape).astype(np.float32)
    return x, scale, shift, grad


@pytest.mark.parametrize("spec", SPECS)
@pytest.mark.parametrize("eval_mode,init_mode",
                         [(False, False), (True, False), (False, True), (True, True)])
def test_golden_matches_oracle(spec, eval_mode, init_mode):
    x, scale, shift, grad = _make_inputs(spec)
    out_ref, dX_ref, dS_ref, dB_ref = oracle(
        x, scale, shift, spec, grad, eval_mode=eval_mode, init_mode=init_mode)

    out = golden_forward(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(shift),
                         spec, init_mode=init_mode)
    dX, dS, dB = golden_backward(
        jnp.asarray(grad), jnp.asarray(x), jnp.asarray(scale), jnp.asarray(shift),
        spec, eval_mode=eval_mode, init_mode=init_mode)

    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dX), dX_ref, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dS), dS_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dB), dB_ref, rtol=1e-5, atol=1e-5)


def test_negative_scale_clamped_to_abs():
    """The reference clamps s = max(eps, |scale|): negative scales behave as |s|
    (lsq_kernel.h:157-158, lsq_cpu.cpp:45-46)."""
    spec = QuantSpec(quant_min=0, quant_max=255)
    x = jnp.linspace(-1, 1, 32).reshape(4, 8)
    pos = golden_forward(x, jnp.array([0.1]), jnp.array([0.0]), spec)
    neg = golden_forward(x, jnp.array([-0.1]), jnp.array([0.0]), spec)
    np.testing.assert_array_equal(np.asarray(pos), np.asarray(neg))


def test_tiny_scale_clamped_to_eps():
    spec = QuantSpec(quant_min=0, quant_max=255)
    x = jnp.ones((2, 2))
    out = golden_forward(x, jnp.array([0.0]), jnp.array([0.0]), spec)
    assert np.all(np.isfinite(np.asarray(out)))


def test_round_half_to_even():
    """nearbyint semantics: 0.5 → 0, 1.5 → 2, 2.5 → 2 at the quant grid."""
    spec = QuantSpec(quant_min=0, quant_max=255, use_grad_scaling=False)
    # scale 1, shift 0 → x_q = round(x); pick exact .5 values
    x = jnp.array([[0.5, 1.5, 2.5, 3.5]])
    out = golden_forward(x, jnp.array([1.0]), jnp.array([0.0]), spec)
    np.testing.assert_array_equal(np.asarray(out)[0], [0.0, 2.0, 2.0, 4.0])


def test_zero_point_participation():
    """Dequant is (x_q - zp)*s with the *rounded clamped* zp, not the raw shift
    (lsq_kernel.h:12-13, SURVEY.md §0)."""
    spec = QuantSpec(quant_min=0, quant_max=255)
    s, b = 0.1, -0.037  # zp = round(clamp(0.37, 0, 255)) = 0 → pure x/s rounding
    x = jnp.array([[0.25]])
    out = golden_forward(x, jnp.array([s]), jnp.array([b]), spec)
    zp = np.round(np.clip(-b / s, 0, 255))
    expect = (np.round(np.clip(0.25 / s + zp, 0, 255)) - zp) * s
    np.testing.assert_allclose(np.asarray(out)[0, 0], expect, rtol=1e-6)


def test_grad_scale_formula():
    spec_pt = QuantSpec(quant_min=0, quant_max=255)
    assert np.isclose(effective_grad_scale(spec_pt, 1000),
                      1.0 / np.sqrt(1000 * 255))
    spec_pc = QuantSpec(quant_min=0, quant_max=255, per_channel=True)
    # CPU-corrected per-channel form: sqrt(numel*qmax/C) (lsq_cpu.cpp:250-251)
    assert np.isclose(effective_grad_scale(spec_pc, 1000, num_channels=10),
                      1.0 / np.sqrt(1000 * 255 / 10))


def test_spec_validation():
    with pytest.raises(ValueError):
        QuantSpec(quant_min=10, quant_max=5)
    with pytest.raises(ValueError):
        QuantSpec(quant_min=1, quant_max=10, symmetric=True)  # must cover 0
    with pytest.raises(ValueError):
        QuantSpec(quant_min=0, quant_max=255, type_max=100)  # carrier too narrow


def test_narrowed_defaults():
    w = QuantSpec.weight_default(8)
    assert (w.quant_min, w.quant_max) == (-64, 63)
    assert (w.type_min, w.type_max) == (-128, 127)
    assert w.symmetric
    a = QuantSpec.activation_default(8)
    assert (a.quant_min, a.quant_max) == (0, 127)
    assert (a.type_min, a.type_max) == (0, 255)
    w4 = QuantSpec.weight_default(4, reduce_range=False)
    assert (w4.quant_min, w4.quant_max) == (-8, 7)


def test_symmetric_init_shift_override():
    """observers.py:238-241: shift override for symmetric ranges."""
    s = QuantSpec(quant_min=-64, quant_max=63, symmetric=True)
    # qmin+qmax = -1 → sign -1, abs//2 = 0 → shift 0
    assert s.symmetric_init_shift(1.0) == 0.0
    s2 = QuantSpec(quant_min=0, quant_max=127, symmetric=True)
    # qmin+qmax = 127 → -63 * init_scale
    assert s2.symmetric_init_shift(2.0) == -126.0
