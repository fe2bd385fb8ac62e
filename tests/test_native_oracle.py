"""Native C++ library vs golden jnp model: two independent oracles must agree.

The native library (jaxlsq/native/lsq_ref.cpp) implements SURVEY.md §0 from
scratch in C++; the golden model (jaxlsq/core/golden.py) implements it in jnp.
Bit-level agreement in f32 pins the framework's numeric contract from two
directions (SURVEY.md §4 golden-model strategy).
"""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from jaxlsq import QuantSpec
from jaxlsq.core.golden import golden_backward, golden_forward
from jaxlsq.native import is_available

if not is_available():  # no toolchain → skip the module, never fail
    pytest.skip("native toolchain unavailable", allow_module_level=True)

from jaxlsq.native import native_backward, native_forward, native_quantize_i8


def specs():
    out = []
    for symmetric, per_channel in itertools.product([False, True], repeat=2):
        out.append(QuantSpec.make(8, signed=symmetric, symmetric=symmetric,
                                  per_channel=per_channel, axis=1))
    out.append(QuantSpec.make(8, signed=True, symmetric=True,
                              narrow_to_bits=7))          # 7-bit-in-int8
    out.append(QuantSpec.make(4, signed=True, symmetric=True,
                              per_channel=True, axis=1))  # int4
    out.append(QuantSpec(quant_min=0, quant_max=255,
                         use_grad_scaling=False, grad_scaler=0.5))
    return out


def _data(spec, seed=0, shape=(6, 12, 5)):
    r = np.random.RandomState(seed)
    x = r.randn(*shape).astype(np.float32)
    g = r.randn(*shape).astype(np.float32)
    c = shape[spec.axis] if spec.per_channel else 1
    scale = (0.05 + 0.03 * r.rand(c)).astype(np.float32)
    shift = (0.02 * r.randn(c)).astype(np.float32) \
        if not spec.symmetric else np.zeros(c, np.float32)
    return x, g, scale, shift


@pytest.mark.parametrize("spec", specs(), ids=str)
def test_forward_agrees(spec):
    x, _, scale, shift = _data(spec)
    want = np.asarray(golden_forward(jnp.asarray(x), jnp.asarray(scale),
                                     jnp.asarray(shift), spec))
    got = native_forward(x, scale, shift, spec)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


@pytest.mark.parametrize("spec", specs(), ids=str)
@pytest.mark.parametrize("eval_mode,init_mode",
                         [(False, False), (True, False), (False, True)])
def test_backward_agrees(spec, eval_mode, init_mode):
    x, g, scale, shift = _data(spec, seed=1)
    dX_w, dS_w, dB_w = golden_backward(
        jnp.asarray(g), jnp.asarray(x), jnp.asarray(scale),
        jnp.asarray(shift), spec, eval_mode=eval_mode, init_mode=init_mode)
    dX, dS, dB = native_backward(g, x, scale, shift, spec,
                                 eval_mode=eval_mode, init_mode=init_mode)
    np.testing.assert_allclose(dX, np.asarray(dX_w), atol=1e-6)
    np.testing.assert_allclose(dS, np.asarray(dS_w), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(dB, np.asarray(dB_w), rtol=1e-4, atol=1e-6)


def test_round_half_to_even_contract():
    """x/s landing exactly on .5 must round to even (nearbyint == jnp.round)."""
    spec = QuantSpec(quant_min=0, quant_max=255)
    s = np.asarray([1.0], np.float32)
    b = np.asarray([0.0], np.float32)
    x = np.asarray([[0.5, 1.5, 2.5, 3.5, -0.5, 4.5, 5.5, 6.5]], np.float32)
    got = native_forward(x, s, b, spec)
    want = np.asarray(golden_forward(jnp.asarray(x), jnp.asarray(s),
                                     jnp.asarray(b), spec))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got[0, :4], [0.0, 2.0, 2.0, 4.0])


def test_quantize_i8_matches_pack():
    from jaxlsq.serve import quantize_weight

    spec = QuantSpec.make(8, signed=True, symmetric=True, per_channel=True,
                          axis=1)
    x, _, scale, shift = _data(spec, seed=2, shape=(16, 8))
    packed = quantize_weight(jnp.asarray(x), jnp.asarray(scale),
                             jnp.asarray(shift), spec, bits=8)
    got = native_quantize_i8(x, scale, shift, spec)
    np.testing.assert_array_equal(got, np.asarray(packed.data))


def test_large_tensor_openmp_reduction():
    """Reduction correctness at a size that engages all OpenMP threads."""
    spec = QuantSpec.make(8, signed=False, per_channel=True, axis=1)
    x, g, scale, shift = _data(spec, seed=3, shape=(64, 16, 33))
    dX_w, dS_w, dB_w = golden_backward(
        jnp.asarray(g), jnp.asarray(x), jnp.asarray(scale),
        jnp.asarray(shift), spec)
    dX, dS, dB = native_backward(g, x, scale, shift, spec)
    np.testing.assert_allclose(dX, np.asarray(dX_w), atol=1e-6)
    np.testing.assert_allclose(dS, np.asarray(dS_w), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(dB, np.asarray(dB_w), rtol=1e-4, atol=1e-5)
