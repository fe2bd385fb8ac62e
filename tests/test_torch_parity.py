"""Cross-validation against PyTorch's own fake-quantize kernels.

The reference is a drop-in replacement for ``torch.quantization.FakeQuantize``
(README.md:3-4), so in eval mode its forward must agree with torch's
``fake_quantize_per_{tensor,channel}_affine``.  These tests pin OUR forward to
torch's (CPU) kernels through the shift→zero_point fold — a third independent
oracle beside the golden jnp model and the native C++ library.

Gradient semantics are LSQ-specific (custom, not autograd-derivable), so only
the forward is torch-comparable; the zp rounding/clamping seam
(observers.py:378-401) is exactly what this exercises.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from jaxlsq import QuantSpec
from jaxlsq.core.golden import clamp_scale, golden_forward
from jaxlsq.observers import convert_shift_to_zp


def _cases():
    return [
        # (spec, name)
        (QuantSpec(quant_min=0, quant_max=255), "quint8-affine"),
        (QuantSpec(quant_min=-128, quant_max=127, type_min=-128,
                   type_max=127, symmetric=True), "qint8-symmetric"),
        (QuantSpec.make(8, signed=False, narrow_to_bits=7), "quint8-reduced"),
        (QuantSpec.make(4, signed=True, symmetric=True), "int4"),
    ]


@pytest.mark.parametrize("spec,name", _cases())
def test_per_tensor_forward_matches_torch(spec, name):
    r = np.random.RandomState(0)
    x = r.randn(64, 32).astype(np.float32) * 3.0
    scale = np.asarray([0.07], np.float32)
    shift = (np.zeros(1, np.float32) if spec.symmetric
             else np.asarray([-0.3], np.float32))

    ours = np.asarray(golden_forward(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(shift), spec))

    s = np.asarray(clamp_scale(jnp.asarray(scale)))
    zp = np.asarray(convert_shift_to_zp(jnp.asarray(shift), jnp.asarray(s),
                                        spec))
    want = torch.fake_quantize_per_tensor_affine(
        torch.from_numpy(x), float(s[0]), int(zp[0]),
        spec.quant_min, spec.quant_max).numpy()
    np.testing.assert_allclose(ours, want, rtol=0, atol=0, err_msg=name)


def test_per_channel_forward_matches_torch():
    spec = QuantSpec.make(8, signed=True, symmetric=True, per_channel=True,
                          axis=0)
    r = np.random.RandomState(1)
    x = r.randn(6, 33).astype(np.float32)
    scale = (0.02 + 0.05 * r.rand(6)).astype(np.float32)
    shift = np.zeros(6, np.float32)

    ours = np.asarray(golden_forward(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(shift), spec))

    zp = np.asarray(convert_shift_to_zp(jnp.asarray(shift),
                                        jnp.asarray(scale), spec))
    want = torch.fake_quantize_per_channel_affine(
        torch.from_numpy(x), torch.from_numpy(scale),
        torch.from_numpy(zp.astype(np.int32)), 0,
        spec.quant_min, spec.quant_max).numpy()
    np.testing.assert_allclose(ours, want, rtol=0, atol=0)


def test_affine_zero_point_rounding_matches_torch():
    """Half-integer -shift/scale ratios: zp rounding must agree with torch's
    (round-half-to-even at the fold, then integer zp in the kernel)."""
    spec = QuantSpec(quant_min=0, quant_max=255)
    r = np.random.RandomState(2)
    x = r.randn(128).astype(np.float32)
    scale = np.asarray([0.1], np.float32)
    for shift_v in (-0.25, -0.15, 0.05, -1.05, 2.35):
        shift = np.asarray([shift_v], np.float32)
        ours = np.asarray(golden_forward(
            jnp.asarray(x), jnp.asarray(scale), jnp.asarray(shift), spec))
        zp = int(np.asarray(convert_shift_to_zp(
            jnp.asarray(shift), jnp.asarray(scale), spec))[0])
        want = torch.fake_quantize_per_tensor_affine(
            torch.from_numpy(x), 0.1, zp, 0, 255).numpy()
        np.testing.assert_allclose(ours, want, atol=0,
                                   err_msg=f"shift={shift_v}")


def test_observer_qparams_match_torch_minmax():
    """Our observer_qparams vs torch.ao.quantization.MinMaxObserver on the
    same data — the (scale, zp) handed to the LSQ init must match torch's."""
    from jaxlsq.observers import MinMaxObserver as JMinMax

    tq = pytest.importorskip("torch.ao.quantization")
    r = np.random.RandomState(3)
    x = (r.randn(512) * 2 + 0.7).astype(np.float32)

    tobs = tq.MinMaxObserver(dtype=torch.quint8,
                             qscheme=torch.per_tensor_affine,
                             quant_min=0, quant_max=255)
    tobs(torch.from_numpy(x))
    t_scale, t_zp = tobs.calculate_qparams()

    spec = QuantSpec(quant_min=0, quant_max=255)
    jobs = JMinMax(per_channel=False)
    st = jobs.update(jobs.init(), jnp.asarray(x.reshape(8, 64)))
    j_scale, j_zp = jobs.calculate_qparams(st, spec)

    np.testing.assert_allclose(float(j_scale[0]), float(t_scale), rtol=1e-6)
    assert int(j_zp[0]) == int(t_zp)


def test_per_channel_observer_qparams_match_torch():
    """Per-channel MinMax observer vs torch.ao's PerChannelMinMaxObserver."""
    from jaxlsq.observers import MinMaxObserver as JMinMax

    tq = pytest.importorskip("torch.ao.quantization")
    r = np.random.RandomState(4)
    x = (r.randn(6, 128) * np.asarray([0.5, 1, 2, 4, 8, 16])[:, None]
         ).astype(np.float32)

    tobs = tq.PerChannelMinMaxObserver(
        ch_axis=0, dtype=torch.qint8,
        qscheme=torch.per_channel_symmetric, quant_min=-128, quant_max=127)
    tobs(torch.from_numpy(x))
    t_scale, t_zp = tobs.calculate_qparams()

    spec = QuantSpec(quant_min=-128, quant_max=127, symmetric=True,
                     per_channel=True, axis=0)
    jobs = JMinMax(per_channel=True, axis=0)
    st = jobs.update(jobs.init(6), jnp.asarray(x))
    j_scale, j_zp = jobs.calculate_qparams(st, spec)

    np.testing.assert_allclose(np.asarray(j_scale), t_scale.numpy(),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(j_zp), t_zp.numpy())
