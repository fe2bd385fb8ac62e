"""HistogramObserver parity against torch.ao's HistogramObserver.

The reference plugs any torch.quantization observer into its init window
(observers.py:176-187); torch.ao's default static-quant observer is
``HistogramObserver``.  These tests feed IDENTICAL batches to torch's eager
implementation and our traced one and pin the running histogram, the tracked
range, and the final (scale, zero_point) — covering the same-range fast path,
the range-growth upscale remap, the degenerate (constant) range, the narrowed
7-in-8-bit range, and the symmetric qscheme.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from jaxlsq import QuantSpec
from jaxlsq.observers.histogram import HistogramObserver

BINS = 256


def _torch_observer(spec, bins=BINS):
    from torch.ao.quantization.observer import HistogramObserver as TorchHist
    if spec.symmetric:
        return TorchHist(bins=bins, dtype=torch.qint8,
                         qscheme=torch.per_tensor_symmetric)
    reduce_range = spec.quant_max < spec.type_max
    return TorchHist(bins=bins, dtype=torch.quint8,
                     qscheme=torch.per_tensor_affine,
                     reduce_range=reduce_range)


def _drive(spec, batches, bins=BINS):
    tobs = _torch_observer(spec, bins)
    ours = HistogramObserver(bins=bins)
    state = ours.init(1)
    for b in batches:
        tobs(torch.from_numpy(b))
        state = ours.update(state, jnp.asarray(b))
    return tobs, ours, state


def _spec_affine():
    return QuantSpec(quant_min=0, quant_max=255)


@pytest.mark.parametrize("widen", [False, True])
def test_histogram_tracks_torch(widen):
    r = np.random.RandomState(0)
    batches = [r.randn(1024).astype(np.float32)]
    if widen:
        # second batch widens the range -> exercises the upscale remap
        batches.append(r.randn(1024).astype(np.float32) * 4.0 + 1.0)
        batches.append(r.randn(512).astype(np.float32))  # same-range path
    else:
        # stays inside the first range (same-range accumulation only)
        batches.append((r.rand(512).astype(np.float32) - 0.5) * 0.5)
    tobs, _, state = _drive(_spec_affine(), batches)

    np.testing.assert_allclose(float(state.min_val[0]),
                               tobs.min_val.item(), rtol=1e-6)
    np.testing.assert_allclose(float(state.max_val[0]),
                               tobs.max_val.item(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(state.histogram),
                               tobs.histogram.numpy(), atol=1e-3)
    assert float(jnp.sum(state.histogram)) == pytest.approx(
        sum(b.size for b in batches), abs=1e-2)


@pytest.mark.parametrize("case", ["affine", "symmetric", "reduced"])
def test_qparams_match_torch(case):
    spec = {
        "affine": _spec_affine(),
        "symmetric": QuantSpec(quant_min=-128, quant_max=127, symmetric=True),
        "reduced": QuantSpec.make(8, signed=False, narrow_to_bits=7),
    }[case]
    r = np.random.RandomState(3)
    batches = [r.randn(2048).astype(np.float32),
               r.randn(2048).astype(np.float32) * 2.5 - 0.7,
               r.rand(1024).astype(np.float32) * 3.0]
    tobs, ours, state = _drive(spec, batches)

    t_scale, t_zp = tobs.calculate_qparams()
    scale, zp = ours.calculate_qparams(state, spec)
    np.testing.assert_allclose(float(scale[0]), t_scale.item(), rtol=1e-4)
    assert int(round(float(zp[0]))) == int(t_zp.item())


def test_constant_tensor_matches_torch():
    spec = _spec_affine()
    batches = [np.full((64,), 2.0, np.float32)]
    tobs, ours, state = _drive(spec, batches, bins=16)
    np.testing.assert_allclose(np.asarray(state.histogram),
                               tobs.histogram.numpy(), atol=1e-6)
    t_scale, t_zp = tobs.calculate_qparams()
    scale, zp = ours.calculate_qparams(state, spec)
    np.testing.assert_allclose(float(scale[0]), t_scale.item(), rtol=1e-6)
    assert int(round(float(zp[0]))) == int(t_zp.item())


def test_uninitialized_returns_default():
    spec = _spec_affine()
    ours = HistogramObserver(bins=32)
    scale, zp = ours.calculate_qparams(ours.init(1), spec)
    assert float(scale[0]) == 1.0 and float(zp[0]) == 0.0


def test_rejects_per_channel():
    with pytest.raises(ValueError):
        HistogramObserver().init(4)


def test_update_and_qparams_run_under_jit():
    """Both the histogram maintenance and the while_loop search trace."""
    spec = _spec_affine()
    obs = HistogramObserver(bins=64)

    @jax.jit
    def step(state, x):
        state = obs.update(state, x)
        return state, obs.calculate_qparams(state, spec)

    r = np.random.RandomState(7)
    state = obs.init(1)
    state, _ = step(state, jnp.asarray(r.randn(256).astype(np.float32)))
    state, (scale, zp) = step(
        state, jnp.asarray(r.randn(256).astype(np.float32) * 3.0))
    assert int(state.seen) == 2
    tobs = _torch_observer(spec, 64)
    # replay eagerly through torch for the same draws
    r = np.random.RandomState(7)
    tobs(torch.from_numpy(r.randn(256).astype(np.float32)))
    tobs(torch.from_numpy(r.randn(256).astype(np.float32) * 3.0))
    t_scale, t_zp = tobs.calculate_qparams()
    np.testing.assert_allclose(float(scale[0]), t_scale.item(), rtol=1e-4)
    assert int(round(float(zp[0]))) == int(t_zp.item())


def test_drives_lsq_quantizer_window():
    """End-to-end: HistogramObserver feeds the LSQ init window (traced path)
    and hands over sane qparams when the window closes."""
    from jaxlsq.observers import LSQQuantizer

    spec = QuantSpec(quant_min=0, quant_max=255)
    q = LSQQuantizer(spec=spec, otype="activation", n_batches=3,
                     observer=HistogramObserver(bins=64))
    state = q.init(jnp.zeros((8, 16)))

    @jax.jit
    def step(state, x):
        return q(state, x, training=True)

    r = np.random.RandomState(11)
    for _ in range(5):
        x = jnp.asarray(r.randn(8, 16).astype(np.float32))
        out, state = step(state, x)
        assert out.shape == x.shape
    # window closed: observer off, scale moved off its init value
    assert not bool(state.observer_enabled)
    assert float(state.scale[0]) != 1.0


def test_qconfig_histogram_trains_mlp():
    """default_qconfig(act_observer='histogram') drives a QAT train step:
    the histogram update + search run under jit inside the init window and
    the window closes into full LSQ."""
    import optax

    from jaxlsq.models import QuantMLP, default_qconfig
    from jaxlsq.parallel import create_train_state, make_train_step

    qc = default_qconfig(8, 8, init_batches=2, act_observer="histogram")
    model = QuantMLP(features=(16, 4), qconfig=qc)
    r = np.random.RandomState(21)
    x = jnp.asarray(r.randn(8, 12).astype(np.float32))
    y = jnp.asarray(r.randint(0, 4, size=(8,)))
    state = create_train_state(model, optax.sgd(1e-2), x)
    step = make_train_step(model, optax.sgd(1e-2))
    for _ in range(4):
        state, metrics = step(state, {"input": x, "label": y})
    assert np.isfinite(float(metrics["loss"]))
