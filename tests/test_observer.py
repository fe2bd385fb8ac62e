"""State-machine tests (SURVEY.md §4): batch-counter windows, observer→LSQ flip
at n_batches, weight static init formula, symmetric shift override, shift↔zp
round-trip, and concrete-vs-traced forward equivalence across a full schedule.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jaxlsq import QuantSpec
from jaxlsq.core import golden_forward
from jaxlsq.observers import (
    LSQQuantizer,
    MinMaxObserver,
    MovingAverageMinMaxObserver,
    convert_shift_to_zp,
    observer_qparams,
)


def act_q(n_batches=3, init_mode="observer", **kw):
    return LSQQuantizer(
        spec=QuantSpec(quant_min=0, quant_max=255),
        otype="activation", init_mode=init_mode, n_batches=n_batches,
        impl="reference", **kw)


def weight_q(per_channel=False):
    spec = QuantSpec(quant_min=-128, quant_max=127, symmetric=True,
                     per_channel=per_channel, axis=0)
    return LSQQuantizer(spec=spec, otype="weight", impl="reference")


def rand(shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape).astype(np.float32))


# ------------------------------------------------------------- weight init

def test_weight_static_init_formula():
    """scale = max(|µ−3σ|, |µ+3σ|)/2^(bitness−1) with
    bitness = ceil(log2(qmax−qmin))−1 (observers.py:329-337)."""
    q = weight_q()
    w = rand((64, 32))
    st = q.init(w)
    wn = np.asarray(w)
    mean, std = wn.mean(), wn.std(ddof=1)
    bitness = int(np.ceil(np.log2(127 - (-128)))) - 1  # = 7
    expect = max(abs(mean - 3 * std), abs(mean + 3 * std)) / 2 ** bitness
    np.testing.assert_allclose(float(st.scale[0]), expect, rtol=1e-5)
    assert int(st.n_batches) == -1            # window never triggers
    assert not bool(st.observer_enabled)      # learning weights need no observer


def test_weight_per_channel_init():
    q = weight_q(per_channel=True)
    w = rand((8, 32))
    st = q.init(w)
    wn = np.asarray(w)
    mean = wn.mean(axis=1)
    std = wn.std(axis=1, ddof=1)
    expect = np.maximum(np.abs(mean - 3 * std), np.abs(mean + 3 * std)) / 2 ** 7
    np.testing.assert_allclose(np.asarray(st.scale), expect, rtol=1e-5)
    assert st.scale.shape == (8,)


def test_symmetric_shift_override():
    """observers.py:238-241 applied at init."""
    spec = QuantSpec(quant_min=0, quant_max=127, symmetric=True)
    q = LSQQuantizer(spec=spec, otype="activation", init_mode="learnable",
                     init_scale=2.0, impl="reference")
    st = q.init(num_channels=1)
    assert float(st.shift[0]) == -126.0  # -(127//2)*sign(127)*2.0


def test_weight_requires_symmetric():
    with pytest.raises(ValueError):
        LSQQuantizer(spec=QuantSpec(quant_min=0, quant_max=255), otype="weight")


# -------------------------------------------------------- observer window

def test_observer_window_flip():
    """For init_mode='observer': eval-mode fake-quant while current_batch <
    n_batches; at batch == n_batches flip to full LSQ + disable observer
    (observers.py:436-440)."""
    q = act_q(n_batches=3)
    x = rand((4, 8)) * 2 + 1
    st = q.init(x)
    assert bool(st.observer_enabled)
    for step in range(3):
        out, st = q(st, x, training=True)
        assert int(st.current_batch) == step + 1
        assert bool(st.observer_enabled), f"observer off too early at step {step}"
    # batch 3 == n_batches: flip
    out, st = q(st, x, training=True)
    assert int(st.current_batch) == 4
    assert not bool(st.observer_enabled)
    # subsequent steps: out of window, counter frozen
    out, st = q(st, x, training=True)
    assert int(st.current_batch) == 4


def test_observer_writes_qparams():
    """During the window the observer's range drives scale/shift
    (observers.py:446-449 with shift = −zp·scale)."""
    q = act_q(n_batches=5, observer=MinMaxObserver())  # plain minmax
    x = jnp.asarray(np.linspace(-1.0, 3.0, 64, dtype=np.float32).reshape(8, 8))
    st = q.init(x)
    _, st = q(st, x, training=True)
    spec = q.spec
    e_scale, e_zp = observer_qparams(jnp.array([-1.0]), jnp.array([3.0]), spec)
    np.testing.assert_allclose(float(st.scale[0]), float(e_scale[0]), rtol=1e-6)
    np.testing.assert_allclose(float(st.shift[0]),
                               -float(e_zp[0]) * float(e_scale[0]), rtol=1e-6)


def test_learnable_window():
    """init_mode='learnable': observer disabled, init_mode fake-quant (identity
    fwd) until batch == n_batches (observers.py:441-443)."""
    q = act_q(n_batches=2, init_mode="learnable")
    x = rand((4, 8))
    st = q.init(x)
    out, st = q(st, x, training=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))  # identity
    assert not bool(st.observer_enabled)
    out, st = q(st, x, training=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    # batch 2 == n_batches: no more backprop-init → real fake-quant
    out, st = q(st, x, training=True)
    assert not np.array_equal(np.asarray(out), np.asarray(x))


def test_eval_does_not_advance_window():
    q = act_q(n_batches=3)
    x = rand((4, 8))
    st = q.init(x)
    _, st = q(st, x, training=False)
    assert int(st.current_batch) == 0


# ------------------------------------------------------------ mode toggles

def test_enable_param_learning_and_static_estimate():
    q = act_q(n_batches=3)
    st = q.init(rand((4, 8)))
    st = q.enable_param_learning(st)
    assert bool(st.learning_enabled) and not bool(st.observer_enabled)
    assert int(st.n_batches) == -1
    st = q.enable_static_estimate(st)
    assert not bool(st.learning_enabled) and bool(st.observer_enabled)


def test_disable_fake_quant_passthrough():
    q = act_q()
    x = rand((4, 8))
    st = q.init(x)
    st = q.disable_fake_quant(st)
    out, _ = q(st, x, training=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_debug_mode():
    q = act_q(debug_mode=True)
    x = rand((4, 8))
    st = q.init(x)
    out, st2 = q(st, x, training=True)
    assert out is x and st2 is st


# ------------------------------------------------------- qparam round-trip

def test_shift_zp_round_trip():
    """observers.py:366-368 (zp→shift) and :378-401 (shift→zp) invert on the
    zp grid."""
    spec = QuantSpec(quant_min=0, quant_max=255)
    q = act_q()
    st = q.init(num_channels=1)
    for zp_val in [0, 1, 77, 255]:
        st2 = q.set_qparams(st, scale=jnp.array([0.03]),
                            zero_point=jnp.array([zp_val]))
        zp_back = convert_shift_to_zp(st2.shift, st2.scale, spec)
        assert int(zp_back[0]) == zp_val


def test_calculate_qparams_eps_clamp():
    q = act_q()
    st = q.init(num_channels=1)
    st = q.set_qparams(st, scale=jnp.array([0.0]), shift=jnp.array([0.0]))
    scale, zp = q.calculate_qparams(st)
    assert float(scale[0]) == np.finfo(np.float32).eps


# ----------------------------------------------- traced ≡ concrete schedule

@pytest.mark.parametrize("init_mode", ["observer", "learnable"])
def test_traced_matches_concrete_over_schedule(init_mode):
    """Run 6 training steps through the jitted traced path and the eager
    concrete path; outputs and final state must agree."""
    qc = act_q(n_batches=3, init_mode=init_mode)
    xs = [rand((4, 16), seed=i) * (1 + 0.1 * i) for i in range(6)]

    st_c = qc.init(xs[0])
    st_t = qc.init(xs[0])

    @jax.jit
    def traced_step(state, x):
        return qc(state, x, training=True)

    for x in xs:
        out_c, st_c = qc(st_c, x, training=True)
        out_t, st_t = traced_step(st_t, x)
        np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_c),
                                   rtol=1e-5, atol=1e-6)

    assert int(st_t.current_batch) == int(st_c.current_batch)
    assert bool(st_t.observer_enabled) == bool(st_c.observer_enabled)
    np.testing.assert_allclose(np.asarray(st_t.scale), np.asarray(st_c.scale),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st_t.shift), np.asarray(st_c.shift),
                               rtol=1e-5, atol=1e-6)


def test_describe():
    q = act_q(n_batches=3)
    st = q.init(rand((4, 8)))
    txt = q.describe(st)
    assert "LSQQuantizer" in txt and "activation" in txt


# ------------------------------------------------------- minmax observers

def test_moving_average_observer():
    obs = MovingAverageMinMaxObserver(averaging_constant=0.5)
    st = obs.init(1)
    st = obs.update(st, jnp.asarray([[0.0, 2.0]]))   # first: overwrite
    assert float(st.min_val[0]) == 0.0 and float(st.max_val[0]) == 2.0
    st = obs.update(st, jnp.asarray([[-2.0, 0.0]]))  # ema with c=0.5
    assert float(st.min_val[0]) == -1.0
    assert float(st.max_val[0]) == 1.0


def test_per_channel_observer():
    obs = MinMaxObserver(per_channel=True, axis=1)
    st = obs.init(3)
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(4, 3))
    st = obs.update(st, x)
    np.testing.assert_array_equal(np.asarray(st.min_val), [0, 1, 2])
    np.testing.assert_array_equal(np.asarray(st.max_val), [9, 10, 11])


def test_observer_qparams_affine():
    spec = QuantSpec(quant_min=0, quant_max=255)
    scale, zp = observer_qparams(jnp.array([-1.0]), jnp.array([3.0]), spec)
    np.testing.assert_allclose(float(scale[0]), 4.0 / 255, rtol=1e-6)
    assert float(zp[0]) == round(0 - (-1.0 / (4.0 / 255)))


def test_observer_qparams_symmetric_signed():
    spec = QuantSpec(quant_min=-128, quant_max=127, symmetric=True)
    scale, zp = observer_qparams(jnp.array([-2.0]), jnp.array([1.0]), spec)
    np.testing.assert_allclose(float(scale[0]), 2.0 / 127.5, rtol=1e-6)
    assert float(zp[0]) == 0.0
