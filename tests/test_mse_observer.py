"""MSE-minimizing observer tests (north-star "MSE-min activation init")."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from jaxlsq import QuantSpec
from jaxlsq.core.golden import golden_forward
from jaxlsq.observers import MSEObserver, MinMaxObserver, observer_qparams


def _mse_of_range(x, mn, mx, spec):
    scale, zp = observer_qparams(jnp.asarray([mn]), jnp.asarray([mx]), spec)
    shift = -zp.astype(jnp.float32) * scale
    xfq = golden_forward(x, scale, shift, spec)
    return float(jnp.sum((xfq - x) ** 2))


def test_mse_beats_minmax_on_outliers():
    """Moderate outliers + a coarse (4-bit) grid: clipping the tails (MSE)
    must beat covering them (min/max) on reconstruction error.  (With extreme
    outliers min/max can genuinely be MSE-optimal — clipping cost grows
    quadratically — so the regime here is deliberately moderate: ±6σ tails.)"""
    spec = QuantSpec.make(4, signed=True, symmetric=True)
    r = np.random.RandomState(0)
    x = r.randn(4096).astype(np.float32)
    x[:4] = [6.0, -6.0, 6.0, -6.0]  # moderate outliers
    x = jnp.asarray(x.reshape(64, 64))

    mm = MinMaxObserver(per_channel=False)
    mse = MSEObserver(spec=spec, per_channel=False, num_candidates=64,
                      averaging_constant=None)
    smm = mm.update(mm.init(), x)
    smse = mse.update(mse.init(), x)

    err_mm = _mse_of_range(x, float(smm.min_val[0]), float(smm.max_val[0]), spec)
    err_mse = _mse_of_range(x, float(smse.min_val[0]), float(smse.max_val[0]), spec)
    assert err_mse < 0.7 * err_mm
    # the MSE range is a strict shrink of the min/max range
    assert float(smse.max_val[0]) < float(smm.max_val[0])


def test_mse_picks_near_optimal_factor():
    """The chosen range must be within one grid step of the brute-force best."""
    spec = QuantSpec.make(8, signed=False)
    r = np.random.RandomState(1)
    x = r.randn(2048).astype(np.float32)
    x[:4] *= 30.0
    x = jnp.asarray(x.reshape(16, 128))
    obs = MSEObserver(spec=spec, per_channel=False, num_candidates=64,
                      averaging_constant=None)
    st = obs.update(obs.init(), x)
    err_obs = _mse_of_range(x, float(st.min_val[0]), float(st.max_val[0]), spec)
    bmin, bmax = float(jnp.min(x)), float(jnp.max(x))
    errs = [_mse_of_range(x, bmin * f, bmax * f, spec)
            for f in np.linspace(1 / 64, 1.0, 64)]
    assert err_obs <= min(errs) * 1.0001


def test_mse_per_channel_independent():
    spec = QuantSpec.make(4, signed=True, symmetric=True, per_channel=True,
                          axis=1)
    r = np.random.RandomState(2)
    x = r.randn(4096, 3).astype(np.float32)
    x[:4, 0] = [6.0, -6.0, 6.0, -6.0]  # channel 0: moderate outliers
    x = jnp.asarray(x)
    obs = MSEObserver(spec=spec, per_channel=True, axis=1,
                      averaging_constant=None)
    st = obs.update(obs.init(3), x)
    assert st.min_val.shape == (3,)
    # outlier channel gets clipped harder than the clean channels
    shrink0 = float(st.max_val[0]) / float(jnp.max(x[:, 0]))
    shrink1 = float(st.max_val[1]) / float(jnp.max(x[:, 1]))
    assert shrink0 < 0.75
    assert shrink0 < shrink1


def test_mse_ema_and_jit():
    spec = QuantSpec.make(8, signed=False)
    obs = MSEObserver(spec=spec, averaging_constant=0.5)
    st = obs.init()
    r = np.random.RandomState(3)

    @jax.jit
    def upd(st, x):
        return obs.update(st, x)

    x1 = jnp.asarray(r.randn(8, 128).astype(np.float32))
    x2 = jnp.asarray(2.0 * r.randn(8, 128).astype(np.float32))
    s1 = upd(st, x1)
    s2 = upd(s1, x2)
    assert int(s2.seen) == 2
    # EMA: second update moves halfway toward the new best range
    assert float(s2.max_val[0]) != float(s1.max_val[0])


def test_mse_in_full_qat_config():
    from jaxlsq.models import QuantMLP, default_qconfig
    from jaxlsq.parallel import create_train_state, make_train_step

    qc = default_qconfig(8, 8, init_batches=2, act_observer="mse")
    model = QuantMLP(features=(16, 4), qconfig=qc)
    tx = optax.sgd(1e-2)
    r = np.random.RandomState(4)
    x0 = jnp.asarray(r.randn(4, 8).astype(np.float32))
    state = create_train_state(model, tx, x0)
    step = make_train_step(model, tx)
    for _ in range(4):
        batch = {"input": jnp.asarray(r.randn(4, 8).astype(np.float32)),
                 "label": jnp.asarray(r.randint(0, 4, size=4))}
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
