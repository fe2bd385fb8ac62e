"""PercentileObserver tests (TensorRT-style outlier-clipping activation
ranges; no counterpart in the reference, which only uses torch's min/max
observers — /root/reference/README.md:109-110)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from jaxlsq import QuantSpec
from jaxlsq.observers import MinMaxObserver, PercentileObserver


def test_percentile_ignores_rare_outliers():
    """One 1-in-10⁴ outlier must stretch the min/max range but leave the
    99.99-percentile range at the bulk of the distribution."""
    r = np.random.RandomState(0)
    x = r.randn(100_000).astype(np.float32)
    x[0] = 1000.0
    x[1] = -1000.0
    x = jnp.asarray(x.reshape(100, 1000))

    mm = MinMaxObserver(per_channel=False)
    pc = PercentileObserver(percentile=99.99, per_channel=False,
                            averaging_constant=None)
    smm = mm.update(mm.init(), x)
    spc = pc.update(pc.init(), x)
    assert float(smm.max_val[0]) == 1000.0
    assert float(spc.max_val[0]) < 10.0
    assert float(spc.min_val[0]) > -10.0
    # ... but still covers the bulk (≥ 3.5σ of a 1e5-sample gaussian)
    assert float(spc.max_val[0]) > 3.5


def test_percentile_100_equals_minmax():
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(64, 64).astype(np.float32))
    mm = MinMaxObserver(per_channel=False)
    pc = PercentileObserver(percentile=100.0, per_channel=False,
                            averaging_constant=None)
    smm = mm.update(mm.init(), x)
    spc = pc.update(pc.init(), x)
    np.testing.assert_allclose(np.asarray(spc.min_val),
                               np.asarray(smm.min_val), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(spc.max_val),
                               np.asarray(smm.max_val), rtol=1e-6)


def test_percentile_per_channel_independent():
    r = np.random.RandomState(2)
    x = r.randn(20_000, 3).astype(np.float32)
    x[0, 0] = 500.0  # channel-0-only outlier
    x = jnp.asarray(x)
    pc = PercentileObserver(percentile=99.9, per_channel=True, axis=1,
                            averaging_constant=None)
    st = pc.update(pc.init(3), x)
    assert st.max_val.shape == (3,)
    assert float(st.max_val[0]) < 10.0          # outlier clipped
    assert float(st.max_val[1]) > 2.5           # clean channel near its max


def test_percentile_ema_and_jit():
    pc = PercentileObserver(percentile=99.0, averaging_constant=0.5)
    r = np.random.RandomState(3)

    @jax.jit
    def upd(st, x):
        return pc.update(st, x)

    x1 = jnp.asarray(r.randn(8, 512).astype(np.float32))
    x2 = jnp.asarray(3.0 * r.randn(8, 512).astype(np.float32))
    s1 = upd(pc.init(), x1)
    s2 = upd(s1, x2)
    assert int(s2.seen) == 2
    # first update overwrites; second EMA-merges halfway toward the new range
    mid = 0.5 * (float(s1.max_val[0])
                 + float(jnp.percentile(x2.reshape(-1), 99.0)))
    np.testing.assert_allclose(float(s2.max_val[0]), mid, rtol=1e-5)


def test_percentile_validation():
    with pytest.raises(ValueError, match="percentile"):
        PercentileObserver(percentile=40.0)
    with pytest.raises(ValueError, match="percentile"):
        PercentileObserver(percentile=100.5)


def test_percentile_in_full_qat_config():
    from jaxlsq.models import QuantMLP, default_qconfig
    from jaxlsq.parallel import create_train_state, make_train_step

    qc = default_qconfig(8, 8, init_batches=2, act_observer="percentile")
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
    # post-window the expensive update is gated off but qparams stay sane
    scales = [np.asarray(v) for p, v in jax.tree_util.tree_leaves_with_path(
        state.params["qparams"]) if "scale" in jax.tree_util.keystr(p)]
    assert all(np.all(s > 0) for s in scales)


def test_percentile_subsample_tracks_exact():
    """sample_cap (r5: XLA's full-tensor sort made the recipe ~50x minmax
    cost) must keep the percentile estimate close to exact on a large
    smooth-tailed tensor, and be a no-op below the cap."""
    from jaxlsq.observers import PercentileObserver

    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(1 << 20).astype(np.float32))
    exact = PercentileObserver(sample_cap=None)
    sub = PercentileObserver()  # default cap 65536
    se = exact.update(exact.init(), x)
    ss = sub.update(sub.init(), x)
    # 99.99th of a 1M-sample gaussian ~ 3.7; strided 64k estimate within a
    # few percent of the exact order statistic
    for a, b in ((se.min_val, ss.min_val), (se.max_val, ss.max_val)):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 0.15
    # below the cap: bit-identical to exact
    small = jnp.asarray(r.randn(4096).astype(np.float32))
    assert np.array_equal(
        np.asarray(exact.update(exact.init(), small).max_val),
        np.asarray(sub.update(sub.init(), small).max_val))
