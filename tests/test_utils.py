"""Tests for checkpoint/resume, profiling helpers, and quantizer reports."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from jaxlsq.models import QuantMLP, default_qconfig
from jaxlsq.parallel import create_train_state, make_train_step
from jaxlsq.utils import (StepTimer, annotate, format_report, latest_step,
                          quantizer_report, restore_checkpoint,
                          save_checkpoint)


def _state_and_step(steps=3):
    qc = default_qconfig(8, 8, init_batches=2)
    model = QuantMLP(features=(16, 4), qconfig=qc)
    tx = optax.sgd(1e-2)
    r = np.random.RandomState(0)
    x0 = jnp.asarray(r.randn(4, 8).astype(np.float32))
    state = create_train_state(model, tx, x0)
    step = make_train_step(model, tx)
    for _ in range(steps):
        batch = {"input": jnp.asarray(r.randn(4, 8).astype(np.float32)),
                 "label": jnp.asarray(r.randint(0, 4, size=4))}
        state, _ = step(state, batch)
    return model, tx, state, step, r


@pytest.mark.parametrize("use_orbax", [False, True])
def test_checkpoint_roundtrip_exact(tmp_path, use_orbax):
    """Full QATTrainState — params, qparams, counters, opt state — restores
    bit-exactly (no lazy-init trap: restore into a fresh state, no forward)."""
    if use_orbax:
        pytest.importorskip("orbax.checkpoint")
    model, tx, state, step, r = _state_and_step()
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, int(state.step), use_orbax=use_orbax)
    assert latest_step(ckpt) == int(state.step)

    fresh = create_train_state(model, tx, jnp.zeros((4, 8)))
    restored = restore_checkpoint(ckpt, fresh, use_orbax=use_orbax)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resume: identical next step from saved vs live state
    batch = {"input": jnp.asarray(r.randn(4, 8).astype(np.float32)),
             "label": jnp.asarray(r.randint(0, 4, size=4))}
    s1, m1 = step(state, batch)
    s2, m2 = step(restored, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-7)
    # counters (incl. quantizer init windows) advanced identically
    np.testing.assert_array_equal(np.asarray(s1.step), np.asarray(s2.step))


def test_latest_step_picks_max(tmp_path):
    model, tx, state, _, _ = _state_and_step(steps=1)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, 3, use_orbax=False)
    save_checkpoint(ckpt, state, 12, use_orbax=False)
    assert latest_step(ckpt) == 12
    assert latest_step(str(tmp_path / "nope")) is None


def test_restore_structure_mismatch_raises(tmp_path):
    _, _, state, _, _ = _state_and_step(steps=1)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, 0, use_orbax=False)
    with pytest.raises(ValueError):
        restore_checkpoint(ckpt, {"wrong": jnp.zeros(3)}, use_orbax=False)


def test_quantizer_report_rows():
    model, tx, state, _, _ = _state_and_step(steps=4)
    rows = quantizer_report({**state.params, **state.model_state})
    # QuantMLP(16, 4): 2 layers x (act_fq + weight_fq) = 4 quantizers
    assert len(rows) == 4
    paths = {r["path"] for r in rows}
    assert any("act_fq" in p for p in paths)
    assert any("weight_fq" in p for p in paths)
    for row in rows:
        assert row["scale_max"] >= row["scale_min"] > 0
        assert "current_batch" in row
    txt = format_report(rows)
    assert "act_fq" in txt and "scale[" in txt


def test_annotate_and_timer():
    with annotate("unit-test-span"):
        y = jnp.sum(jnp.ones((8, 8)))
    jax.block_until_ready(y)
    t = StepTimer(warmup=1)
    assert t.tick() is None          # warmup
    assert t.tick() is None          # clock start
    assert t.tick() is not None and t.tick() > 0


def test_restore_or_init(tmp_path):
    from jaxlsq.utils import restore_or_init

    model, tx, state, step, r = _state_and_step(steps=2)
    ckpt = str(tmp_path / "ckpt")

    def init_fn():
        return create_train_state(model, tx, jnp.zeros((4, 8)))

    fresh, restored = restore_or_init(ckpt, init_fn, use_orbax=False)
    assert restored == -1 and int(fresh.step) == 0

    save_checkpoint(ckpt, state, int(state.step), use_orbax=False)
    resumed, restored = restore_or_init(ckpt, init_fn, use_orbax=False)
    assert restored == int(state.step)
    np.testing.assert_array_equal(np.asarray(resumed.step),
                                  np.asarray(state.step))


def test_bf16_qat_training_step():
    """bf16 activations through the full QAT step (kernels accumulate f32)."""
    model, tx, state, step, r = _state_and_step(steps=0)
    batch = {"input": jnp.asarray(r.randn(4, 8), dtype=jnp.bfloat16),
             "label": jnp.asarray(r.randint(0, 4, size=4))}
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    for leaf in jax.tree.leaves(state.params["qparams"]):
        assert np.all(np.isfinite(np.asarray(leaf, dtype=np.float32)))


def test_serving_size_report():
    import dataclasses

    from jaxlsq.models import QuantMLP, default_qconfig
    from jaxlsq.serve import convert
    from jaxlsq.utils import serving_size_report

    qc = default_qconfig(8, 8, per_channel_weights=True, init_batches=0)
    model = QuantMLP(features=(64, 16), qconfig=qc)
    x0 = jnp.zeros((2, 32), jnp.float32)
    v = model.init(jax.random.key(0), x0, training=False)
    sv = convert(v, qc)
    rep = serving_size_report(sv)
    assert rep["packed_weights"] == 2
    # int8 kernels: ~4x smaller than f32 (scale/zp/bias/act qparams overheads)
    assert rep["compression"] > 2.5
    assert rep["total_bytes"] < rep["f32_equivalent_bytes"]


def test_load_torchlsq_state():
    """Reference torchlsq state_dicts (scale/shift + flag buffers) import
    into a jaxlsq variables tree; plain FakeQuantize zero_points fold via
    shift = -zp*scale (observers.py:366-368)."""
    from jaxlsq.models import QuantMLP, default_qconfig
    from jaxlsq.utils import load_torchlsq_state

    qc = default_qconfig(8, 8, per_channel_weights=True, init_batches=3)
    model = QuantMLP(features=(16, 4), qconfig=qc)
    v = model.init(jax.random.key(0), jnp.zeros((2, 8)), training=False)

    # synthetic reference state_dict (as numpy, like sd[k].numpy())
    sd = {
        "features.0.activation_post_process.scale": np.asarray([0.037]),
        "features.0.activation_post_process.shift": np.asarray([-0.5]),
        "features.0.activation_post_process.fake_quant_enabled":
            np.asarray([1], np.uint8),
        "features.0.activation_post_process.observer_enabled":
            np.asarray([0], np.uint8),
        "features.0.activation_post_process.current_batch":
            np.asarray([7], np.int64),
        # weight quantizer stored FakeQuantize-style: scale + zero_point
        "features.0.weight_fake_quant.scale":
            (0.01 + 0.001 * np.arange(16)).astype(np.float32),
        "features.0.weight_fake_quant.zero_point":
            np.zeros(16, np.int64),
    }
    out = load_torchlsq_state(v, sd, {
        "dense_0/act_fq": "features.0.activation_post_process",
        "dense_0/weight_fq": "features.0.weight_fake_quant",
    })
    aqp = out["qparams"]["dense_0"]["act_fq"]["qp"]
    np.testing.assert_allclose(np.asarray(aqp["scale"]), [0.037])
    np.testing.assert_allclose(np.asarray(aqp["shift"]), [-0.5])
    wqp = out["qparams"]["dense_0"]["weight_fq"]["qp"]
    assert wqp["scale"].shape == (16,)
    np.testing.assert_allclose(np.asarray(wqp["shift"]), np.zeros(16))
    qs = out["quant_state"]["dense_0"]["act_fq"]["qs"]
    assert not bool(qs["observer_enabled"])
    assert int(qs["current_batch"]) == 7
    # the imported model still runs
    y, _ = model.apply(out, jnp.ones((2, 8)), training=False,
                       mutable=["quant_state", "qparams"])
    assert np.all(np.isfinite(np.asarray(y)))


def test_load_torchlsq_state_shape_mismatch():
    from jaxlsq.models import QuantMLP, default_qconfig
    from jaxlsq.utils import load_torchlsq_state

    qc = default_qconfig(8, 8, per_channel_weights=True, init_batches=0)
    model = QuantMLP(features=(16, 4), qconfig=qc)
    v = model.init(jax.random.key(0), jnp.zeros((2, 8)), training=False)
    sd = {"m.scale": np.ones(5, np.float32)}  # wrong channel count
    import pytest as _pytest
    with _pytest.raises(ValueError, match="scale shape"):
        load_torchlsq_state(v, sd, {"dense_0/weight_fq": "m"})


def test_latest_step_ignores_stray_dirs(tmp_path):
    """ADVICE r1: step_tmp with a _COMPLETE marker must not break restore."""
    import os

    _, _, state, _, _ = _state_and_step(steps=1)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, 7, use_orbax=False)
    stray = tmp_path / "ckpt" / "step_tmp"
    stray.mkdir()
    (stray / "_COMPLETE").write_text("ok")
    assert latest_step(ckpt) == 7


class TestBNReestimation:
    """reestimate_batch_stats (utils/bn.py): refreshes ONLY batch_stats,
    under the final quantized forward, as one scan program."""

    def _setup(self):
        import numpy as np
        import jax
        import jax.numpy as jnp
        from flax import linen as nn

        from jaxlsq.models import QuantConv, default_qconfig

        qc = default_qconfig(8, 8, init_batches=1)

        class M(nn.Module):
            @nn.compact
            def __call__(self, x, *, training=False):
                x = QuantConv(8, (3, 3), qc, use_bias=False,
                              name="conv")(x, training=training)
                x = nn.BatchNorm(use_running_average=not training,
                                 name="bn")(x)
                return nn.relu(x)

        r = np.random.RandomState(0)
        x0 = jnp.asarray(r.randn(4, 8, 8, 3).astype(np.float32))
        m = M()
        v = m.init(jax.random.key(0), x0, training=False)
        return m, v, r

    def test_refreshes_stats_and_touches_nothing_else(self):
        import numpy as np
        import jax
        import jax.numpy as jnp

        from jaxlsq.utils import reestimate_batch_stats

        m, v, r = self._setup()
        # calibration batches with a SHIFTED distribution: the refreshed
        # mean must move toward the calibration mean
        xs = jnp.asarray(
            3.0 + r.randn(400, 4, 8, 8, 3).astype(np.float32))
        v2 = reestimate_batch_stats(m, v, xs)
        old_mean = v["batch_stats"]["bn"]["mean"]
        new_mean = v2["batch_stats"]["bn"]["mean"]
        assert not np.allclose(np.asarray(old_mean), np.asarray(new_mean))
        # everything outside batch_stats is byte-identical
        for col in v:
            if col == "batch_stats":
                continue
            a = jax.tree_util.tree_leaves(v[col])
            b = jax.tree_util.tree_leaves(v2[col])
            for la, lb in zip(a, b):
                np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        # quantizer window counters did NOT advance (writes were dropped)
        cb_old = v["quant_state"]["conv"]["act_fq"]["qs"]["current_batch"]
        cb_new = v2["quant_state"]["conv"]["act_fq"]["qs"]["current_batch"]
        assert int(cb_old) == int(cb_new)

    def test_converges_to_calibration_statistics(self):
        """After enough EMA steps on a FIXED batch, the running mean matches
        that batch's post-conv statistics (the exact target of the EMA)."""
        import numpy as np
        import jax.numpy as jnp

        from jaxlsq.utils import reestimate_batch_stats

        m, v, r = self._setup()
        x = jnp.asarray(r.randn(4, 8, 8, 3).astype(np.float32))
        xs = jnp.broadcast_to(x, (800,) + x.shape)
        v2 = reestimate_batch_stats(m, v, xs)
        v3 = reestimate_batch_stats(m, v2, xs)  # idempotent at the fixpoint
        np.testing.assert_allclose(
            np.asarray(v2["batch_stats"]["bn"]["mean"]),
            np.asarray(v3["batch_stats"]["bn"]["mean"]), rtol=1e-3, atol=1e-4)

    def test_noop_without_batch_stats(self):
        import jax.numpy as jnp

        from jaxlsq.models import QuantMLP, default_qconfig
        from jaxlsq.utils import reestimate_batch_stats

        qc = default_qconfig(8, 8, init_batches=1)
        m = QuantMLP(features=(8, 4), qconfig=qc)
        v = m.init(jax.random.key(0), jnp.ones((2, 6)), training=False)
        assert reestimate_batch_stats(m, v, jnp.ones((3, 2, 6))) is v
