"""quantize_model (models/quantize.py): prepare_qat-style drop-in
quantization of STOCK flax models (VERDICT r3 next-#4).

The done-criterion test: an externally-authored flax model (plain nn.Dense /
nn.Conv / nn.Embed — no jaxlsq imports in its definition) goes through
QAT -> convert -> serving with BIT-parity against the hand-built Quant*
equivalent.  Parity is by construction (the interceptor reroutes stock
layers through the same dense_apply/conv_apply/embed_apply bodies the Quant*
layers call), and these tests pin it.

Reference seam: observers.py:69-70 (LSQFakeQuantizer subclasses torch's
ObserverBase so prepare_qat can insert it into any model) + README.md:103-126
(the drop-in integration claim)."""

import dataclasses

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from jaxlsq.models import (QuantCNN, QuantMLP, default_qconfig,
                           quantize_model)
from jaxlsq.parallel import create_train_state, make_train_step
from jaxlsq.serve import convert


# --- externally-authored models: NOTHING from jaxlsq in their definitions --

class StockMLP(nn.Module):
    features: tuple = (16, 16, 4)

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features[:-1]):
            x = nn.Dense(f, name=f"dense_{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.features[-1], name="head")(x)


class StockCNN(nn.Module):
    num_classes: int = 4
    widths: tuple = (8, 16)

    @nn.compact
    def __call__(self, x):
        for i, w in enumerate(self.widths):
            x = nn.Conv(w, (3, 3), name=f"conv_{i}")(x)
            x = nn.relu(x)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape((x.shape[0], -1))
        return nn.Dense(self.num_classes, name="head")(x)


class StockSetupModel(nn.Module):
    """setup-style (non-compact) authoring also gets intercepted."""

    def setup(self):
        self.embed = nn.Embed(32, 16,
                              embedding_init=nn.initializers.normal(0.02))
        self.out = nn.Dense(8)

    def __call__(self, tokens):
        return self.out(self.embed(tokens).mean(axis=1))


def _tree_equal(a, b, msg=""):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(fa) == len(fb), (msg, [p for p, _ in fa], list(fb))
    for path, leaf in fa:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(fb[path]),
            err_msg=f"{msg}:{jax.tree_util.keystr(path)}")


@pytest.fixture(scope="module")
def mlp_pair():
    qc = default_qconfig(8, 8, init_batches=2, per_channel_weights=True)
    stock = quantize_model(StockMLP(), qc)
    hand = QuantMLP(features=(16, 16, 4), qconfig=qc)
    x = jnp.asarray(np.random.RandomState(0).randn(8, 12).astype(np.float32))
    return qc, stock, hand, x


class TestBitParity:
    def test_init_identical(self, mlp_pair):
        qc, stock, hand, x = mlp_pair
        vs = stock.init(jax.random.key(0), x, training=False)
        vh = hand.init(jax.random.key(0), x, training=False)
        _tree_equal(vs, vh, "init")

    def test_qat_train_steps_identical(self, mlp_pair):
        """3 adamw steps through make_train_step: every state leaf equal."""
        qc, stock, hand, x = mlp_pair
        r = np.random.RandomState(1)
        batches = [{"input": jnp.asarray(r.randn(8, 12).astype(np.float32)),
                    "label": jnp.asarray(r.randint(0, 4, (8,)))}
                   for _ in range(3)]
        tx = optax.adamw(1e-2)
        ss = create_train_state(stock, tx, x)
        sh = create_train_state(hand, tx, x)
        step_s = make_train_step(stock, tx)
        step_h = make_train_step(hand, tx)
        for b in batches:
            ss, ms = step_s(ss, b)
            sh, mh = step_h(sh, b)
            assert float(ms["loss"]) == float(mh["loss"])
        _tree_equal(ss.params, sh.params, "params-after-train")
        _tree_equal(ss.model_state, sh.model_state, "state-after-train")

    def test_convert_and_serving_identical(self, mlp_pair):
        """QAT vars -> convert -> serve-mode apply: bit-equal logits, and
        the packed kernels really are int8."""
        qc, stock, hand, x = mlp_pair
        vs = stock.init(jax.random.key(0), x, training=False)
        sv_s = convert(vs, qc)
        sv_h = convert(hand.init(jax.random.key(0), x, training=False), qc)
        _tree_equal(sv_s, sv_h, "converted")
        sqc = qc.for_serving("static", "xla")
        sstock = quantize_model(StockMLP(), sqc)
        shand = QuantMLP(features=(16, 16, 4), qconfig=sqc)
        ys = sstock.apply(sv_s, x, training=False)
        yh = shand.apply(sv_h, x, training=False)
        np.testing.assert_array_equal(np.asarray(ys), np.asarray(yh))
        assert sv_s["quantized"]["dense_0"]["kernel"].data.dtype == jnp.int8

    def test_cnn_parity(self):
        qc = default_qconfig(8, 8, init_batches=1)
        stock = quantize_model(StockCNN(), qc)
        hand = QuantCNN(num_classes=4, qconfig=qc, widths=(8, 16))
        x = jnp.asarray(
            np.random.RandomState(2).randn(2, 8, 8, 3).astype(np.float32))
        vs = stock.init(jax.random.key(0), x, training=False)
        vh = hand.init(jax.random.key(0), x, training=False)
        _tree_equal(vs, vh, "cnn-init")
        ys, muts = stock.apply(vs, x, training=True,
                               mutable=["quant_state", "qparams"])
        yh, muth = hand.apply(vh, x, training=True,
                              mutable=["quant_state", "qparams"])
        np.testing.assert_array_equal(np.asarray(ys), np.asarray(yh))
        _tree_equal(muts, muth, "cnn-mutated")


class TestDropIn:
    def test_float_checkpoint_restores_directly(self, mlp_pair):
        """The prepare_qat promise: a pretrained FLOAT checkpoint loads into
        the quantized model unchanged (params tree is identical)."""
        qc, stock, hand, x = mlp_pair
        float_vars = StockMLP().init(jax.random.key(7), x)
        qvars = stock.init(jax.random.key(0), x, training=False)
        assert (jax.tree.map(lambda a: a.shape, float_vars["params"])
                == jax.tree.map(lambda a: a.shape, qvars["params"]))
        merged = dict(qvars, params=float_vars["params"])
        y, _ = stock.apply(merged, x, training=True,
                           mutable=["quant_state", "qparams"])
        assert np.all(np.isfinite(np.asarray(y)))

    def test_setup_style_model_and_embed(self):
        qc = default_qconfig(8, 8, init_batches=1)
        qm = quantize_model(StockSetupModel(), qc)
        toks = jnp.asarray(np.random.RandomState(3).randint(0, 32, (4, 6)))
        v = qm.init(jax.random.key(0), toks, training=False)
        # embedding table got a weight quantizer; dense got act + weight
        assert "weight_fq" in v["qparams"]["embed"]
        assert "act_fq" in v["qparams"]["out"]
        sv = convert(v, qc)
        sqm = quantize_model(StockSetupModel(), qc.for_serving("none", "xla"))
        y = sqm.apply(sv, toks, training=False)
        assert y.shape == (4, 8)
        assert sv["quantized"]["embed"]["embedding"].data.dtype == jnp.int8

    def test_observer_window_advances_only_in_training(self, mlp_pair):
        qc, stock, hand, x = mlp_pair
        v = stock.init(jax.random.key(0), x, training=False)
        _, mut = stock.apply(v, x, training=True,
                             mutable=["quant_state", "qparams"])
        cb = mut["quant_state"]["dense_0"]["act_fq"]["qs"]["current_batch"]
        assert int(cb) == 1
        _, mut = stock.apply(v, x, training=False,
                             mutable=["quant_state", "qparams"])
        cb = mut["quant_state"]["dense_0"]["act_fq"]["qs"]["current_batch"]
        assert int(cb) == 0

    def test_skip_patterns_keep_layers_float(self):
        qc = default_qconfig(8, 8, init_batches=1)
        qm = quantize_model(StockMLP(), qc, skip=("head",))
        x = jnp.ones((2, 12))
        v = qm.init(jax.random.key(0), x, training=False)
        assert "head" not in v["qparams"]
        assert "head" in v["params"]        # still there, still float
        assert "dense_0" in v["qparams"]

    def test_mixed_precision_overrides_compose(self):
        qc = default_qconfig(4, 8, init_batches=1).with_overrides(
            {"head": default_qconfig(8, 8, init_batches=1)})
        qm = quantize_model(StockMLP(), qc)
        x = jnp.ones((2, 12))
        v = qm.init(jax.random.key(0), x, training=False)
        sv = convert(v, qc)
        assert sv["quantized"]["head"]["kernel"].bits == 8
        assert sv["quantized"]["dense_0"]["kernel"].bits == 4


class TestDenseGeneral:
    """nn.DenseGeneral support (models/layers.py::densegeneral_apply):
    QAT on the flattened (K, N) view, stock kernel layout preserved, the
    `dg_flat` marker routes convert to pack the 2-D view."""

    class StockDG(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.DenseGeneral((4, 2), axis=(1, 2), name="dg")(x)

    class HandDG(nn.Module):
        qc: object

        @nn.compact
        def __call__(self, x, *, training=False):
            from jaxlsq.models import QuantDenseGeneral
            return QuantDenseGeneral((4, 2), qconfig=self.qc, axis=(1, 2),
                                     name="dg")(x, training=training)

    class ManualFlat(nn.Module):
        """The same contraction hand-lowered to a QuantDense on the
        flattened view — pins the numeric contract of the DG path."""
        qc: object

        @nn.compact
        def __call__(self, x, *, training=False):
            from jaxlsq.models import QuantDense
            b = x.shape[0]
            x2 = jnp.moveaxis(x, (1, 2), (2, 3)).reshape(b, x.shape[3], 15)
            y2 = QuantDense(8, qconfig=self.qc, name="dg")(
                x2, training=training)
            return y2.reshape(b, x.shape[3], 4, 2)

    @pytest.fixture(scope="class")
    def dg_env(self):
        qc = default_qconfig(8, 8, init_batches=1, per_channel_weights=True)
        x = jnp.asarray(
            np.random.RandomState(5).randn(2, 3, 5, 7).astype(np.float32))
        return qc, x

    def test_intercepted_equals_hand_built(self, dg_env):
        qc, x = dg_env
        stock = quantize_model(self.StockDG(), qc)
        hand = self.HandDG(qc)
        vs = stock.init(jax.random.key(0), x, training=False)
        vh = hand.init(jax.random.key(0), x, training=False)
        _tree_equal(vs, vh, "dg-init")
        ys, ms = stock.apply(vs, x, training=True,
                             mutable=["quant_state", "qparams"])
        yh, mh = hand.apply(vh, x, training=True,
                            mutable=["quant_state", "qparams"])
        np.testing.assert_array_equal(np.asarray(ys), np.asarray(yh))
        _tree_equal(ms, mh, "dg-mutated")

    def test_matches_manual_flatten_bit_for_bit(self, dg_env):
        """Multi-axis DG == moveaxis+reshape+QuantDense, QAT and serving."""
        qc, x = dg_env
        stock = quantize_model(self.StockDG(), qc)
        manual = self.ManualFlat(qc)
        vs = stock.init(jax.random.key(0), x, training=False)
        vm = manual.init(jax.random.key(0), x, training=False)
        ys, _ = stock.apply(vs, x, training=True,
                            mutable=["quant_state", "qparams"])
        ym, _ = manual.apply(vm, x, training=True,
                             mutable=["quant_state", "qparams"])
        assert ys.shape == (2, 7, 4, 2)
        np.testing.assert_array_equal(np.asarray(ys), np.asarray(ym))
        # serving: dg_flat marker makes convert pack the same (15, 8) view
        sv_s, sv_m = convert(vs, qc), convert(vm, qc)
        assert sv_s["quantized"]["dg"]["kernel"].data.shape == (15, 8)
        np.testing.assert_array_equal(
            np.asarray(sv_s["quantized"]["dg"]["kernel"].data),
            np.asarray(sv_m["quantized"]["dg"]["kernel"].data))
        sqc = qc.for_serving("static", "xla")
        ys = quantize_model(self.StockDG(), sqc).apply(sv_s, x,
                                                       training=False)
        ym = self.ManualFlat(sqc).apply(sv_m, x, training=False)
        np.testing.assert_array_equal(np.asarray(ys), np.asarray(ym))
        assert sv_s["quantized"]["dg"]["kernel"].data.dtype == jnp.int8

    def test_float_checkpoint_restores_directly(self, dg_env):
        """Stock kernel layout (*in_axes, *features) is preserved, so float
        DenseGeneral checkpoints restore unchanged."""
        qc, x = dg_env
        float_vars = self.StockDG().init(jax.random.key(3), x)
        stock = quantize_model(self.StockDG(), qc)
        qvars = stock.init(jax.random.key(0), x, training=False)
        assert (jax.tree.map(lambda a: a.shape, float_vars["params"])
                == jax.tree.map(lambda a: a.shape, qvars["params"]))
        assert qvars["params"]["dg"]["kernel"].shape == (3, 5, 4, 2)
        merged = dict(qvars, params=float_vars["params"])
        y, _ = stock.apply(merged, x, training=True,
                           mutable=["quant_state", "qparams"])
        assert np.all(np.isfinite(np.asarray(y)))

    def test_batch_dims_rejected(self):
        class BatchedDG(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.DenseGeneral(4, axis=-1, batch_dims=(0,),
                                       name="bdg")(x)

        qc = default_qconfig(8, 8)
        qm = quantize_model(BatchedDG(), qc)
        with pytest.raises(ValueError, match="batch_dims"):
            qm.init(jax.random.key(0), jnp.ones((2, 3, 8)), training=False)
        # ... but skip keeps it float and running
        qm = quantize_model(BatchedDG(), qc, skip=("bdg",))
        v = qm.init(jax.random.key(0), jnp.ones((2, 3, 8)), training=False)
        assert "qparams" not in v


class TestUnsupported:
    class WithConvTranspose(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.ConvTranspose(4, (3, 3), name="ct")(x)

    def test_unsupported_parametric_layer_raises(self):
        qc = default_qconfig(8, 8)
        qm = quantize_model(self.WithConvTranspose(), qc)
        with pytest.raises(ValueError, match="ConvTranspose"):
            qm.init(jax.random.key(0), jnp.ones((1, 8, 8, 3)),
                    training=False)

    def test_unsupported_layer_skippable(self):
        qc = default_qconfig(8, 8)
        qm = quantize_model(self.WithConvTranspose(), qc, skip=("ct",))
        v = qm.init(jax.random.key(0), jnp.ones((1, 8, 8, 3)),
                    training=False)
        assert "qparams" not in v  # nothing quantized, but it runs

    def test_dilated_conv_raises_with_path(self):
        class Dilated(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.Conv(4, (3, 3), kernel_dilation=(2, 2),
                               name="dil")(x)

        qc = default_qconfig(8, 8)
        qm = quantize_model(Dilated(), qc)
        with pytest.raises(ValueError, match="dil"):
            qm.init(jax.random.key(0), jnp.ones((1, 8, 8, 3)),
                    training=False)
