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


class TestUnsupported:
    class WithDenseGeneral(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.DenseGeneral((4, 2), name="dg")(x)

    def test_unsupported_parametric_layer_raises(self):
        qc = default_qconfig(8, 8)
        qm = quantize_model(self.WithDenseGeneral(), qc)
        with pytest.raises(ValueError, match="DenseGeneral"):
            qm.init(jax.random.key(0), jnp.ones((2, 8)), training=False)

    def test_unsupported_layer_skippable(self):
        qc = default_qconfig(8, 8)
        qm = quantize_model(self.WithDenseGeneral(), qc, skip=("dg",))
        v = qm.init(jax.random.key(0), jnp.ones((2, 8)), training=False)
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
