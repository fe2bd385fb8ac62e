"""Automatic mixed-precision planner (utils/mixed_precision.py).

Pins:
* requantize_qconfig rebuilds the weight spec at the target bits preserving
  signedness/symmetry/narrowing (the reference's avoid_torch_overflow,
  observers.py:225-242);
* learned-range transfer keeps the clip range: scale_4b * qmax_4b ==
  scale_8b * qmax_8b;
* budget endpoints: target == max bits -> everyone promoted, target == min
  bits -> nobody;
* an engineered-sensitive layer wins the promotion when the budget affords
  exactly one;
* the planned QConfig + planned variables reproduce the verified mixed loss,
  and convert() packs the mixed carriers end to end.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jaxlsq.models import QuantMLP, default_qconfig
from jaxlsq.utils.mixed_precision import (format_plan, plan_mixed_precision,
                                          requantize_qconfig)


def _set_weight_scale(variables, scope, value):
    qp = jax.tree.map(lambda a: a, variables["qparams"])
    node = qp
    for k in scope:
        node = node[k]
    node["weight_fq"]["qp"]["scale"] = jnp.full_like(
        node["weight_fq"]["qp"]["scale"], value)
    return {**variables, "qparams": qp}


@pytest.fixture(scope="module")
def setup():
    """Two-dense MLP where 'head' weights sit EXACTLY on the 4-bit grid
    (zero quantization damage at 4 and 8 bits) while 'dense_0' weights are
    random (heavy 4-bit damage): the planner must spend its budget on
    dense_0."""
    qc = default_qconfig(8, 8, init_batches=1)
    model = QuantMLP(features=(16, 4), qconfig=qc)
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(64, 8).astype(np.float32))
    y = jnp.asarray(r.randint(0, 4, size=(64,)))
    variables = model.init(jax.random.key(0), x, training=False)

    s8 = np.float32(0.05)
    variables = _set_weight_scale(variables, ("dense_0",), s8)
    variables = _set_weight_scale(variables, ("head",), s8)
    # head kernel on the 4-bit grid: codes in [-3, 3] so the 8-bit clip
    # range (+-63*s8 after reduce_range) also contains every point
    s4 = np.float32(s8 * np.float32(63.0 / 3.0))
    codes = r.randint(-3, 4, size=(16, 4)).astype(np.float32)
    params = jax.tree.map(lambda a: a, variables["params"])
    params["head"]["kernel"] = jnp.asarray(codes * s4)
    variables = {**variables, "params": params}
    return model, variables, {"input": x, "label": y}


def test_requantize_spec_fields():
    qc = default_qconfig(8, 8)
    q4 = requantize_qconfig(qc, 4)
    s = q4.weight.spec
    assert (s.quant_min, s.quant_max) == (-4, 3)   # narrowed to 3 bits
    assert (s.type_min, s.type_max) == (-8, 7)
    assert s.symmetric and not s.per_channel
    # activations untouched
    assert q4.activation.spec == qc.activation.spec
    # un-narrowed configs stay un-narrowed
    qf = default_qconfig(8, 8, reduce_range=False)
    s2 = requantize_qconfig(qf, 4).weight.spec
    assert (s2.quant_min, s2.quant_max) == (-8, 7)
    with pytest.raises(ValueError, match="weight"):
        requantize_qconfig(dataclasses.replace(qc, weight=None), 4)


def test_budget_endpoints(setup):
    model, variables, batch = setup
    hi = plan_mixed_precision(model, variables, batch, bit_options=(4, 8),
                              target_avg_bits=8.0, verify=False)
    assert set(hi["assignment"].values()) == {8}
    lo = plan_mixed_precision(model, variables, batch, bit_options=(4, 8),
                              target_avg_bits=4.0, verify=False)
    assert set(lo["assignment"].values()) == {4}
    assert lo["avg_bits"] <= 4.0 and hi["avg_bits"] <= 8.0
    with pytest.raises(ValueError, match="below the smallest"):
        plan_mixed_precision(model, variables, batch, bit_options=(4, 8),
                             target_avg_bits=3.0)
    with pytest.raises(ValueError, match="two bit_options"):
        plan_mixed_precision(model, variables, batch, bit_options=(8,),
                             target_avg_bits=8.0)


def test_sensitive_layer_wins_the_budget(setup):
    model, variables, batch = setup
    # numels: dense_0 8*16=128, head 16*4=64, total 192.  Budget for ONE
    # promotion of dense_0 (extra 4*128): avg 4 + 4*128/192 = 6.67; use 7.0
    # (room for dense_0, or head+slack -- gain decides, and dense_0's
    # 4-bit damage dwarfs head's ~zero).
    plan = plan_mixed_precision(model, variables, batch, bit_options=(4, 8),
                                target_avg_bits=7.0)
    assert plan["assignment"]["dense_0"] == 8
    # grid-aligned head has ~no 4->8 gain; the leftover budget (64*4 fits:
    # spent 8*128+4*64=1280 <= 7*192=1344... promoting head too would cost
    # 8*192=1536 > 1344) cannot buy it anyway
    assert plan["assignment"]["head"] == 4
    assert plan["avg_bits"] <= 7.0
    # engineered damage ordering: dense_0's 4-bit damage dominates
    rows = {r["scope"]: r for r in plan["rows"]}
    assert rows["dense_0"]["damage_4b"] > rows["head"]["damage_4b"] + 0.05
    # on-grid head: the WEIGHT contributes no damage at either width, so the
    # quant-only delta (which includes its bit-independent act_fq effect) is
    # identical at 4 and 8 bits — zero promotion gain
    np.testing.assert_allclose(rows["head"]["damage_4b"],
                               rows["head"]["damage_8b"], atol=1e-6)
    txt = format_plan(plan)
    assert "dense_0" in txt and "head" in txt


def test_range_transfer_preserves_clip_range(setup):
    model, variables, batch = setup
    plan = plan_mixed_precision(model, variables, batch, bit_options=(4, 8),
                                target_avg_bits=4.0)
    vp = plan["planned_variables"]
    s8 = float(variables["qparams"]["dense_0"]["weight_fq"]["qp"]["scale"][0])
    s4 = float(vp["qparams"]["dense_0"]["weight_fq"]["qp"]["scale"][0])
    np.testing.assert_allclose(s4 * 3.0, s8 * 63.0, rtol=1e-6)


def test_planned_loss_matches_direct_eval(setup):
    from jaxlsq.parallel.train import cross_entropy_loss

    model, variables, batch = setup
    plan = plan_mixed_precision(model, variables, batch, bit_options=(4, 8),
                                target_avg_bits=7.0)
    mixed_model = dataclasses.replace(model, qconfig=plan["qconfig"])
    vp = plan["planned_variables"]
    mutable = [k for k in vp if k != "params"]
    logits, _ = mixed_model.apply(vp, batch["input"], training=False,
                                  mutable=mutable)
    np.testing.assert_allclose(plan["planned_quant_loss"],
                               float(cross_entropy_loss(logits, batch)),
                               rtol=1e-6)
    # the mixed pick can't be worse than uniform-4 on the eval batch
    assert plan["planned_quant_loss"] <= plan["uniform"][4] + 1e-6


def test_convert_packs_mixed_carriers(setup):
    from jaxlsq.serve import convert

    model, variables, batch = setup
    plan = plan_mixed_precision(model, variables, batch, bit_options=(4, 8),
                                target_avg_bits=7.0)
    sv = convert(plan["planned_variables"], plan["qconfig"])
    assert sv["quantized"]["dense_0"]["kernel"].bits == 8
    assert sv["quantized"]["head"]["kernel"].bits == 4
    sm = dataclasses.replace(model,
                             qconfig=plan["qconfig"].for_serving("none",
                                                                 "auto"))
    out = sm.apply(sv, batch["input"], training=False)
    assert np.isfinite(np.asarray(out)).all()
