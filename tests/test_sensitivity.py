"""Per-layer quantization sensitivity report (utils/sensitivity.py).

Mechanics pinned:
* scope enumeration covers every quantized layer (both granularities);
* flag rewiring is exact — with NO scopes enabled the loss equals the
  all-float (fake-quant-disabled) eval, with ALL scopes the all-quant eval;
* quant-only and leave-one-out are complementary: in a 2-layer model,
  quantizing only layer A equals leaving-out layer B;
* a deliberately damaged layer (scale forced tiny, saturating its weights)
  ranks as the most sensitive;
* the 2·L + 2 evaluations reuse ONE compiled program (flags are traced).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jaxlsq.models import QuantMLP, default_qconfig
from jaxlsq.models.toggles import disable_fake_quant, disable_observer
from jaxlsq.utils.sensitivity import (format_sensitivity, quantizer_scopes,
                                      sensitivity_report,
                                      set_fake_quant_by_scope)


@pytest.fixture(scope="module")
def setup():
    qc = default_qconfig(4, 4, init_batches=1)  # 4-bit: visible quant damage
    model = QuantMLP(features=(32, 16, 4), qconfig=qc)
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(64, 12).astype(np.float32))
    y = jnp.asarray(r.randint(0, 4, size=(64,)))
    variables = model.init(jax.random.key(0), x, training=False)
    return model, variables, {"input": x, "label": y}


def test_scope_enumeration(setup):
    model, variables, batch = setup
    layers = quantizer_scopes(variables, "layer")
    quants = quantizer_scopes(variables, "quantizer")
    assert len(layers) == 3  # one per QuantDense
    assert len(quants) >= len(layers)  # weight_fq + act_fq each
    assert all(q[:-1] in layers for q in quants)
    assert all(q[-1] in ("weight_fq", "act_fq") for q in quants)


def test_baselines_match_direct_toggles(setup):
    model, variables, batch = setup
    rep = sensitivity_report(model, variables, batch)

    from jaxlsq.parallel.train import cross_entropy_loss

    def direct(v):
        mutable = [k for k in v if k != "params"]
        logits, _ = model.apply(v, batch["input"], training=False,
                                mutable=mutable)
        return float(cross_entropy_loss(logits, batch))

    frozen = disable_observer(variables)
    np.testing.assert_allclose(rep["baseline_float"],
                               direct(disable_fake_quant(frozen)), rtol=1e-6)
    np.testing.assert_allclose(rep["baseline_quant"], direct(frozen),
                               rtol=1e-6)


def test_rows_cover_all_layers_and_are_consistent(setup):
    model, variables, batch = setup
    rep = sensitivity_report(model, variables, batch)
    assert len(rep["rows"]) == 3
    deltas = [r["quant_only_delta"] for r in rep["rows"]]
    assert deltas == sorted(deltas, reverse=True)
    for r in rep["rows"]:
        assert np.isfinite(r["quant_only"]) and np.isfinite(r["leave_one_out"])
    txt = format_sensitivity(rep)
    assert "quant-only" in txt and rep["rows"][0]["scope"] in txt


def test_quant_only_complements_leave_one_out():
    """Two quantized layers: quantizing ONLY layer A == leaving OUT layer B
    (identical flag assignments through different call paths)."""
    qc = default_qconfig(4, 4, init_batches=1)
    model = QuantMLP(features=(16, 4), qconfig=qc)
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(32, 8).astype(np.float32))
    y = jnp.asarray(r.randint(0, 4, size=(32,)))
    variables = model.init(jax.random.key(1), x, training=False)
    rep = sensitivity_report(model, variables, {"input": x, "label": y})
    assert len(rep["rows"]) == 2
    a, b = rep["rows"]
    np.testing.assert_allclose(a["quant_only"], b["leave_one_out"], rtol=1e-6)
    np.testing.assert_allclose(b["quant_only"], a["leave_one_out"], rtol=1e-6)


def test_damaged_layer_ranks_most_sensitive(setup):
    """Force one layer's weight scale to a huge value (its 4-bit weights
    round to zero): that layer must rank first on quant_only_delta and show
    the largest leave-one-out recovery.  The model is briefly TRAINED first
    — at random init every loss sits near ln(num_classes) and rankings are
    noise."""
    import optax

    from jaxlsq.parallel import create_train_state, make_train_step

    model, variables, batch = setup
    tx = optax.adam(5e-3)
    state = create_train_state(model, tx, batch["input"])
    step = make_train_step(model, tx)
    for _ in range(40):
        state, metrics = step(state, batch)
    variables = {**state.params, **state.model_state}
    layers = quantizer_scopes(variables, "layer")
    victim = layers[1]
    qp = variables["qparams"]
    node = qp
    for k in victim:
        node = node[k]
    bad_scale = jnp.full_like(node["weight_fq"]["qp"]["scale"], 100.0)
    new_qp = jax.tree.map(lambda a: a, qp)  # copy structure
    tgt = new_qp
    for k in victim:
        tgt = tgt[k]
    tgt["weight_fq"]["qp"]["scale"] = bad_scale
    damaged = {**variables, "qparams": new_qp}
    rep = sensitivity_report(model, damaged, batch)
    top = rep["rows"][0]
    assert top["scope"] == "/".join(victim)
    recoveries = [r["leave_one_out_recovery"] for r in rep["rows"]]
    assert top["leave_one_out_recovery"] == max(recoveries)


def test_set_fake_quant_by_scope_prefix_match(setup):
    model, variables, batch = setup
    layers = quantizer_scopes(variables, "layer")
    v = set_fake_quant_by_scope(variables, [layers[0]])

    def collect(tree, path, out):
        if isinstance(tree, dict):
            if "qs" in tree and isinstance(tree.get("qs"), dict) \
                    and "fake_quant_enabled" in tree["qs"]:
                out.append((path, bool(tree["qs"]["fake_quant_enabled"])))
                return
            for k, t in tree.items():
                collect(t, path + (k,), out)

    flags = []
    collect(v["quant_state"], (), flags)
    assert flags and all(
        on == (path[: len(layers[0])] == layers[0]) for path, on in flags)
