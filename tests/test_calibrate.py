"""PTQ calibration flow tests (static-estimate mode, observers.py:302-310)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from jaxlsq.models import (QuantMLP, calibrate, default_qconfig,
                           enable_param_learning_all, set_static_estimate)
from jaxlsq.serve import convert


def _setup():
    qc = default_qconfig(8, 8, init_batches=5)
    model = QuantMLP(features=(16, 4), qconfig=qc)
    r = np.random.RandomState(0)
    x0 = jnp.asarray(r.randn(4, 8).astype(np.float32))
    variables = model.init(jax.random.key(0), x0, training=False)
    return model, qc, variables, r


def test_calibrate_tracks_ranges_without_learning():
    model, qc, variables, r = _setup()
    qp_before = jax.tree.map(np.asarray, variables["qparams"])
    batches = [jnp.asarray(3.0 * r.randn(4, 8).astype(np.float32))
               for _ in range(4)]
    out = calibrate(model, variables, batches)

    # observers saw data → activation qparams moved
    a_before = qp_before["dense_0"]["act_fq"]["qp"]["scale"]
    a_after = np.asarray(out["qparams"]["dense_0"]["act_fq"]["qp"]["scale"])
    assert not np.allclose(a_before, a_after)

    # observer state advanced; learning stayed off
    qs = out["quant_state"]["dense_0"]["act_fq"]["qs"]
    seen0 = int(variables["quant_state"]["dense_0"]["act_fq"]["qs"]["obs"].seen)
    assert int(qs["obs"].seen) == seen0 + 4  # one update per calib batch
    assert not bool(qs["learning_enabled"])
    assert bool(qs["observer_enabled"])


def test_calibrate_then_convert_runs():
    from jaxlsq.models import disable_observer

    model, qc, variables, r = _setup()
    batches = [jnp.asarray(r.randn(4, 8).astype(np.float32))
               for _ in range(3)]
    out = calibrate(model, variables, batches)
    # freeze observers before the serving handoff: in static-estimate mode
    # they keep tracking (and rewriting qparams) on every forward, like the
    # reference until disable_observer (observers.py:446-449)
    out = disable_observer(out)
    sv = convert(out, qc)
    sm = dataclasses.replace(model, qconfig=qc.for_serving("static", "xla"))
    y = sm.apply(sv, batches[0], training=False)
    assert np.all(np.isfinite(np.asarray(y)))

    # PTQ parity: serving == calibrated model's eval fake-quant output
    want, _ = model.apply(out, batches[0], training=False,
                          mutable=["quant_state", "qparams"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_calibrate_then_qat_handoff():
    """PTQ-init → LSQ QAT: enable_param_learning_all flips the whole model to
    learning with no further observer writes."""
    model, qc, variables, r = _setup()
    out = calibrate(model, variables,
                    [jnp.asarray(r.randn(4, 8).astype(np.float32))])
    out = enable_param_learning_all(out)
    qs = out["quant_state"]["dense_0"]["act_fq"]["qs"]
    assert bool(qs["learning_enabled"])
    assert not bool(qs["observer_enabled"])
    assert int(qs["n_batches"]) == -1  # no init window on handoff

    # one training forward: qparams must stay put except via gradients
    qp0 = np.asarray(out["qparams"]["dense_0"]["act_fq"]["qp"]["scale"])
    _, mut = model.apply(out, jnp.ones((4, 8)), training=True,
                         mutable=["quant_state", "qparams"])
    qp1 = np.asarray(mut["qparams"]["dense_0"]["act_fq"]["qp"]["scale"])
    np.testing.assert_array_equal(qp0, qp1)  # no observer overwrite
