"""Post-training calibration (PTQ): the reference's "static estimate" mode
(observers.py:302-310 — plain FakeQuantize driven by the observer, no LSQ
learning) packaged as a one-call flow:

    variables = calibrate(model, variables, batches)   # observers track ranges
    serve_vars = jaxlsq.serve.convert(variables, qconfig)

Works on an untrained or float-trained model: every quantizer is switched to
static-estimate (learning off, observer on), the batches are run through the
model so the observers see real activation ranges and write qparams, and the
updated variables are returned with the quantizers left in static-estimate
state (call ``enable_param_learning_all`` to hand off to LSQ QAT instead of
converting).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable

import jax.numpy as jnp

from .toggles import map_quant_state

__all__ = ["calibrate", "set_static_estimate", "enable_param_learning_all"]


def set_static_estimate(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Flip every quantizer to static-estimate: observer on, LSQ learning off
    (observers.py:302-310).  Weight observers don't exist (weights use static
    init), so this effectively re-enables activation observers."""
    return map_quant_state(
        variables,
        lambda qs: {**qs,
                    "learning_enabled": jnp.asarray(False),
                    "observer_enabled": jnp.asarray(True)})


def enable_param_learning_all(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Flip every quantizer to full LSQ learning: observer off, no init window
    (observers.py:291-300)."""
    return map_quant_state(
        variables,
        lambda qs: {**qs,
                    "learning_enabled": jnp.asarray(True),
                    "observer_enabled": jnp.asarray(False),
                    "n_batches": jnp.asarray(-1, jnp.int32)})


def calibrate(model, variables: Dict[str, Any], batches: Iterable,
              *, input_key: str = "input") -> Dict[str, Any]:
    """Run calibration batches through ``model`` in static-estimate mode.

    Args:
      model: a flax module built from QuantDense/QuantConv (qat mode).
      variables: full variables dict ({'params', 'qparams', 'quant_state', ...}).
      batches: iterable of arrays, or dicts containing ``input_key``.

    Returns the variables with observer-tracked ranges folded into qparams.
    """
    variables = set_static_estimate(dict(variables))
    mutable = ["quant_state", "qparams"]
    if "batch_stats" in variables:
        mutable.append("batch_stats")
    for batch in batches:
        x = batch[input_key] if isinstance(batch, dict) else batch
        _, mut = model.apply(variables, x, training=False, mutable=mutable)
        variables = {**variables, **mut}
    return variables
