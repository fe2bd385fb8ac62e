"""BatchNorm statistics re-estimation after QAT.

QAT leaves ``batch_stats`` as a momentum-lagged EMA taken while the weights
(and the quantizer scales) were still moving; at convert time the frozen
network's activation statistics can sit measurably away from that EMA —
MobileNet-class nets (depthwise convs feeding BN) are the classic case.
Re-estimation runs the FINAL quantized network over calibration batches,
updating ONLY ``batch_stats`` (flax's mutable-collection gating drops the
quantizer writes: FakeQuantize only persists state into collections listed
in ``mutable``), so eval/convert see statistics consistent with the weights
that actually ship.

The reference has no BN handling at all (it quantizes tensors, not models —
SURVEY.md §2); this is standard QAT practice (e.g. "Data-Free Quantization"
/ QAT BN re-estimation in AI Model Efficiency Toolkit) implemented the TPU
way: the whole pass is ONE ``lax.scan`` program on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["reestimate_batch_stats"]


def reestimate_batch_stats(model, variables, inputs, *, jit: bool = True):
    """Refresh ``variables['batch_stats']`` by running ``model`` in training
    mode over ``inputs`` with only the BN collection mutable.

    Args:
      model: a flax module taking ``(x, training=...)`` (Quant* models and
        ``quantize_model`` wrappers alike).
      variables: trained variables containing 'batch_stats'.
      inputs: stacked calibration batches, shape (N, B, ...) — N scan steps.
        With BN's default EMA momentum 0.99, N >= ~300 leaves < 5% weight on
        the stale pre-refresh stats; pass more for exactness (N=500 → 0.7%).
      jit: wrap the scan in jax.jit (disable to compose with an outer pjit).

    Returns a NEW variables dict with the refreshed 'batch_stats' (every
    other collection untouched).
    """
    if "batch_stats" not in variables:
        return variables
    rest = {k: v for k, v in variables.items() if k != "batch_stats"}

    def run(bs0, xs):
        def step(bs, x):
            _, mut = model.apply({**rest, "batch_stats": bs}, x,
                                 training=True, mutable=["batch_stats"])
            return mut["batch_stats"], None

        bs, _ = jax.lax.scan(step, bs0, xs)
        return bs

    if jit:
        run = jax.jit(run)
    new_bs = run(variables["batch_stats"], inputs)
    return {**variables, "batch_stats": jax.tree.map(jnp.asarray, new_bs)}
