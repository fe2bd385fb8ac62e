"""Per-layer quantization sensitivity analysis.

The mixed-precision diagnostic a production QAT/PTQ flow runs before choosing
per-layer bit widths: for every quantized layer, measure the eval-loss damage
of (a) quantizing ONLY that layer ("quant-only" — its isolated contribution)
and (b) quantizing everything EXCEPT it ("leave-one-out" — how much restoring
that one layer to float recovers).  Layers whose quant-only delta is large /
whose leave-one-out recovery is large are the sensitive ones to keep at
higher precision.

The reference has no such tool (its togglers flip the whole model,
quantized/__init__.py:5-35); this uses the same ``quant_state`` flag
machinery at per-layer granularity.  All variants share ONE compiled
evaluation: ``fake_quant_enabled`` flags are traced bool arrays, so the
2·L + 2 evaluations reuse a single jit program with different flag values.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["quantizer_scopes", "set_fake_quant_by_scope",
           "sensitivity_report", "format_sensitivity"]


def _is_qs(tree) -> bool:
    return (isinstance(tree, dict) and "qs" in tree
            and isinstance(tree["qs"], dict)
            and "fake_quant_enabled" in tree["qs"])


def quantizer_scopes(variables: Dict[str, Any],
                     granularity: str = "layer") -> List[Tuple[str, ...]]:
    """Paths of quantized scopes inside the ``quant_state`` collection.

    ``granularity='layer'`` groups a layer's weight/act quantizers into one
    scope (the parent module path, e.g. ``('blocks_0', 'mlp_up')``);
    ``'quantizer'`` lists each quantizer (``(..., 'weight_fq')``) separately.
    """
    if granularity not in ("layer", "quantizer"):
        raise ValueError("granularity must be 'layer' or 'quantizer'")
    found: List[Tuple[str, ...]] = []

    def walk(tree, path):
        if not isinstance(tree, dict):
            return
        if _is_qs(tree):
            scope = path if granularity == "quantizer" else path[:-1]
            if scope not in found:
                found.append(scope)
            return
        for k, v in tree.items():
            walk(v, path + (k,))

    walk(variables.get("quant_state", {}), ())
    return found


def set_fake_quant_by_scope(variables: Dict[str, Any],
                            enabled_scopes: List[Tuple[str, ...]]
                            ) -> Dict[str, Any]:
    """Variables with ``fake_quant_enabled=True`` exactly for quantizers
    under one of ``enabled_scopes`` (prefix match) and False elsewhere."""
    scopes = [tuple(s) for s in enabled_scopes]

    def walk(tree, path):
        if _is_qs(tree):
            on = any(path[: len(s)] == s for s in scopes)
            return {**tree, "qs": {**tree["qs"],
                                   "fake_quant_enabled": jnp.asarray(on)}}
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return tree

    if "quant_state" not in variables:
        return variables
    return {**variables,
            "quant_state": walk(variables["quant_state"], ())}


def sensitivity_report(model, variables: Dict[str, Any], batch,
                       *, loss_fn: Optional[Callable] = None,
                       input_key: str = "input",
                       granularity: str = "layer") -> Dict[str, Any]:
    """Per-scope quantization sensitivity on one eval batch.

    Args:
      model: the QAT model (applied with ``training=False``).
      variables: trained variables (params + qparams + quant_state...).
      batch: dict with ``input_key`` and whatever ``loss_fn`` needs.
      loss_fn: ``(logits, batch) -> scalar``; defaults to integer-label
        cross entropy on ``batch['label']``.

    Returns ``{"baseline_float", "baseline_quant", "rows"}`` where each row
    is ``{scope, quant_only, quant_only_delta, leave_one_out,
    leave_one_out_recovery}`` — deltas vs the float baseline, recovery =
    baseline_quant − leave_one_out (how much turning JUST this scope back to
    float helps).  Rows are sorted most-sensitive first (by quant_only_delta).
    """
    if loss_fn is None:
        from ..parallel.train import cross_entropy_loss

        loss_fn = cross_entropy_loss
    # Freeze the trained qparams: an ENABLED observer re-derives scale/shift
    # from whatever batch it sees (reference discipline, observers.py:446-449)
    # — sensitivity must evaluate the TRAINED quantizers, not recalibrate.
    from ..models.toggles import disable_observer

    variables = disable_observer(variables)
    scopes = quantizer_scopes(variables, granularity)
    if not scopes:
        raise ValueError("no quantizers found in variables['quant_state']")

    mutable = [k for k in variables if k != "params"]

    @jax.jit
    def eval_loss(v, batch):
        out = model.apply(v, batch[input_key], training=False,
                          mutable=mutable)
        logits = out[0] if mutable else out
        return loss_fn(logits, batch)

    def run(enabled):
        return float(eval_loss(set_fake_quant_by_scope(variables, enabled),
                               batch))

    baseline_float = run([])
    baseline_quant = run(scopes)
    rows = []
    for s in scopes:
        only = run([s])
        loo = run([t for t in scopes if t != s])
        rows.append({
            "scope": "/".join(s) or "<root>",
            "quant_only": only,
            "quant_only_delta": only - baseline_float,
            "leave_one_out": loo,
            "leave_one_out_recovery": baseline_quant - loo,
        })
    rows.sort(key=lambda r: r["quant_only_delta"], reverse=True)
    return {"baseline_float": baseline_float,
            "baseline_quant": baseline_quant, "rows": rows}


def format_sensitivity(report: Dict[str, Any]) -> str:
    lines = [
        f"float loss {report['baseline_float']:.6f}   "
        f"all-quant loss {report['baseline_quant']:.6f}",
        f"{'scope':<40} {'quant-only Δ':>14} {'leave-1-out recovery':>22}",
    ]
    for r in report["rows"]:
        lines.append(f"{r['scope']:<40} {r['quant_only_delta']:>14.6f} "
                     f"{r['leave_one_out_recovery']:>22.6f}")
    return "\n".join(lines)
