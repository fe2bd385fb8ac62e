"""Automatic mixed-precision planning: sensitivity → per-layer bit widths.

``plan_mixed_precision`` closes the loop the reference leaves to the user: its
QConfig applies ONE bit width to the whole model (observers.py:164-242 —
``quant_min/quant_max`` fixed at construction; README.md:103-126 recommends a
single global setup), so choosing which layers can afford 4-bit weights is a
manual exercise.  Here the planner measures, for every quantized scope and
every candidate weight bit width, the eval-loss damage of quantizing ONLY that
scope ("quant-only" sensitivity, same protocol as
:mod:`jaxlsq.utils.sensitivity`), then greedily assigns bit widths to maximize
damage reduction per extra weight byte under an average-bits budget — the
classic Pareto/knapsack mixed-precision search (HAWQ-style greedy, measured
rather than Hessian-approximated).  The output is a ready-to-use
``QConfig.with_overrides`` config (jaxlsq/models/qconfig.py) for mixed-
precision QAT fine-tuning and ``jaxlsq.serve.convert`` packing.

TPU-shaped like the sensitivity report: ``fake_quant_enabled`` flags are
traced bool arrays, so ALL quant-only evaluations at one bit width share a
single compiled program — the search costs ``len(bit_options)`` compiles (one
more with verification), not ``len(scopes) x len(bit_options)``.

Cross-bit evaluation uses LEARNED-range transfer: a scope trained at ``b0``
bits has clip range ``R = scale_b0 * quant_max_b0``; evaluating it at ``b``
bits keeps R fixed and coarsens the step (``scale_b = scale_b0 *
quant_max_b0 / quant_max_b``).  This is the standard zero-shot proxy — the
plan's QConfig is meant to be fine-tuned with a short QAT run, which the
LSQ machinery then adapts (scales are learned parameters).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .sensitivity import quantizer_scopes, set_fake_quant_by_scope

__all__ = ["plan_mixed_precision", "requantize_qconfig", "format_plan"]


def requantize_qconfig(qconfig, weight_bits: int):
    """``qconfig`` with its WEIGHT spec rebuilt at ``weight_bits`` (same
    signedness/symmetry/per-channel layout; range narrowing — the reference's
    ``avoid_torch_overflow``, observers.py:225-242 — is preserved as
    ``weight_bits - 1`` when the source spec is narrowed).  Activations are
    untouched: the serving carriers (int8/int4 packed kernels) make WEIGHT
    bits the memory knob, and activation specs pin the runtime act path."""
    from ..core.spec import QuantSpec

    if qconfig.weight is None:
        raise ValueError("qconfig has no weight quantizer to requantize")
    s = qconfig.weight.spec
    narrowed = s.quant_max < s.type_max or s.quant_min > s.type_min
    new_spec = QuantSpec.make(
        weight_bits,
        signed=s.type_min < 0,
        symmetric=s.symmetric,
        per_channel=s.per_channel,
        axis=s.axis,
        narrow_to_bits=weight_bits - 1 if narrowed else None,
        use_grad_scaling=s.use_grad_scaling,
        grad_scaler=s.grad_scaler,
    )
    return dataclasses.replace(
        qconfig, weight=dataclasses.replace(qconfig.weight, spec=new_spec))


def _weight_numel(params: Dict[str, Any], scope: Tuple[str, ...]) -> int:
    """Packed-weight parameter count under ``scope``: 'kernel'/'embedding'
    leaves (the tensors ``jaxlsq.serve.convert`` packs to int carriers;
    biases stay float and do not count against the bit budget)."""
    tree = params
    for k in scope:
        if not isinstance(tree, dict) or k not in tree:
            return 0
        tree = tree[k]
    total = 0

    def walk(t, name):
        nonlocal total
        if isinstance(t, dict):
            for k, v in t.items():
                walk(v, k)
        elif name in ("kernel", "embedding"):
            total += int(t.size)

    walk(tree, scope[-1] if scope else "")
    return total


def _rescale_weight_scales(variables: Dict[str, Any], factor_for_scope,
                           ) -> Dict[str, Any]:
    """``qparams`` (the learned scale/shift collection, layers.py:85-98) with
    every ``weight_fq`` scale multiplied by the scope's learned-range
    transfer factor (``factor_for_scope(scope_path) -> float``; 1.0 leaves
    it untouched).  Weight quantizers are symmetric by construction
    (quantizer.py enforces it) and their shift is ~0, so only the scale
    moves."""

    def walk(tree, path):
        if not isinstance(tree, dict):
            return tree
        if "qp" in tree and isinstance(tree["qp"], dict) \
                and "scale" in tree["qp"]:
            if path and path[-1] == "weight_fq":
                f = float(factor_for_scope(path[:-1]))
                if f != 1.0:
                    qp = dict(tree["qp"])
                    qp["scale"] = qp["scale"] * jnp.float32(f)
                    return {**tree, "qp": qp}
            return tree
        return {k: walk(v, path + (k,)) for k, v in tree.items()}

    if "qparams" not in variables:
        return variables
    return {**variables, "qparams": walk(variables["qparams"], ())}


def plan_mixed_precision(model, variables: Dict[str, Any], batch, *,
                         bit_options: Sequence[int] = (4, 8),
                         target_avg_bits: float = 6.0,
                         loss_fn: Optional[Callable] = None,
                         input_key: str = "input",
                         verify: bool = True) -> Dict[str, Any]:
    """Measure per-scope sensitivity at each candidate weight bit width and
    assign bits under an average-weight-bits budget.

    Args:
      model: the QAT model; must carry its config as ``model.qconfig``.
      variables: trained variables (params + quant_state ...).
      batch: dict with ``input_key`` plus whatever ``loss_fn`` reads.
      bit_options: candidate WEIGHT bit widths, e.g. ``(4, 8)`` or
        ``(2, 4, 8)``.  Activations keep the root config's spec.
      target_avg_bits: budget — parameter-weighted mean weight bits must not
        exceed this (e.g. 6.0 for a 50/50 int4/int8 mix by numel).
      verify: additionally evaluate the PLANNED mixed model's all-quantized
        loss (one extra compile) and record it in the result.

    Returns a dict with ``assignment`` ({scope: bits}), ``qconfig`` (the
    ``with_overrides`` config realizing the plan — fine-tune with it, then
    ``convert(variables, plan['qconfig'])`` packs mixed carriers),
    ``avg_bits``, ``baseline_float``, ``uniform`` ({bits: all-quant loss}),
    ``planned_quant_loss`` (if ``verify``), and per-scope ``rows``.
    """
    if loss_fn is None:
        from ..parallel.train import cross_entropy_loss

        loss_fn = cross_entropy_loss
    from ..models.toggles import disable_observer

    bits = sorted(set(int(b) for b in bit_options))
    if len(bits) < 2:
        raise ValueError("need at least two bit_options to plan a mix")
    root_qc = getattr(model, "qconfig", None)
    if root_qc is None or root_qc.weight is None:
        raise ValueError("model.qconfig must carry a weight quantizer")
    if root_qc.overrides:
        raise ValueError("plan from a uniform root qconfig (overrides set)")

    # Trained qparams stay frozen during evaluation (sensitivity.py:107-112).
    variables = disable_observer(variables)
    # Layer granularity only: override patterns resolve against LAYER module
    # paths (layers.py calls qconfig.resolve(self.path)), so a per-quantizer
    # assignment could not be realized as a QConfig anyway.
    scopes = quantizer_scopes(variables, "layer")
    if not scopes:
        raise ValueError("no quantizers found in variables['quant_state']")
    numel = {s: _weight_numel(variables.get("params", {}), s) for s in scopes}
    # Scopes with no packed weight (e.g. activation-only quantizers) have no
    # byte cost; their bits stay at the root config's width.
    weighted = [s for s in scopes if numel[s] > 0]
    if not weighted:
        raise ValueError("no weight-carrying quantized scopes found")
    total = sum(numel[s] for s in weighted)

    mutable = [k for k in variables if k != "params"]

    def make_eval(m):
        @jax.jit
        def eval_loss(v, batch):
            out = m.apply(v, batch[input_key], training=False,
                          mutable=mutable)
            logits = out[0] if mutable else out
            return loss_fn(logits, batch)

        return eval_loss

    root_qmax = root_qc.weight.spec.quant_max
    damage: Dict[int, Dict[Tuple[str, ...], float]] = {}
    uniform: Dict[int, float] = {}
    baseline_float = None
    for b in bits:
        qc_b = requantize_qconfig(root_qc, b)
        factor = root_qmax / qc_b.weight.spec.quant_max
        model_b = dataclasses.replace(model, qconfig=qc_b)
        vars_b = _rescale_weight_scales(variables, lambda s: factor)
        eval_b = make_eval(model_b)

        def run(enabled):
            return float(eval_b(set_fake_quant_by_scope(vars_b, enabled),
                                batch))

        if baseline_float is None:
            baseline_float = run([])
        uniform[b] = run(scopes)
        damage[b] = {s: run([s]) - baseline_float for s in weighted}

    # Greedy promotion: everyone starts at the cheapest width; repeatedly
    # buy the promotion with the best damage-reduction per extra bit·numel
    # that still fits the budget.
    assignment = {s: bits[0] for s in weighted}
    budget = target_avg_bits * total
    spent = bits[0] * total
    if spent > budget:
        raise ValueError(
            f"target_avg_bits={target_avg_bits} is below the smallest "
            f"option {bits[0]}")
    while True:
        best, best_gain = None, -float("inf")
        for s in weighted:
            i = bits.index(assignment[s])
            if i + 1 == len(bits):
                continue
            nb = bits[i + 1]
            extra = (nb - bits[i]) * numel[s]
            if spent + extra > budget:
                continue
            gain = (damage[bits[i]][s] - damage[nb][s]) / extra
            if gain > best_gain:
                best, best_gain = s, gain
        if best is None:
            break
        spent += (bits[bits.index(assignment[best]) + 1]
                  - assignment[best]) * numel[best]
        assignment[best] = bits[bits.index(assignment[best]) + 1]

    # Longest pattern first: with_overrides matches first-substring-wins, so
    # a nested name ('blocks_0/mlp' vs 'blocks_0/mlp_up') must be shadowed
    # by its longer sibling appearing earlier.
    per_bits_qc = {b: requantize_qconfig(root_qc, b) for b in bits}
    mapping = {"/".join(s): per_bits_qc[assignment[s]]
               for s in sorted(weighted, key=lambda s: -len("/".join(s)))}
    planned_qc = root_qc.with_overrides(mapping)

    result: Dict[str, Any] = {
        "assignment": {"/".join(s): assignment[s] for s in weighted},
        "qconfig": planned_qc,
        "avg_bits": spent / total,
        "target_avg_bits": float(target_avg_bits),
        "baseline_float": baseline_float,
        "uniform": uniform,
        "rows": [
            {"scope": "/".join(s), "numel": numel[s],
             "bits": assignment[s],
             **{f"damage_{b}b": damage[b][s] for b in bits}}
            for s in sorted(weighted,
                            key=lambda s: -damage[bits[0]][s])
        ],
    }
    if verify:
        factors = {s: root_qmax / per_bits_qc[assignment[s]].weight
                   .spec.quant_max for s in weighted}
        vars_plan = _rescale_weight_scales(
            variables, lambda s: factors.get(s, 1.0))
        model_plan = dataclasses.replace(model, qconfig=planned_qc)
        result["planned_quant_loss"] = float(
            make_eval(model_plan)(set_fake_quant_by_scope(vars_plan, scopes),
                                  batch))
        result["planned_variables"] = vars_plan
    return result


def format_plan(plan: Dict[str, Any]) -> str:
    lines = [
        f"avg weight bits {plan['avg_bits']:.2f} "
        f"(target {plan['target_avg_bits']:.2f})   float loss "
        f"{plan['baseline_float']:.6f}",
        "uniform: " + "   ".join(f"{b}b {v:.6f}"
                                 for b, v in sorted(plan["uniform"].items())),
    ]
    if "planned_quant_loss" in plan:
        lines.append(f"planned mixed loss {plan['planned_quant_loss']:.6f}")
    hdr = f"{'scope':<40} {'bits':>5} {'numel':>10}"
    bcols = sorted(int(k.split('_')[1][:-1])
                   for k in plan["rows"][0] if k.startswith("damage_"))
    hdr += "".join(f" {'Δ@' + str(b) + 'b':>12}" for b in bcols)
    lines.append(hdr)
    for r in plan["rows"]:
        row = f"{r['scope']:<40} {r['bits']:>5} {r['numel']:>10}"
        row += "".join(f" {r[f'damage_{b}b']:>12.6f}" for b in bcols)
        lines.append(row)
    return "\n".join(lines)
