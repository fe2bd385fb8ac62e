"""Model-wide QAT mode toggles.

Functional equivalents of the reference's ``model.apply(...)``-style helpers
(torchlsq/quantized/__init__.py:5-35): they walk a flax variables pytree and
flip the mode flags inside every quantizer's ``quant_state`` entry.

The act/weight-filtered variants select quantizers by their module name
(``act_fq`` / ``weight_fq`` as created by QuantDense/QuantConv) — a structural
filter that fixes the reference's operator-precedence bug, where
``isinstance(A) or isinstance(B) and cond`` applied the dtype condition to only
one operand (quantized/__init__.py:22-35, SURVEY.md §7 fix list).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp

__all__ = [
    "enable_fake_quant", "disable_fake_quant",
    "enable_observer", "disable_observer",
    "enable_fake_quant_on_act", "disable_fake_quant_on_act",
    "enable_observer_on_weights", "disable_observer_on_weights",
    "map_quant_state",
]


def map_quant_state(variables: Dict[str, Any],
                    fn: Callable[[Dict[str, Any]], Dict[str, Any]],
                    name_filter: Optional[str] = None) -> Dict[str, Any]:
    """Apply ``fn`` to every quantizer state dict in the ``quant_state``
    collection.  ``name_filter`` restricts to subtrees whose path contains the
    given module name (e.g. 'act_fq' or 'weight_fq')."""

    def walk(tree, in_scope):
        if isinstance(tree, dict):
            if "qs" in tree and isinstance(tree["qs"], dict) \
                    and "fake_quant_enabled" in tree["qs"]:
                if in_scope:
                    return {**tree, "qs": fn(dict(tree["qs"]))}
                return tree
            return {
                k: walk(v, in_scope or (name_filter is not None
                                        and k == name_filter)
                        or name_filter is None)
                for k, v in tree.items()
            }
        return tree

    if "quant_state" not in variables:
        return variables
    new_qs = walk(variables["quant_state"], name_filter is None)
    return {**variables, "quant_state": new_qs}


def _set_flag(flag: str, value: bool, name_filter=None):
    def toggle(variables):
        return map_quant_state(
            variables,
            lambda qs: {**qs, flag: jnp.asarray(value)},
            name_filter=name_filter)
    return toggle


def enable_fake_quant(variables):
    return _set_flag("fake_quant_enabled", True)(variables)


def disable_fake_quant(variables):
    return _set_flag("fake_quant_enabled", False)(variables)


def enable_observer(variables):
    return _set_flag("observer_enabled", True)(variables)


def disable_observer(variables):
    return _set_flag("observer_enabled", False)(variables)


def enable_fake_quant_on_act(variables):
    return _set_flag("fake_quant_enabled", True, "act_fq")(variables)


def disable_fake_quant_on_act(variables):
    return _set_flag("fake_quant_enabled", False, "act_fq")(variables)


def enable_observer_on_weights(variables):
    return _set_flag("observer_enabled", True, "weight_fq")(variables)


def disable_observer_on_weights(variables):
    return _set_flag("observer_enabled", False, "weight_fq")(variables)
