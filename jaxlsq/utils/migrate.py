"""Migration from the reference framework: import torchlsq state_dicts.

The reference persists each ``LSQFakeQuantizer`` as ordinary state_dict
entries — learnable ``scale``/``shift`` Parameters (observers.py:339-340) and
the uint8 flag buffers ``fake_quant_enabled`` / ``observer_enabled`` /
``learning_enabled`` / ``current_batch`` (observers.py:252-255).  This module
copies them into a jaxlsq variables tree so a user of the reference can carry
trained quantizers over without retraining.

Plain ``torch.quantization.FakeQuantize`` modules (scale + integer
``zero_point`` instead of a float shift) are also accepted: the zero point is
folded via ``shift = −zp·scale`` (observers.py:366-368).

Usage::

    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    variables = load_torchlsq_state(variables, sd, {
        "dense_0/act_fq":    "features.0.activation_post_process",
        "dense_0/weight_fq": "features.0.weight_fake_quant",
    })

No torch import is needed — the state_dict is consumed as a flat mapping of
numpy arrays.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

__all__ = ["load_torchlsq_state"]

_FLAG_KEYS = ("fake_quant_enabled", "observer_enabled", "learning_enabled")


def _set_in(tree: Dict[str, Any], path, value):
    node = tree
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value


def _get_in(tree: Dict[str, Any], path):
    node = tree
    for k in path:
        node = node[k]
    return node


def load_torchlsq_state(variables: Dict[str, Any],
                        state_dict: Mapping[str, np.ndarray],
                        mapping: Mapping[str, str]) -> Dict[str, Any]:
    """Copy reference quantizer state into a jaxlsq variables tree.

    Args:
      variables: full variables dict from ``model.init`` (must contain
        'qparams'; 'quant_state' is updated when flag buffers are present).
      state_dict: flat {torch key: numpy array} (call ``.numpy()`` on torch
        tensors first).
      mapping: {jaxlsq quantizer path ('a/b/act_fq') : torch module prefix}.

    Returns a new variables dict; raises KeyError for missing scale entries
    (shift/zero_point and flags are optional — plain FakeQuantize has zp,
    torchlsq has shift).
    """
    out = copy.deepcopy(
        {k: (dict(v) if isinstance(v, dict) else v)
         for k, v in variables.items()})
    out["qparams"] = copy.deepcopy(variables["qparams"])
    if "quant_state" in variables:
        out["quant_state"] = copy.deepcopy(variables["quant_state"])

    for path_str, prefix in mapping.items():
        path = tuple(path_str.split("/"))
        qp = _get_in(out["qparams"], path + ("qp",))
        want_shape = np.asarray(qp["scale"]).shape

        scale = np.asarray(state_dict[f"{prefix}.scale"],
                           np.float32).reshape(-1)
        if scale.shape != want_shape and scale.size == 1:
            scale = np.broadcast_to(scale, want_shape)
        if scale.shape != want_shape:
            raise ValueError(
                f"{path_str}: scale shape {scale.shape} != {want_shape}")

        if f"{prefix}.shift" in state_dict:
            shift = np.asarray(state_dict[f"{prefix}.shift"],
                               np.float32).reshape(-1)
        elif f"{prefix}.zero_point" in state_dict:
            zp = np.asarray(state_dict[f"{prefix}.zero_point"],
                            np.float32).reshape(-1)
            shift = -zp * scale  # observers.py:366-368
        else:
            shift = np.asarray(qp["shift"])
        if shift.shape != want_shape and shift.size == 1:
            shift = np.broadcast_to(shift, want_shape)

        _set_in(out["qparams"], path + ("qp",),
                {"scale": jnp.asarray(scale, jnp.float32),
                 "shift": jnp.asarray(shift, jnp.float32)})

        if "quant_state" in out:
            qs = dict(_get_in(out["quant_state"], path + ("qs",)))
            for flag in _FLAG_KEYS:
                key = f"{prefix}.{flag}"
                if key in state_dict:
                    qs[flag] = jnp.asarray(
                        bool(np.asarray(state_dict[key]).reshape(-1)[0]))
            if f"{prefix}.current_batch" in state_dict:
                qs["current_batch"] = jnp.asarray(
                    int(np.asarray(
                        state_dict[f"{prefix}.current_batch"]).reshape(-1)[0]),
                    jnp.int32)
            _set_in(out["quant_state"], path + ("qs",), qs)
    return out
