"""Expert-parallel sharding for QuantMoE (models/moe.py).

The recipe (scaling-book): give the mesh an 'expert' axis, place every
stacked (E, …) expert leaf with ``P('expert', …)``, replicate the rest, and
jit the SAME train step — XLA turns the dispatch einsum ``nec,nd->ecd`` into
the token all-to-all and the gradient reduction into a psum over 'data',
both on ICI.  No torch.distributed analogue exists in the reference
(SURVEY.md §2c); this is the TPU-native extension of its QAT scheme to
routed-expert models.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["moe_sharding", "EXPERT_SCOPES"]

# module scopes QuantMoE stacks expert tensors under (models/moe.py)
EXPERT_SCOPES = ("experts_up", "experts_down")


def moe_sharding(mesh: Mesh, tree: Any, num_experts: int,
                 axis: str = "expert") -> Any:
    """A sharding pytree for ``tree`` (variables, QATTrainState, opt_state…):
    leaves that live under a QuantMoE expert scope AND carry the stacked
    expert dim (shape[0] == num_experts) get ``P(axis, None, …)``; everything
    else (router, norms, embeddings, non-MoE layers, scalars) replicates.

    Works on any pytree whose paths name flax scopes — optimizer states that
    mirror the param tree (momentum etc.) are matched through the same paths.
    """
    def one(path, leaf):
        keys = {getattr(k, "key", getattr(k, "name", None)) for k in path}
        # Under 'params' (and its optimizer mirrors) the only stacked
        # per-expert leaves are >= 2-D kernels (E, K, N) — the (N,) bias is
        # SHARED, and a coincidental N == num_experts must not shard it one
        # element per device.  Quantizer collections (qparams/quant_state)
        # legitimately stack 1-D per-expert leaves (per-expert LSQ scale
        # (E,), observer ranges (E,)), so there shape[0] == E suffices.
        quantish = bool(keys & {"qparams", "quant_state"})
        stacked = (hasattr(leaf, "ndim") and leaf.ndim >= 1
                   and leaf.shape[0] == num_experts
                   and (quantish or leaf.ndim >= 2))
        if stacked and keys & set(EXPERT_SCOPES):
            return NamedSharding(
                mesh, P(axis, *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, tree)
