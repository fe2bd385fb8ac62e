"""FSDP / ZeRO-3 sharding of parameters + optimizer state for QAT training.

The reference has no distributed layer at all (SURVEY.md §2c — no
torch.distributed import anywhere), and plain data parallelism replicates
every parameter and its optimizer state on every chip.  For models whose
parameter + momentum footprint rivals per-chip HBM, the scaling-book recipe
is fully-sharded data parallelism: keep the SAME logical train step and
change ONLY placement — each large parameter leaf (and, through identical
tree paths, its optimizer mirrors and gradient) lives sharded over the
'data' axis.  GSPMD then inserts

  * an ``all-gather`` where a sharded weight is consumed by the forward /
    backward matmul (parameters are materialized per-layer, transiently),
  * a ``reduce-scatter`` for the gradient (instead of DP's ``all-reduce``),
    so each chip updates only its 1/N parameter shard and its 1/N slice of
    the optimizer state.

Per-chip memory for params + grads + optimizer state drops by ~N; the extra
traffic vs DP is one parameter all-gather per use (the reduce-scatter
replaces — and costs half of — DP's all-reduce).  ``test_fsdp.py`` pins the
collective structure from the compiled HLO and step-for-step exactness
against the replicated DP step on the virtual 8-device mesh.

This composes with the existing ``make_train_step(state_sharding=…)`` hook:
``fsdp_sharding`` is just another placement tree, like
``parallel.moe.moe_sharding`` for expert parallelism.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["fsdp_sharding"]

# Collections that must stay replicated regardless of size: quantizer
# scales/shifts and observer state are written from the (data-sharded) batch
# each step and read by every layer's fake-quant — they are tiny (per-tensor
# scalars / per-channel vectors), and sharding them would turn every
# observer update into a collective for no memory win.  BatchNorm stats and
# auxiliary losses likewise.
_REPLICATED_SCOPES = frozenset(
    {"qparams", "quant_state", "batch_stats", "losses"})


def fsdp_sharding(mesh: Mesh, tree: Any, axis: str = "data",
                  min_size: int = 1024) -> Any:
    """A placement pytree for ``tree`` (a ``QATTrainState``, a variables
    dict, or an optimizer state) sharding every large parameter-like leaf
    over ``axis``.

    Per leaf: the LARGEST dimension divisible by the mesh axis size is
    sharded (best per-chip balance; which dimension is sharded does not
    change the math — GSPMD re-gathers at use).  Leaves smaller than
    ``min_size`` elements, scalars, leaves with no divisible dimension, and
    anything under a quantizer/BN collection (see ``_REPLICATED_SCOPES``)
    replicate.  Optimizer states built from the param tree (momentum, Adam
    moments) are matched through the same paths/shapes, so passing the whole
    ``QATTrainState`` shards them consistently with their parameters.
    """
    n = mesh.shape[axis]

    def collection_key(path):
        """The COLLECTION-level dict key: the first DictKey on the path.
        For a variables dict that is the top-level collection name; for a
        QATTrainState (or optimizer mirrors built from the param tree) the
        attribute hops (.params/.opt_state/...mu) precede it.  Matching only
        this key — not every path component — keeps a user model free to
        name a submodule or parameter 'losses'/'batch_stats' etc. without
        silently replicating its kernel."""
        for k in path:
            if isinstance(k, jax.tree_util.DictKey):
                return k.key
        return None

    def one(path, leaf):
        if collection_key(path) in _REPLICATED_SCOPES:
            return NamedSharding(mesh, P())
        if (not hasattr(leaf, "ndim") or leaf.ndim == 0
                or leaf.size < min_size):
            return NamedSharding(mesh, P())
        for d in sorted(range(leaf.ndim), key=lambda d: leaf.shape[d],
                        reverse=True):
            if leaf.shape[d] % n == 0 and leaf.shape[d] >= n:
                spec = [None] * leaf.ndim
                spec[d] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, tree)
