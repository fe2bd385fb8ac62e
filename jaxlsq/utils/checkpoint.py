"""Checkpoint / resume for QAT state pytrees.

The reference persists only what falls out of ``state_dict`` — learnable
scale/shift Parameters plus four uint8 flag buffers — and silently LOSES
``_initialized``/``n_batches``/``init_mode`` across a round-trip while lazy
param init breaks load-before-forward entirely (observers.py:245-257,
SURVEY.md §5 "Checkpoint / resume" pitfalls).  This framework avoids both by
design: everything that evolves is one explicit pytree (QATTrainState,
QuantizerState), so checkpointing is a plain pytree save/restore.

Backend: orbax-checkpoint when importable (the production path: async,
multi-host, sharding-aware), with a self-contained ``.npz`` fallback so
checkpointing never becomes an optional feature.  Both backends write/read
the SAME logical content (the flattened pytree leaves + treedef check).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step",
           "restore_or_init"]

try:  # orbax is in the base image; gate anyway (SURVEY.md environment note)
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def _step_dir(ckpt_dir: str, step: int) -> str:
    return os.path.join(ckpt_dir, f"step_{step:010d}")


def _leaf_paths(tree: Any) -> list:
    """Stable per-leaf key-path strings for structural tree comparison."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [jax.tree_util.keystr(kp) for kp, _ in flat]


def latest_step(ckpt_dir: str) -> Optional[int]:
    """Largest completed checkpoint step in ``ckpt_dir``, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_"):
            suffix = name[len("step_"):]
            if not suffix.isdigit():
                continue  # stray dirs like step_tmp must not break restore
            marker = os.path.join(ckpt_dir, name, "_COMPLETE")
            orbax_ok = os.path.isdir(os.path.join(ckpt_dir, name, "state"))
            if os.path.exists(marker) or orbax_ok:
                steps.append(int(suffix))
    return max(steps) if steps else None


def save_checkpoint(ckpt_dir: str, state: Any, step: int, *,
                    use_orbax: Optional[bool] = None) -> str:
    """Write ``state`` (any pytree) for ``step``; returns the checkpoint path.

    Writes are atomic at the directory level: the npz backend stamps a
    ``_COMPLETE`` marker last; orbax has its own atomicity protocol.
    """
    use_orbax = _HAS_ORBAX if use_orbax is None else use_orbax
    if use_orbax and not _HAS_ORBAX:
        raise RuntimeError("orbax-checkpoint is not importable; "
                           "use use_orbax=False (npz backend)")
    path = _step_dir(ckpt_dir, step)
    os.makedirs(path, exist_ok=True)
    state = jax.device_get(state)
    if use_orbax:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(path, "state"), state, force=True)
        ckptr.wait_until_finished()
        return path
    leaves, treedef = jax.tree.flatten(state)
    np.savez(os.path.join(path, "leaves.npz"),
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})
    with open(os.path.join(path, "treedef.json"), "w") as f:
        json.dump({"treedef": str(treedef), "n": len(leaves),
                   "paths": _leaf_paths(state)}, f)
    with open(os.path.join(path, "_COMPLETE"), "w") as f:
        f.write("ok")
    return path


def restore_checkpoint(ckpt_dir: str, target: Any, *,
                       step: Optional[int] = None,
                       use_orbax: Optional[bool] = None) -> Any:
    """Restore into the structure of ``target`` (an abstract or concrete
    pytree of the same shape — e.g. a freshly built QATTrainState; no dummy
    forward needed, unlike the reference's lazy-init trap)."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = _step_dir(ckpt_dir, step)
    orbax_state = os.path.join(path, "state")
    use_orbax = (os.path.isdir(orbax_state) if use_orbax is None
                 else use_orbax)
    if use_orbax and not _HAS_ORBAX:
        raise RuntimeError(
            f"checkpoint at {orbax_state} requires orbax-checkpoint, "
            "which is not importable in this environment")
    if use_orbax:
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(orbax_state, target)
    with open(os.path.join(path, "treedef.json")) as f:
        meta = json.load(f)
    data = np.load(os.path.join(path, "leaves.npz"))
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(meta["n"])]
    treedef = jax.tree.structure(target)
    # Structural check via key paths (robust across JAX versions, unlike
    # treedef repr strings); older checkpoints without "paths" fall back to
    # the repr comparison.
    if "paths" in meta:
        target_paths = _leaf_paths(target)
        if target_paths != meta["paths"]:
            saved, got = set(meta["paths"]), set(target_paths)
            raise ValueError(
                "checkpoint tree structure does not match target:\n"
                f"  only in checkpoint: {sorted(saved - got)[:8]}\n"
                f"  only in target:     {sorted(got - saved)[:8]}")
    elif str(treedef) != meta["treedef"]:
        raise ValueError(
            "checkpoint tree structure does not match target:\n"
            f"  saved:  {meta['treedef']}\n  target: {treedef}")
    return jax.tree.unflatten(treedef, leaves)


def restore_or_init(ckpt_dir: str, init_fn, *,
                    use_orbax: Optional[bool] = None):
    """Elastic-restart entry point: restore the latest checkpoint if one
    exists, else build fresh state with ``init_fn()`` (SURVEY.md §5 "Failure
    detection / elastic recovery" — checkpoint-restart is the mechanism).

    Returns (state, restored_step) with restored_step = -1 on a fresh start.
    ``init_fn`` runs in both cases: its result is the restore target (shape
    donor), which is what makes restore-before-any-forward possible.
    """
    target = init_fn()
    step = latest_step(ckpt_dir)
    if step is None:
        return target, -1
    return restore_checkpoint(ckpt_dir, target, step=step,
                              use_orbax=use_orbax), step
