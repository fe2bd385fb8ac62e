"""Model-wide quantizer state reports (SURVEY.md §5 "Metrics / logging").

The reference exposes per-module diagnostics through ``extra_repr``
(observers.py:464-483: mode flags, init progress "N/M batches", scale/zp
values).  Here the equivalent walks a flax variables tree and produces one
structured row per quantizer — printable or machine-readable — without
needing module instances.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

__all__ = ["quantizer_report", "format_report", "serving_size_report"]


def _walk(qp_tree, qs_tree, path, rows):
    if isinstance(qp_tree, dict) and "qp" in qp_tree:
        qp = qp_tree["qp"]
        qs = qs_tree.get("qs", {}) if isinstance(qs_tree, dict) else {}
        scale = np.asarray(qp["scale"])
        shift = np.asarray(qp["shift"])
        row: Dict[str, Any] = {
            "path": "/".join(path),
            "channels": int(scale.shape[0]),
            "scale_min": float(scale.min()),
            "scale_max": float(scale.max()),
            "shift_min": float(shift.min()),
            "shift_max": float(shift.max()),
        }
        for flag in ("fake_quant_enabled", "observer_enabled",
                     "learning_enabled"):
            if flag in qs:
                row[flag] = bool(np.asarray(qs[flag]))
        if "current_batch" in qs:
            row["current_batch"] = int(np.asarray(qs["current_batch"]))
            row["n_batches"] = int(np.asarray(qs["n_batches"]))
            row["in_init_window"] = (row["n_batches"] >= 0 and
                                     row["current_batch"] <= row["n_batches"])
        rows.append(row)
        return
    if isinstance(qp_tree, dict):
        for k, v in qp_tree.items():
            _walk(v, qs_tree.get(k, {}) if isinstance(qs_tree, dict) else {},
                  path + [k], rows)


def quantizer_report(variables: Dict[str, Any]) -> List[Dict[str, Any]]:
    """One row per quantizer in the model: path, qparam ranges, mode flags,
    init-window progress.  Input: the full variables dict (or anything
    containing 'qparams' and optionally 'quant_state')."""
    rows: List[Dict[str, Any]] = []
    _walk(variables.get("qparams", {}), variables.get("quant_state", {}),
          [], rows)
    return rows


def format_report(rows: List[Dict[str, Any]], max_rows: Optional[int] = None
                  ) -> str:
    """Human-readable table of :func:`quantizer_report` rows."""
    out = []
    for row in rows[:max_rows]:
        flags = "".join(
            ch if row.get(name, False) else "-"
            for ch, name in (("F", "fake_quant_enabled"),
                             ("O", "observer_enabled"),
                             ("L", "learning_enabled")))
        init = ""
        if row.get("in_init_window"):
            init = f"  init {row['current_batch']}/{row['n_batches']}"
        out.append(
            f"{row['path']:<48s} [{flags}] C={row['channels']:<5d} "
            f"scale[{row['scale_min']:.3e},{row['scale_max']:.3e}] "
            f"shift[{row['shift_min']:.3e},{row['shift_max']:.3e}]{init}")
    if max_rows is not None and len(rows) > max_rows:
        out.append(f"... {len(rows) - max_rows} more")
    return "\n".join(out)


def serving_size_report(serve_vars) -> Dict[str, Any]:
    """Byte accounting of a converted serving variables tree: packed integer
    weights vs everything else, plus the f32-equivalent size and compression
    ratio — the HBM-capacity half of the weight-only story."""
    from ..serve.pack import PackedWeight

    packed_bytes = 0
    packed_f32_equiv = 0
    other_bytes = 0
    n_packed = 0

    def visit(leaf):
        nonlocal packed_bytes, packed_f32_equiv, other_bytes, n_packed
        if isinstance(leaf, PackedWeight):
            n_packed += 1
            packed_bytes += (leaf.data.size * leaf.data.dtype.itemsize
                             + leaf.scale.size * 4 + leaf.zero_point.size * 4)
            packed_f32_equiv += int(np.prod(leaf.orig_shape)) * 4
        elif hasattr(leaf, "size"):
            other_bytes += leaf.size * np.dtype(leaf.dtype).itemsize

    import jax

    jax.tree.map(visit, serve_vars,
                 is_leaf=lambda l: isinstance(l, PackedWeight))
    total = packed_bytes + other_bytes
    f32_total = packed_f32_equiv + other_bytes
    return {
        "packed_weights": n_packed,
        "packed_bytes": packed_bytes,
        "other_bytes": other_bytes,
        "total_bytes": total,
        "f32_equivalent_bytes": f32_total,
        "compression": round(f32_total / max(total, 1), 3),
    }
