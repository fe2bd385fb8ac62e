"""QAT → serving conversion: the ``torch.quantization.convert`` equivalent.

The reference's convert path (SURVEY.md §3.4) asks every LSQFakeQuantizer for
``calculate_qparams()`` (observers.py:403-422) and lets torch rebuild the
module with qint8 kernels.  Here :func:`convert` walks the trained flax
variables, folds each weight quantizer's learned (scale, shift) into
(scale, zero_point), quantizes + packs the kernels (jaxlsq/serve/pack.py),
and freezes each activation quantizer's qparams — producing the variables for
the same model applied in serving mode (``qconfig.for_serving()``:
QuantDense/QuantConv then run the fused weight-only matmul of
jaxlsq/serve/matmul.py instead of fake-quant + float matmul).

Tensor-parallel serving: :func:`shard_packed` places a PackedWeight
column-parallel over the mesh 'model' axis (N-sharded data + qparams);
:func:`shard_converted` does it for a whole converted variables tree.  Under
jit, XLA inserts the all-gathers/reduce-scatters (SURVEY.md §5 "Distributed
communication backend").
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.spec import QuantSpec
from ..observers.quantizer import convert_shift_to_zp
from .pack import PackedWeight, quantize_weight

__all__ = ["convert", "shard_packed", "shard_converted", "serving_bits"]


def serving_bits(spec: QuantSpec) -> int:
    """Carrier width the serving path uses for a weight spec: int4 only when
    the trained quant range actually fits the signed int4 carrier [-8, 7]
    (the fit test pack.quantize_weight enforces), else int8 — e.g. an
    unsigned 4-bit range [0, 15] has 16 levels but serves from int8."""
    if -8 <= spec.quant_min and spec.quant_max <= 7:
        return 4
    return 8


def _act_qparams(qp: Dict[str, jnp.ndarray], spec: QuantSpec
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Freeze an activation quantizer: eps-clamped scale + shift→zp fold
    (observers.py:417,419).  Clamp is ``max(|s|, eps)`` like the QAT kernels
    (lsq_kernel.h:157, golden.clamp_scale) — a learned scale may drift
    negative and must freeze to its effective magnitude, not to eps."""
    from ..core.golden import clamp_scale

    scale = clamp_scale(qp["scale"])
    zp = convert_shift_to_zp(qp["shift"], scale, spec)
    return scale, zp


def _weight_axis_for(kernel: jnp.ndarray) -> int:
    """Per-channel axis by kernel layout: dense (K, N) → 1;
    conv (kh, kw, in, out) → ndim-1; stacked MoE experts (E, K, N) → 0,
    the EXPERT axis — per-expert scales (models/layers.py, models/moe.py)."""
    if kernel.ndim == 3:
        return 0
    return kernel.ndim - 1


def convert(variables: Dict[str, Any], qconfig, *,
            weight_group_size: int = None) -> Dict[str, Any]:
    """Convert trained QAT variables into serving variables.

    Args:
      variables: the full trained variables dict — must contain 'params' and
        'qparams' (plus anything else, e.g. 'batch_stats', passed through).
      qconfig: the QConfig the model was trained with (supplies the weight /
        activation QuantSpecs; per-channel axis is re-derived per kernel).
      weight_group_size: opt-in GROUP-WISE 4-bit weight serving
        (pack.quantize_weight_grouped — one symmetric abs-max scale per
        (K-group, channel), the AWQ/GPTQ-style accuracy fix for W4).
        Applied to every 2-D dense kernel whose serving carrier is int4 and
        whose K divides by it; everything else (convs, embeddings, MoE
        stacks, non-dividing K, int8 carriers) keeps the reference
        per-channel fold from the LEARNED qparams.

    Returns a variables dict for the SAME model applied with
    ``qconfig.for_serving(...)``: packed kernels live in a 'quantized'
    collection, packed kernels are dropped from 'params', and 'qparams' /
    'quant_state' are dropped entirely.
    """
    params = variables["params"]
    qparams = variables.get("qparams", {})
    quant_state = variables.get("quant_state", {})

    def walk(p_tree, q_tree, s_tree, path=()):
        if not isinstance(p_tree, dict):
            return p_tree, None
        # 'kernel' = dense/conv weights (per-channel axis = last);
        # 'embedding' = QuantEmbed table (per-row axis 0; int8 only — int4
        # nibble packing would break the row-addressable gather).
        wname = next((k for k in ("kernel", "embedding") if k in p_tree), None)
        has_wq = (isinstance(q_tree, dict) and "weight_fq" in q_tree
                  and wname is not None)
        if has_wq:
            # mixed-precision overrides: the variable path mirrors the
            # module path the layers resolve against
            qcfg = qconfig.resolve(path)
            kernel = p_tree[wname]
            if isinstance(s_tree, dict) and "dg_flat" in s_tree:
                # DenseGeneral (models/layers.py::densegeneral_apply): the
                # QAT scales live on the flattened (K, N) view — pack that,
                # and the serve path consumes the 2-D PackedWeight.
                kernel = kernel.reshape(tuple(int(d)
                                              for d in s_tree["dg_flat"]))
            axis = 0 if wname == "embedding" else _weight_axis_for(kernel)
            wspec = qcfg.weight.spec.replace(axis=axis) \
                if qcfg.weight.spec.per_channel else qcfg.weight.spec
            wqp = q_tree["weight_fq"]["qp"]
            # embedding: int4 nibble packing would break the row gather
            bits = 8 if wname == "embedding" else serving_bits(wspec)
            if (weight_group_size is not None and bits == 4
                    and wname == "kernel" and kernel.ndim == 2
                    and kernel.shape[0] % weight_group_size == 0):
                from .pack import quantize_weight_grouped

                packed = quantize_weight_grouped(
                    kernel, group_size=weight_group_size, bits=4)
            else:
                packed = quantize_weight(
                    kernel, wqp["scale"], wqp["shift"], wspec, bits=bits)
            quantized: Dict[str, Any] = {wname: packed}
            if "act_fq" in q_tree and qcfg.activation is not None:
                ascale, azp = _act_qparams(q_tree["act_fq"]["qp"],
                                           qcfg.activation.spec)
                quantized["act_scale"] = ascale
                quantized["act_zp"] = azp
            new_p = {k: v for k, v in p_tree.items() if k != wname}
            return new_p, quantized
        new_p, new_q = {}, {}
        for k, v in p_tree.items():
            sub_q = q_tree.get(k, {}) if isinstance(q_tree, dict) else {}
            sub_s = s_tree.get(k, {}) if isinstance(s_tree, dict) else {}
            np_, nq_ = walk(v, sub_q, sub_s, path + (k,))
            # drop only empty dicts; array leaves (LayerNorm/Embed params,
            # biases) pass through untouched
            if not (isinstance(np_, dict) and not np_):
                new_p[k] = np_
            if nq_:
                new_q[k] = nq_
        return new_p, new_q

    new_params, quantized = walk(params, qparams, quant_state)
    out = {"params": new_params, "quantized": quantized or {}}
    # 'losses' is per-step training scratch (QuantMoE's aux load-balance
    # term) — meaningless at serving, and serve-mode modules don't create it
    for k, v in variables.items():
        if k not in ("params", "qparams", "quant_state", "quantized",
                     "losses"):
            out[k] = v
    return out


# --------------------------------------------------------------------------
# Tensor-parallel placement
# --------------------------------------------------------------------------

def shard_packed(packed: PackedWeight, mesh: Mesh,
                 axis_name: str = "model") -> PackedWeight:
    """Column-parallel TP placement: shard the output-feature (N) axis of the
    data and the matching per-channel qparams over ``axis_name``.  Replicated
    instead when the layout doesn't fit column parallelism:

    * N not divisible by the axis size (e.g. a small classifier head) —
      correct either way, XLA just skips the collective;
    * the per-channel axis is not the last data axis (QuantEmbed tables are
      per-ROW, axis 0 — sharding rows would turn every gather into an
      all-to-all, so embedding tables replicate).
    """
    axis_size = dict(zip(mesh.axis_names, mesh.devices.shape))[axis_name]
    ndim = packed.data.ndim
    n = packed.data.shape[-1]
    column_parallel = (packed.axis == len(packed.orig_shape) - 1
                       and n % axis_size == 0)
    if not column_parallel:
        repl = NamedSharding(mesh, P())
        return jax.tree.map(lambda l: jax.device_put(l, repl), packed)
    spec = [None] * ndim
    spec[-1] = axis_name  # N is last for both dense (K,N) and conv HWIO
    data = jax.device_put(packed.data, NamedSharding(mesh, P(*spec)))
    if packed.scale.ndim == 2 and packed.scale.shape[1] == n:
        # group-wise scales (G, N): the N axis rides with the data
        ssh = NamedSharding(mesh, P(None, axis_name))
        qsh = NamedSharding(mesh, P())
    elif packed.scale.shape[0] == n:  # per-channel qparams ride with N
        ssh = qsh = NamedSharding(mesh, P(axis_name))
    else:
        ssh = qsh = NamedSharding(mesh, P())
    return packed.replace(
        data=data,
        scale=jax.device_put(packed.scale, ssh),
        zero_point=jax.device_put(packed.zero_point, qsh))


def shard_converted(variables: Dict[str, Any], mesh: Mesh,
                    axis_name: str = "model") -> Dict[str, Any]:
    """Shard every PackedWeight in a converted variables tree column-parallel
    over ``axis_name``; replicate everything else."""
    repl = NamedSharding(mesh, P())

    def place(leaf):
        if isinstance(leaf, PackedWeight):
            return shard_packed(leaf, mesh, axis_name)
        return jax.device_put(leaf, repl)

    return jax.tree.map(place, variables,
                        is_leaf=lambda l: isinstance(l, PackedWeight))
