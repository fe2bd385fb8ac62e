"""AOT export of serving programs (deployment artifacts).

The reference hands its serving story to ``torch.quantization.convert`` and
TorchScript-visible ops (`@torch.jit.export` markers, observers.py:244+;
dispatcher-registered schemas, lsq.cpp:137-146) so converted models can run
outside Python training code.  The TPU-native equivalent is ``jax.export``:
the jitted serving program — the converted forward, or the whole scan-fused
generate loop — is serialized as a versioned StableHLO artifact that a
deployment process deserializes and calls without the model definition, the
qconfig machinery, or any of this package's Python on its path.

Design choices:

* Weights are ARGUMENTS, not baked constants: one small artifact (KBs of
  StableHLO) plus the packed-weight checkpoint, so weight updates don't
  re-export and the artifact never embeds parameters.
* The artifact pins the full calling convention (pytree structure, shapes,
  dtypes of the converted variables) — ``jax.export`` checks them at call
  time, failing fast on layout drift.
* ``platforms`` can request cross-platform lowering (e.g. export ON a CPU
  host FOR 'tpu'); the default records the current backend.  For TPU
  serving under TP sharding export the ``serve_impl='xla'`` config (the
  same caveat as ``QConfig.for_serving``).

Round-trip exactness is pinned in tests/test_export.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .decode import make_generate
from .pack import PackedWeight

__all__ = ["export_serving_forward", "export_generate", "load_exported",
           "save_exported_file", "load_exported_file"]


def _register_serializations():
    """Teach jax.export to serialize the PackedWeight pytree node (its aux
    data is the static packing metadata tuple (bits, axis, k_axis,
    orig_shape)).  Idempotent: re-registration raises and is ignored."""
    import json

    from jax import export as jexport

    try:
        jexport.register_pytree_node_serialization(
            PackedWeight,
            serialized_name="jaxlsq.serve.pack.PackedWeight",
            # aux = (bits, axis, k_axis, orig_shape, group_size)
            serialize_auxdata=lambda aux: json.dumps(
                [aux[0], aux[1], aux[2], list(aux[3]), aux[4]]
            ).encode("utf-8"),
            deserialize_auxdata=lambda b: (
                lambda v: (v[0], v[1], v[2], tuple(v[3]), v[4]))(
                json.loads(bytes(b).decode("utf-8"))),
        )
    except ValueError:
        pass


_register_serializations()


def _shapes_of(tree):
    return jax.tree.map(
        lambda a: a if isinstance(a, jax.ShapeDtypeStruct)
        else jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)),
        tree)


def _export(fn, args, platforms):
    from jax import export as jexport

    exp = jexport.export(jax.jit(fn),
                         platforms=tuple(platforms) if platforms else None)(
        *(_shapes_of(a) for a in args))
    return bytes(exp.serialize())


def export_serving_forward(model, variables, sample,
                           *, platforms: Optional[Sequence[str]] = None
                           ) -> bytes:
    """Serialize the (converted) serving forward as a StableHLO artifact.

    ``variables`` fixes the calling convention (typically the output of
    ``jaxlsq.serve.convert``, with ``model`` built from
    ``qconfig.for_serving(...)``); ``sample`` fixes the input shape/dtype.
    The deployed callable is ``load_exported(blob)(variables, x)``.
    """
    def fwd(v, x):
        return model.apply(v, x, training=False)

    return _export(fwd, (variables, sample), platforms)


def export_generate(model, variables, prompt_len: int, n_new: int,
                    *, batch_size: int = 1, cache_dtype=jnp.float32,
                    platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize the whole scan-fused GREEDY generate loop (prefill + n_new
    decode steps, KV cache of ``cache_dtype`` incl. the int8/int4 layouts)
    as one artifact: ``load_exported(blob)(variables, prompts)`` with
    prompts (batch_size, prompt_len) int32 → (batch_size, n_new) int32."""
    gen = make_generate(model, prompt_len, n_new, cache_dtype=cache_dtype,
                        jit=False)
    prompts = jax.ShapeDtypeStruct((batch_size, prompt_len), jnp.int32)
    return _export(gen, (variables, prompts), platforms)


def load_exported(blob: bytes):
    """Deserialize an exported artifact into a callable (checks the
    recorded calling convention on every call)."""
    from jax import export as jexport

    return jexport.deserialize(blob).call


def save_exported_file(path: str, blob: bytes) -> str:
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_exported_file(path: str):
    with open(path, "rb") as f:
        return load_exported(f.read())
