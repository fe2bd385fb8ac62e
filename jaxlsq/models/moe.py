"""Quantized Mixture-of-Experts: top-k routed expert MLPs, LSQ-quantized,
laid out for EXPERT PARALLELISM over a mesh axis.

The reference has no MoE (it is a quantization library); this extends its
LSQ fake-quant scheme (lsq_kernel.h:6-14, observers.py:424-462) to the
routed-expert architecture the north-star serving/training story needs at
scale.  TPU-first design choices:

* **Static shapes everywhere** (XLA requirement): GShard/Switch-style fixed
  per-expert capacity ``C = ceil(top_k * tokens * capacity_factor / E)``.
  Tokens over capacity are dropped — their expert contribution is zero and
  they ride the surrounding residual connection (standard Switch behavior).
* **Stacked expert weights** ``(E, d_in, d_out)`` as ONE parameter, so an
  'expert' mesh axis shards axis 0 and the dispatch/combine einsums become
  the all-to-alls XLA inserts under jit (scaling-book recipe: annotate
  shardings, let XLA place collectives on ICI).  ``jaxlsq.parallel.moe``
  builds the sharding pytree.
* **Einsum dispatch** (``nec,nd->ecd``) rather than sort/gather: every op is
  an MXU matmul, no dynamic shapes, no scatter.  The O(N·E·C) combine tensor
  is the classic GShard trade — fine for the few-thousand-token microbatches
  QAT uses; a sort-based dispatch would only pay at much larger N.

Quantization granularity: expert kernels are fake-quantized with PER-EXPERT
scales (per-channel axis 0 over the stacked expert dim) when the QConfig asks
for per-channel weights — each expert trains its own step size, the MoE
analogue of per-output-channel granularity.  The router stays float (standard
practice: routing logits are tiny and precision-sensitive).

Serving: ``jaxlsq.serve.convert`` packs the stacked kernels to int8 — or
nibble-packed int4 along K when the trained range fits the signed int4
carrier (serve/pack.py split-half layout) — with per-expert scales; serve
mode here runs a weight-only dequant-fused einsum (scale factors out of the
contraction exactly, so the fold is lossless — same identity the 2-D
wo_matmul uses, serve/matmul.py), or the int8×int8 epilogue path
(``act_mode='static_int8'``).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import FakeQuantize, _dummy_packed, _static_act_quant
from .qconfig import QConfig

__all__ = ["QuantMoE", "load_balance_loss", "route"]


def route(gates: jnp.ndarray, top_k: int, capacity: int
          ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """GShard choice-major capacity routing: (N, E) router probabilities →
    ``(dispatch, combine)``, both (N, E, C).

    * top-k gates are renormalized to a convex mixture over the KEPT picks;
    * queue slots assign choice-major (all 1st choices before any 2nd
      choice — GShard order) via a cumulative count per expert;
    * picks whose slot ≥ capacity are DROPPED (their combine weight is 0);
    * ``dispatch`` is the {0,1} mask of combine — einsum it with tokens to
      build the (E, C, d) expert batches, and einsum ``combine`` with the
      expert outputs to scatter-merge back.

    Pure and shape-static: fuzz-tested invariants in test_moe.py
    (≤1 token per (e, slot), ≤C tokens per expert, convex combine rows,
    dropped rows exactly zero).
    """
    N, E = gates.shape
    K, C = top_k, capacity
    gate_k, idx_k = jax.lax.top_k(gates, K)           # (N, K)
    gate_k = gate_k / jnp.maximum(jnp.sum(gate_k, -1, keepdims=True),
                                  jnp.finfo(gates.dtype).tiny)
    oh = jax.nn.one_hot(idx_k, E, dtype=jnp.int32)    # (N, K, E)
    ohm = oh.transpose(1, 0, 2).reshape(K * N, E)
    pos = (jnp.cumsum(ohm, axis=0) - 1).reshape(K, N, E).transpose(1, 0, 2)
    pos = jnp.sum(pos * oh, axis=-1)                  # (N, K) queue slot
    keep = pos < C
    combine = (gate_k * keep)[..., None, None] * oh[..., None] \
        * jax.nn.one_hot(pos, C, dtype=gates.dtype)[:, :, None, :]
    combine = jnp.sum(combine, axis=1)                # (N, E, C)
    dispatch = (combine > 0).astype(gates.dtype)
    return dispatch, combine


def _expert_carrier(packed):
    """int8 view of a stacked expert weight: int4 stacks unpack their
    nibble-packed K axis (k_axis=1 of (E, K, N); zero-pad sliced back via
    orig_shape) — the same layout contract as serve/pack.unpack_int4."""
    if packed.bits == 4:
        from ..serve.pack import unpack_int4

        q = unpack_int4(packed.data, k_axis=1)
        if q.shape[1] != packed.orig_shape[1]:
            q = jax.lax.slice_in_dim(q, 0, packed.orig_shape[1], axis=1)
        return q
    return packed.data


def load_balance_loss(gates: jnp.ndarray, top1: jnp.ndarray) -> jnp.ndarray:
    """Switch-Transformer auxiliary load-balance loss: ``E * Σ_e f_e · P_e``
    where ``f_e`` is the fraction of tokens whose TOP-1 choice is expert e and
    ``P_e`` the mean router probability for e.  Balanced routing ⇒ 1.0."""
    E = gates.shape[-1]
    f = jnp.mean(jax.nn.one_hot(top1, E, dtype=gates.dtype), axis=0)
    P = jnp.mean(gates, axis=0)
    return E * jnp.sum(f * P)


class _ExpertDense(nn.Module):
    """Stacked per-expert dense: x (E, C, K) → (E, C, N) with kernel
    (E, K, N).  QAT fake-quant mirrors QuantDense (models/layers.py) but the
    weight per-channel axis is 0 = the EXPERT axis (per-expert scales); the
    serving path is the weight-only dequant-fused einsum."""

    features: int
    qconfig: QConfig

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        E, C, K = x.shape
        kshape = (E, K, self.features)
        qc = self.qconfig.resolve(self.path)  # mixed-precision overrides
        if qc.mode == "serve":
            y = self._serve(x, kshape)
        else:
            acfg = qc.activation_for_axis(x.ndim - 1)
            if acfg is not None:
                x = FakeQuantize(acfg, name="act_fq")(x, training=training)
            kernel = self.param("kernel", nn.initializers.lecun_normal(
                batch_axis=(0,)), kshape)
            wcfg = qc.weight_for_axis(0)  # per-EXPERT scales
            if wcfg is not None:
                kernel = FakeQuantize(wcfg, name="weight_fq")(
                    kernel, training=training)
            y = jnp.einsum("eck,ekn->ecn", x, kernel,
                           preferred_element_type=jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        return (y + bias).astype(x.dtype)

    def _serve(self, x, kshape):
        qc = self.qconfig.resolve(self.path)
        wspec = qc.required_weight_for_axis(0).spec
        packed = self.variable(
            "quantized", "kernel",
            lambda: _dummy_packed(kshape, wspec, 0)).value
        if qc.activation is not None:
            c = x.shape[-1] if qc.activation.spec.per_channel else 1
            ascale = self.variable("quantized", "act_scale",
                                   lambda: jnp.ones((c,), jnp.float32)).value
            azp = self.variable("quantized", "act_zp",
                                lambda: jnp.zeros((c,), jnp.int32)).value
            if qc.act_mode == "dynamic":
                raise ValueError(
                    "QuantMoE serving supports act_mode 'none', 'static' or "
                    "'static_int8'; got 'dynamic' (per-microbatch dynamic "
                    "ranges interact with routing — use static qparams)")
            if qc.act_mode == "static_int8":
                return self._serve_int8(x, packed, ascale, azp)
            if qc.act_mode == "static":
                x = _static_act_quant(x, ascale, azp, qc.activation.spec)
        # Weight-only fused dequant: (q - zp)·s with s per-expert (or
        # per-tensor) factors OUT of the d-contraction —
        #   y[e,c,n] = s_e · (Σ_k x·q  −  zp_e · Σ_k x)
        # exactly (pack.dequantize_weight is the oracle; test_moe.py pins it).
        if qc.serve_impl == "pallas":
            return self._serve_pallas(x, packed)
        prec = qc.serve_precision
        cd = jnp.float32 if prec == "highest" else jnp.bfloat16
        s = packed.scale.reshape(-1, 1, 1)        # (E|1, 1, 1)
        zp = packed.zero_point.reshape(-1, 1, 1).astype(jnp.float32)
        y = jnp.einsum("eck,ekn->ecn", x.astype(cd),
                       _expert_carrier(packed).astype(cd),
                       preferred_element_type=jnp.float32)
        corr = zp * jnp.sum(x, axis=-1, dtype=jnp.float32)[..., None]
        return (y - corr) * s

    def _serve_pallas(self, x, packed):
        """Expert-scanned fused weight-only matmul: one tuned 2-D
        ``wo_matmul`` Pallas launch per expert (serve/matmul.py — the kernel
        with input/output aliasing that the single-layer serving path
        measured at the chip's weight-stream ceiling), scanned over the
        stacked E axis so each expert's weights stream exactly once."""
        from ..serve.matmul import wo_matmul
        from ..serve.pack import PackedWeight

        E = x.shape[0]
        K, N = packed.orig_shape[1], packed.orig_shape[2]
        s = jnp.broadcast_to(packed.scale, (E,))
        zp = jnp.broadcast_to(packed.zero_point, (E,))

        def body(_, ops):
            xe, de, se, ze = ops
            pe = PackedWeight(data=de, scale=se[None], zero_point=ze[None],
                              bits=packed.bits, axis=1, k_axis=0,
                              orig_shape=(K, N))
            return None, wo_matmul(xe, pe, impl="pallas")

        _, y = jax.lax.scan(body, None, (x, packed.data, s, zp))
        return y

    def _serve_int8(self, x, packed, ascale, azp):
        """Stacked int8×int8 expert einsum with the full dequant epilogue —
        the batched analogue of serve/matmul.static_int8_matmul's identity::

            out[e,c,n] = sx·s_e·[ xq@wq − zpx·Σ_k wq[e,k,n]
                                  − zp_e·Σ_k xq[e,c,k] + K·zpx·zp_e ]

        exact in integers up to the i32 accumulator, streaming BOTH operands
        at int8 width.  Per-tensor activation qparams; per-expert (or
        per-tensor) weight qparams broadcast as (E|1, 1, 1)."""
        aspec = self.qconfig.resolve(self.path).activation.spec
        if ascale.shape[0] != 1:
            raise ValueError("static activation qparams must be per-tensor")
        sx = ascale.astype(jnp.float32)[0]
        zpx = azp.astype(jnp.float32)[0]
        # unsigned ranges (quint8) overflow the int8 carrier: recentre by 128
        shift = 128.0 if aspec.quant_max > 127 else 0.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx + zpx),
                      aspec.quant_min, aspec.quant_max) - shift
        xq = xq.astype(jnp.int8)
        zpx = zpx - shift
        wq = _expert_carrier(packed)  # int8 view (int4 stacks unpack)
        acc = jnp.einsum("eck,ekn->ecn", xq, wq,
                         preferred_element_type=jnp.int32)
        sw = packed.scale.reshape(-1, 1, 1).astype(jnp.float32)
        zpw = packed.zero_point.reshape(-1, 1, 1).astype(jnp.float32)
        colsum_w = jnp.sum(wq.astype(jnp.int32), axis=1)           # (E, N)
        rowsum_x = jnp.sum(xq.astype(jnp.int32), axis=-1)          # (E, C)
        kdim = x.shape[-1]
        out = (acc.astype(jnp.float32)
               - zpx * colsum_w.astype(jnp.float32)[:, None, :]
               - zpw * rowsum_x.astype(jnp.float32)[..., None]
               + float(kdim) * zpx * zpw)
        return out * (sx * sw)


class QuantMoE(nn.Module):
    """Top-k routed MoE MLP layer: x (..., d) → (..., d).

    Every expert is a 2-layer gelu MLP (`hidden` wide) whose matmuls carry
    the same LSQ weight/activation fake-quantizers as QuantDense.  Routing is
    float softmax top-k with fixed capacity; dropped tokens contribute zero
    (callers wrap in a residual).  The Switch aux load-balance loss is
    written to the ``losses`` variable collection (weighted by
    ``aux_loss_weight``) — ``parallel.make_train_step`` folds it into the
    objective automatically.

    Expert parallelism: see ``jaxlsq.parallel.moe.moe_sharding`` — the
    stacked (E, …) params/qparams shard over a mesh 'expert' axis and the
    dispatch/combine einsums lower to all-to-alls.

    Decode-serving note: tokens decoded in the same step batch are routed
    TOGETHER, so capacity drops couple slots.  With
    ``capacity_factor >= num_experts / top_k`` capacity can never bind
    (C == N) and routing is exactly per-token — required for the
    continuous-batching engines' staggered == lockstep guarantee
    (test_moe.py::TestMoELM).
    """

    hidden: int
    num_experts: int
    qconfig: QConfig
    top_k: int = 2
    capacity_factor: float = 1.25
    aux_loss_weight: float = 0.01

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        if not 1 <= self.top_k <= self.num_experts:
            raise ValueError(
                f"top_k={self.top_k} must be in [1, {self.num_experts}]")
        *lead, d = x.shape
        N = math.prod(lead)
        E, K = self.num_experts, self.top_k
        C = max(1, math.ceil(K * N * self.capacity_factor / E))
        C = min(C, N)  # an expert can never receive more than every token
        xt = x.reshape(N, d)

        # --- routing (float; router precision is load-bearing) ---
        logits = nn.Dense(E, use_bias=False, name="router")(
            xt.astype(jnp.float32))
        gates = jax.nn.softmax(logits, axis=-1)           # (N, E)
        dispatch, combine = route(gates, K, C)            # (N, E, C) each
        dispatch = dispatch.astype(x.dtype)

        # --- expert compute (batched matmuls; EP shards axis 0) ---
        xe = jnp.einsum("nec,nd->ecd", dispatch, xt)      # (E, C, d)
        h = _ExpertDense(self.hidden, self.qconfig,
                         name="experts_up")(xe, training=training)
        h = nn.gelu(h)
        ye = _ExpertDense(d, self.qconfig,
                          name="experts_down")(h, training=training)
        y = jnp.einsum("nec,ecd->nd", combine.astype(x.dtype),
                       ye.astype(x.dtype))

        if self.qconfig.mode != "serve":
            aux = self.variable("losses", "aux",
                                lambda: jnp.zeros((), jnp.float32))
            if self.is_mutable_collection("losses"):
                aux.value = self.aux_loss_weight * load_balance_loss(
                    gates, jnp.argmax(gates, axis=-1))
        return y.reshape(*lead, d)
