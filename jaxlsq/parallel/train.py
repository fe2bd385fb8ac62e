"""Canonical QAT train/eval steps, single-chip or data-parallel over a mesh.

This packages the train-step contract documented in jaxlsq/models/layers.py —
optimizer updates applied on top of observer-written qparams — as a ready-made
jitted step, optionally sharded over a ``Mesh``'s 'data' axis.

Sharding model: jit-with-NamedSharding (not shard_map).  The step is traced at
LOGICAL (global) shapes, so:

* XLA inserts the gradient all-reduce (psum over 'data') for the replicated
  params — including the quantizers' dS/dB — automatically;
* the LSQ grad-scale ``1/sqrt(N·qmax)`` sees the GLOBAL batch numel, giving
  exact paper semantics under data parallelism (the reference uses the local
  per-replica numel, lsq_cpu.cpp:103 — SURVEY.md §2c flags this subtlety; we
  resolve it to global-by-construction and document the deviation).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import replicated

__all__ = ["QATTrainState", "make_train_step", "make_eval_step",
           "create_train_state", "cross_entropy_loss", "distillation_loss"]


class QATTrainState(struct.PyTreeNode):
    """Everything that evolves during QAT, as one checkpointable pytree
    (SURVEY.md §5 'Checkpoint / resume': explicit state, no lazy-init trap)."""
    step: jnp.ndarray
    params: Any        # {'params': …, 'qparams': …} — both trainable
    model_state: Any   # {'quant_state': …, 'batch_stats': …} — mutable
    opt_state: Any


def cross_entropy_loss(logits, batch):
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, batch["label"]).mean()


def distillation_loss(teacher_model, teacher_variables, *,
                      alpha: float = 0.5, temperature: float = 2.0,
                      hard_loss: Callable = cross_entropy_loss) -> Callable:
    """QAT knowledge distillation: a ``loss_fn`` for :func:`make_train_step`
    that mixes the hard-label loss with a KL term against a FLOAT teacher
    (quantization-aware distillation, arXiv:1911.12491-style; the float
    model QAT starts from is the natural teacher and is already trained in
    any parity protocol).

    ``loss = alpha·hard_loss(student, batch)
             + (1−alpha)·T²·KL(softmax(teacher/T) ‖ softmax(student/T))``

    The teacher runs frozen (stop_gradient, ``training=False``, no mutable
    collections); its variables are closure constants, so no gradient flows
    to it and the student's optimizer state is unaffected.  Use with the
    same batch dict as ``hard_loss`` (needs 'input'/'image').

    No counterpart in the reference (it ships no training loop at all —
    SURVEY.md §2); this is a framework-native recovery lever for the
    BASELINE accuracy bar.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    t = float(temperature)

    def loss_fn(logits, batch):
        loss = alpha * hard_loss(logits, batch) if alpha > 0.0 else 0.0
        if alpha == 1.0:
            return loss
        x = batch.get("input", batch.get("image"))
        t_logits = jax.lax.stop_gradient(
            teacher_model.apply(teacher_variables, x, training=False))
        p_t = jax.nn.log_softmax(t_logits / t, axis=-1)
        p_s = jax.nn.log_softmax(logits / t, axis=-1)
        kl = jnp.sum(jnp.exp(p_t) * (p_t - p_s), axis=-1).mean()
        return loss + (1.0 - alpha) * (t * t) * kl

    return loss_fn


def create_train_state(model, tx: optax.GradientTransformation, sample_x,
                       rngs=None) -> QATTrainState:
    variables = model.init(rngs or jax.random.key(0), sample_x, training=False)
    # 'qparams' is absent for unquantized models (QConfig() baseline) — keep
    # the state shape uniform so the same train step serves both.
    params = {"params": variables["params"],
              "qparams": variables.get("qparams", {})}
    model_state = {k: v for k, v in variables.items()
                   if k not in ("params", "qparams")}
    return QATTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        model_state=model_state,
        opt_state=tx.init(params),
    )


_MUTABLE = ("quant_state", "qparams", "batch_stats", "losses")


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_fn: Callable = cross_entropy_loss,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    jit: bool = True,
    accum_steps: int = 1,
    state_sharding=None,
):
    """Build a jitted QAT train step: (state, batch) → (state, metrics).

    ``accum_steps > 1`` enables gradient accumulation: the batch's leading
    axis is split into that many microbatches scanned on device (one
    optimizer update per step; observers/BatchNorm see the microbatches in
    sequence).  For LSQ-exact parity with the equivalent full batch, set
    ``LSQQuantizer(numel=<effective batch numel>)`` on activation
    quantizers — their grad scale otherwise uses the microbatch numel.

    ``batch`` is a dict with at least 'image'/'input' (first key fed to the
    model) and whatever ``loss_fn`` needs.  With ``mesh``, the batch is
    expected sharded over 'data' (use ``shard_batch``) and the state
    replicated; XLA handles the collectives.

    ``jit=False`` returns the raw step for composition inside an outer
    ``lax.scan``/jit — e.g. a whole-epoch device loop, which matters on
    remote-dispatch backends where per-step dispatch latency would dominate
    (examples/accuracy_parity.py fuses 250 steps per dispatch this way).
    """

    def _grads_one(params, model_state, batch):
        x = batch.get("input", batch.get("image"))

        def compute_loss(p):
            out, mut = model.apply(
                {**p, **model_state}, x, training=True,
                mutable=list(k for k in _MUTABLE if k != "qparams") + ["qparams"])
            loss = loss_fn(out, batch)
            # auxiliary losses written by layers (e.g. QuantMoE's weighted
            # load-balance term in the 'losses' collection) join the
            # objective — they carry their own weights
            if "losses" in mut:
                loss = loss + jax.tree.reduce(
                    jnp.add, jax.tree.map(jnp.sum, mut["losses"]),
                    jnp.zeros((), jnp.float32))
            return loss, (out, mut)

        (loss, (out, mut)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(params)
        return loss, grads, mut

    def step(state: QATTrainState, batch):
        if accum_steps == 1:
            loss, grads, mut = _grads_one(state.params, state.model_state,
                                          batch)
        else:
            # Microbatching: split the batch leading axis into accum_steps
            # chunks, scan gradients (mean) while THREADING the mutable
            # state (observers/BN see each microbatch in sequence, exactly
            # like accum_steps separate forwards).  NOTE on LSQ grad scaling:
            # activation quantizers see the MICRO batch numel; configure
            # LSQQuantizer(numel=<full effective batch numel>) to reproduce
            # full-batch gradients exactly (weights are batch-independent).
            micro = jax.tree.map(
                lambda a: a.reshape(
                    (accum_steps, a.shape[0] // accum_steps) + a.shape[1:]),
                batch)

            def body(carry, mb):
                params, model_state, gsum = carry
                loss, grads, mut = _grads_one(params, model_state, mb)
                params = {"params": params["params"],
                          "qparams": mut["qparams"]}
                model_state = {**model_state,
                               **{k: v for k, v in mut.items()
                                  if k != "qparams"}}
                gsum = jax.tree.map(jnp.add, gsum, grads)
                return (params, model_state, gsum), loss

            g0 = jax.tree.map(jnp.zeros_like, state.params)
            (params_mut, mstate_mut, gsum), losses = jax.lax.scan(
                body, (state.params, state.model_state, g0), micro)
            loss = jnp.mean(losses)
            grads = jax.tree.map(lambda g: g / accum_steps, gsum)
            mut = {"qparams": params_mut["qparams"], **{
                k: v for k, v in mstate_mut.items()}}
            state = state.replace(model_state=mstate_mut)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        # optimizer updates on top of observer-written qparams (see
        # jaxlsq/models/layers.py module docstring for why this is exact)
        base = {"params": state.params["params"], "qparams": mut["qparams"]}
        new_params = optax.apply_updates(base, updates)
        new_model_state = {**state.model_state,
                           **{k: v for k, v in mut.items() if k != "qparams"}}
        new_state = QATTrainState(
            step=state.step + 1,
            params=new_params,
            model_state=new_model_state,
            opt_state=new_opt_state,
        )
        metrics = {"loss": loss}
        return new_state, metrics

    if not jit:
        return step
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    # state_sharding: a pytree of NamedShardings matching QATTrainState —
    # e.g. parallel.moe.moe_sharding for expert-parallel stacked weights;
    # default replicates everything (pure DP)
    state_sh = replicated(mesh) if state_sharding is None else state_sharding
    batch_sh = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, replicated(mesh)),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model, mesh: Optional[Mesh] = None, state_sharding=None):
    """Eval forward (no state mutation persisted): (state, batch) → logits.

    ``state_sharding``: the state's placement tree (e.g.
    ``parallel.moe.moe_sharding`` for expert-parallel stacked weights) —
    without it an EP state would be resharded to fully replicated,
    all-gathering every expert stack per eval call."""

    def step(state: QATTrainState, batch):
        x = batch.get("input", batch.get("image"))
        out, _ = model.apply(
            {**state.params, **state.model_state}, x, training=False,
            mutable=list(_MUTABLE))
        return out

    if mesh is None:
        return jax.jit(step)
    state_sh = replicated(mesh) if state_sharding is None else state_sharding
    return jax.jit(step, in_shardings=(state_sh,
                                       NamedSharding(mesh, P("data"))),
                   out_shardings=NamedSharding(mesh, P("data")))
