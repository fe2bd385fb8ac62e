"""Pipeline-parallel QAT training for the quantized transformer LM.

The reference has no distributed layer at all (SURVEY.md §2c); data, tensor,
sequence, and expert parallelism live in ``parallel/train.py``, ``serve/
convert.py``, and ``parallel/moe.py``.  This module adds the remaining axis:
GPipe-style PIPELINE parallelism, built the TPU way —

* **Stage-stacked parameters.**  The LM's ``depth`` blocks are restacked into
  ONE pytree whose leaves carry a leading ``(S, depth//S, …)`` axis, sharded
  ``P('stage', …)`` over the mesh.  No per-stage programs, no RPC: one SPMD
  program where each device holds its stage's slab.
* **scan + ppermute schedule.**  Inside ``jax.shard_map`` the whole GPipe
  schedule — ``MB + S - 1`` ticks, microbatch ``j`` entering stage ``s`` at
  tick ``j + s`` — is ONE ``lax.scan``; stage handoff is a single
  ``lax.ppermute`` ring-shift per tick on ICI.  XLA overlaps the permute
  with the next tick's compute.
* **Differentiate through the schedule.**  ``jax.value_and_grad`` of the
  scanned loop IS the backward pipeline: reversing the scan replays the
  ticks backward and transposes each ppermute into the reverse shift —
  exactly GPipe's B-pass, for free.  Activation stash = the scan's saved
  residuals (wrap the step in ``jax.checkpoint`` policies externally if HBM
  is tight).
* **QAT semantics == gradient accumulation.**  Each quantizer sees the
  microbatches in submission order (observer EMA, init-window counters, LSQ
  grad scale on the microbatch numel), so a pipeline step is numerically
  the ``make_train_step(accum_steps=MB)`` step — pinned exactly by
  tests/test_pipeline.py.  Observer writes carry no gradient
  (observers/quantizer.py:171 stop_gradient), so whole-chain differentiation
  introduces no extra terms.  One documented deviation: on the single step
  where a quantizer's observer window CLOSES mid-step (a write lands between
  microbatches), the accum path still takes the post-write microbatches'
  scale gradients while this path differentiates wrt the pre-write value
  (the write is stop_gradient) — those gradients are deferred to the next
  step.  Bounded by lr·|dS|/MB, warmup-only, loss/observer-state unaffected
  (pinned by test_pipeline.py::test_observer_window_transition).

Bubble ticks run the stage on stale buffer contents (static shapes — XLA
requirement); their state writes and loss contributions are masked out.  The
embed and the vocab-wide head+loss run under ``lax.cond`` gated to stage 0 /
S-1 — per-device control flow is legal inside shard_map (no collectives in
the branches), so the other stages skip those FLOPs entirely instead of
computing-and-masking.

Composes with data parallelism: the mesh is ``(data, stage)``; the batch
shards over 'data', grads psum over 'data', stage slabs stay put.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .train import QATTrainState

__all__ = ["pipeline_mesh", "stack_pipeline_variables",
           "unstack_pipeline_variables", "pipeline_sharding",
           "create_pipeline_state", "make_pipeline_train_step"]


def pipeline_mesh(stage: int, data: int = 1,
                  devices: Optional[Any] = None) -> Mesh:
    """A (data, stage) mesh for pipeline(+data)-parallel training."""
    devices = list(devices if devices is not None else jax.devices())
    if data * stage > len(devices):
        raise ValueError(f"mesh {data}x{stage} needs {data * stage} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[: data * stage]).reshape(data, stage)
    return Mesh(arr, axis_names=("data", "stage"))


def stack_pipeline_variables(tree: Any, depth: int, stages: int) -> Any:
    """Restack a collection tree's ``block{i}`` scopes into one ``blocks``
    entry with leading (S, depth//S) axes (per-stage slabs).  Non-block keys
    pass through.  Inverse: :func:`unstack_pipeline_variables`."""
    if not isinstance(tree, dict) or "block0" not in tree:
        return tree
    if depth % stages:
        raise ValueError(f"depth {depth} not divisible by {stages} stages")
    L = depth // stages
    blocks = [tree[f"block{i}"] for i in range(depth)]
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs).reshape((stages, L) + xs[0].shape),
        *blocks)
    out = {k: v for k, v in tree.items() if not k.startswith("block")}
    out["blocks"] = stacked
    return out


def unstack_pipeline_variables(tree: Any, depth: int) -> Any:
    """``blocks`` (S, L, …) → ``block{i}`` scopes (checkpoint/serving
    interop: feed the result to ``jaxlsq.serve.convert`` or the plain LM)."""
    if not isinstance(tree, dict) or "blocks" not in tree:
        return tree
    stacked = jax.tree.map(
        lambda a: a.reshape((-1,) + a.shape[2:]), tree["blocks"])
    out = {k: v for k, v in tree.items() if k != "blocks"}
    for i in range(depth):
        out[f"block{i}"] = jax.tree.map(lambda a: a[i], stacked)
    return out


def pipeline_sharding(mesh: Mesh, tree: Any) -> Any:
    """NamedSharding pytree for a stacked state: leaves under a ``blocks``
    key get P('stage', …) on their leading axis; everything else (embed,
    head, norms, scalars, optimizer mirrors of all of these) replicates."""
    def one(path, leaf):
        names = {getattr(k, "key", getattr(k, "name", None)) for k in path}
        if "blocks" in names and hasattr(leaf, "ndim") and leaf.ndim >= 1:
            return NamedSharding(
                mesh, P("stage", *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, tree)


def _tree_where(cond, new, old):
    return jax.tree.map(
        lambda a, b: jnp.where(cond, a, b), new, old)


def _from_stage(tree, sid, s, axis="stage"):
    """Select each leaf's value from stage ``s`` (psum of a masked copy;
    bool/int leaves ride through f32)."""
    def pick(v):
        keep = jnp.where(sid == s, v.astype(jnp.float32),
                         jnp.zeros(v.shape, jnp.float32))
        return jax.lax.psum(keep, axis).astype(v.dtype)

    return jax.tree.map(pick, tree)


def create_pipeline_state(model, tx: optax.GradientTransformation,
                          mesh: Mesh, sample_tokens,
                          rngs=None) -> QATTrainState:
    """Init the LM normally, restack blocks into per-stage slabs, and place
    the state on the mesh (`pipeline_sharding`)."""
    S = mesh.shape["stage"]
    variables = model.init(rngs or jax.random.key(0), sample_tokens,
                           training=False)
    params = {
        "params": stack_pipeline_variables(variables["params"],
                                           model.depth, S),
        "qparams": stack_pipeline_variables(variables.get("qparams", {}),
                                            model.depth, S),
    }
    model_state = {
        k: stack_pipeline_variables(v, model.depth, S)
        for k, v in variables.items() if k not in ("params", "qparams")
    }
    state = QATTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        model_state=model_state,
        opt_state=tx.init(params),
    )
    return jax.tree.map(jax.device_put, state, pipeline_sharding(mesh, state))


def _lm_loss(logits, labels):
    return optax.softmax_cross_entropy_with_integer_labels(
        logits[:, :-1], labels[:, 1:]).mean()


def make_pipeline_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    *,
    num_microbatches: int,
    loss_fn: Callable = _lm_loss,
    donate: bool = True,
    remat: bool = False,
):
    """Build the pipelined QAT train step: (stacked state, batch) → (state,
    metrics).  ``batch`` = {'input': (B, t) tokens, 'label': (B, t)}; B must
    split as ``data_axis × num_microbatches × microbatch``.  ``loss_fn``
    takes (logits, labels) for ONE microbatch.

    The model must be a ``QuantTransformerLM``-shaped module (tok_emb /
    optional pos_emb / block{i} / ln_f / lm_head scopes); MoE blocks are not
    pipelined yet (combine expert and pipeline axes deliberately, not by
    accident).

    ``remat=True`` wraps each block application in ``jax.checkpoint``: the
    backward pipeline recomputes block activations instead of stashing every
    tick's residuals — the standard HBM-for-FLOPs trade for deep stages.
    Numerically identical (pinned by test_pipeline.py).
    """
    from ..models.layers import QuantDense, QuantEmbed
    from ..models.zoo import QuantTransformerBlock

    if getattr(model, "moe_experts", None):
        raise NotImplementedError(
            "pipeline over MoE blocks is not wired (expert axis and stage "
            "axis would need a joint schedule); use moe_sharding for EP")
    S = int(mesh.shape["stage"])
    D = int(mesh.shape["data"])
    depth = model.depth
    if depth % S:
        raise ValueError(f"depth {depth} not divisible by stage={S}")
    L = depth // S
    MB = int(num_microbatches)
    if MB < 1:
        raise ValueError(f"num_microbatches must be >= 1, got {MB}")
    rope = getattr(model, "pos_embedding", "learned") == "rope"
    blk = QuantTransformerBlock(model.dim, model.num_heads, model.qconfig,
                                num_kv_heads=model.num_kv_heads, rope=rope)
    emb = QuantEmbed(model.vocab, model.dim, model.qconfig)
    head = QuantDense(model.vocab, model.qconfig, use_bias=False)
    ln_f = nn.LayerNorm()
    perm = [(i, (i + 1) % S) for i in range(S)]
    MUT = ["qparams", "quant_state"]

    def _sub(tree_p, tree_qp, tree_qs, name):
        v = {"params": tree_p[name]}
        if name in tree_qp:
            v["qparams"] = tree_qp[name]
        if name in tree_qs:
            v["quant_state"] = tree_qs[name]
        return v

    def local_step(params, quant_state, tokens, labels):
        """Runs INSIDE shard_map.  params = {'params','qparams'} with local
        'blocks' slabs of shape (1, L, …); quant_state likewise."""
        sid = jax.lax.axis_index("stage")
        Bl, t = tokens.shape
        if Bl % MB:
            raise ValueError(
                f"local batch {Bl} not divisible by {MB} microbatches")
        Bm = Bl // MB
        mtoks = tokens.reshape(MB, Bm, t)
        mlabels = labels.reshape(MB, Bm, t)

        def loss_of(train):
            p, qp = train["params"], train["qparams"]
            qs = quant_state
            bp = jax.tree.map(lambda a: a[0], p["blocks"])      # (L, …)
            bqp = jax.tree.map(lambda a: a[0], qp.get("blocks", {}))
            bqs = jax.tree.map(lambda a: a[0], qs.get("blocks", {}))
            emb_v = _sub(p, qp, qs, "tok_emb")
            head_v = _sub(p, qp, qs, "lm_head")

            def apply_block(p_j, qp_j, qs_j, xc):
                out, mut = blk.apply(
                    {"params": p_j, "qparams": qp_j, "quant_state": qs_j},
                    xc, training=True, mutable=MUT)
                return out, (mut["qparams"], mut["quant_state"])

            if remat:
                apply_block = jax.checkpoint(apply_block)

            def run_stage(bqp, bqs, x):
                def body(xc, slab):
                    p_j, qp_j, qs_j = slab
                    out, (nqp, nqs) = apply_block(p_j, qp_j, qs_j, xc)
                    return out, (nqp, nqs)

                x, (nqp, nqs) = jax.lax.scan(body, x, (bp, bqp, bqs))
                return x, nqp, nqs

            def tick(carry, i):
                (buf, e_qp, e_qs, h_qp, h_qs, bqp, bqs, loss_sum) = carry
                # ---- stage 0 injects microbatch i (clipped on bubbles).
                # The embed runs under lax.cond gated to stage 0: other
                # stages skip its FLOPs entirely (per-device control flow is
                # fine inside shard_map; no collectives in the branch) ----
                j_in = jnp.clip(i, 0, MB - 1)

                def do_embed(ops):
                    e_qp, e_qs = ops
                    x0, e_mut = emb.apply(
                        {**emb_v, "qparams": e_qp, "quant_state": e_qs},
                        mtoks[j_in], training=True, mutable=MUT)
                    if not rope:
                        x0 = x0 + p["pos_emb"][None, :t]
                    inj = i < MB  # don't observe the clipped repeat batches
                    return (x0.astype(buf.dtype),
                            _tree_where(inj, e_mut["qparams"], e_qp),
                            _tree_where(inj, e_mut["quant_state"], e_qs))

                x, e_qp, e_qs = jax.lax.cond(
                    sid == 0, do_embed, lambda ops: (buf, *ops),
                    (e_qp, e_qs))

                # ---- this stage's L blocks (masked on bubble ticks) ----
                active = (i >= sid) & (i - sid < MB)
                y, nbqp, nbqs = run_stage(bqp, bqs, x)
                bqp = _tree_where(active, nbqp, bqp)
                bqs = _tree_where(active, nbqs, bqs)

                # ---- last stage heads microbatch i-(S-1); ln_f + the
                # vocab-wide head matmul + loss run ONLY there (cond) ----
                jv = i - (S - 1)

                def do_head(ops):
                    h_qp, h_qs = ops
                    z = ln_f.apply({"params": p["ln_f"]}, y)
                    logits, h_mut = head.apply(
                        {**head_v, "qparams": h_qp, "quant_state": h_qs},
                        z, training=True, mutable=MUT)
                    li = loss_fn(logits, mlabels[jnp.clip(jv, 0, MB - 1)])
                    keep = jv >= 0  # bubble tail: logits are stale
                    return (jnp.where(keep, li, 0.0),
                            _tree_where(keep, h_mut["qparams"], h_qp),
                            _tree_where(keep, h_mut["quant_state"], h_qs))

                li, h_qp, h_qs = jax.lax.cond(
                    sid == S - 1, do_head,
                    lambda ops: (jnp.zeros((), jnp.float32), *ops),
                    (h_qp, h_qs))
                loss_sum = loss_sum + li

                send = jax.lax.ppermute(y, "stage", perm)
                return (send, e_qp, e_qs, h_qp, h_qs, bqp, bqs,
                        loss_sum), None

            buf0 = jnp.zeros((Bm, t, model.dim), jnp.float32)
            carry0 = (buf0, emb_v.get("qparams", {}),
                      emb_v.get("quant_state", {}),
                      head_v.get("qparams", {}),
                      head_v.get("quant_state", {}),
                      bqp, bqs, jnp.zeros((), jnp.float32))
            carry, _ = jax.lax.scan(tick, carry0, jnp.arange(MB + S - 1))
            (_, e_qp, e_qs, h_qp, h_qs, bqp, bqs, loss_sum) = carry

            # LOCAL loss: nonzero only on the last stage, but fully
            # differentiable through the ppermute chain (its transpose is
            # the reverse ring-shift), so every stage's params get their
            # gradients without any collective here.  Do NOT psum inside
            # the differentiated fn — psum's transpose is psum, which
            # would scale every cotangent by the stage-axis size.
            loss = loss_sum / (MB * D)
            aux = (e_qp, e_qs, h_qp, h_qs, bqp, bqs)
            return loss, aux

        train = {"params": params["params"], "qparams": params["qparams"]}
        (loss, aux), grads = jax.value_and_grad(
            loss_of, has_aux=True)(train)
        e_qp, e_qs, h_qp, h_qs, bqp, bqs = aux
        sid = jax.lax.axis_index("stage")

        # grads: every leaf sums over 'data'; shared (non-block) leaves also
        # sum over 'stage' (embed grads live on stage 0, head on S-1, the
        # pos table/ln_f wherever they were touched)
        def fix_grads(path, g):
            g = jax.lax.psum(g, "data")
            if not any(getattr(k, "key", None) == "blocks" for k in path):
                g = jax.lax.psum(g, "stage")
            return g

        grads = jax.tree_util.tree_map_with_path(fix_grads, grads)
        # reporting only (outside the grad): share the last stage's loss
        loss = jax.lax.psum(jax.lax.psum(loss, "stage"), "data")

        # mutated state: blocks stay stage-local (restore the leading stage
        # axis); embed identical on all stages (written while injecting);
        # head authoritative on the last stage
        e_qp = _from_stage(e_qp, sid, 0)
        e_qs = _from_stage(e_qs, sid, 0)
        h_qp = _from_stage(h_qp, sid, S - 1)
        h_qs = _from_stage(h_qs, sid, S - 1)
        lead = lambda tr: jax.tree.map(lambda a: a[None], tr)

        def merged(base, upd):
            # only overwrite scopes that exist (unquantized models carry
            # empty qparams/quant_state — keep the structure identical)
            out = dict(base)
            for k, v in upd.items():
                if k in out:
                    out[k] = v
            return out

        new_qp = merged(params["qparams"],
                        {"tok_emb": e_qp, "lm_head": h_qp,
                         "blocks": lead(bqp)})
        new_qs = merged(quant_state,
                        {"tok_emb": e_qs, "lm_head": h_qs,
                         "blocks": lead(bqs)})
        if D > 1:
            # Observer-mutated state is data-shard-LOCAL (each replica's
            # observers streamed only its own batch shard), but the step's
            # out_shardings declare it replicated — without a reduction the
            # replicas' buffers silently diverge.  pmean over 'data' makes
            # them identical: counters/flags are equal on every replica
            # (mean == identity; ints/bools skipped), and min/max/EMA
            # ranges average — an approximation of the GSPMD DP step's
            # global-batch observer stream that converges to the same
            # ranges and keeps the state deterministic.
            def _sync(a):
                if jnp.issubdtype(a.dtype, jnp.floating):
                    return jax.lax.pmean(a, "data")
                return a

            new_qp = jax.tree.map(_sync, new_qp)
            new_qs = jax.tree.map(_sync, new_qs)
        return loss, grads, new_qp, new_qs

    def _specs(tree):
        def one(path, leaf):
            names = [getattr(k, "key", None) for k in path]
            if "blocks" in names:
                return P("stage", *([None] * (leaf.ndim - 1)))
            return P()

        return jax.tree_util.tree_map_with_path(one, tree)

    def step(state: QATTrainState, batch):
        tokens, labels = batch["input"], batch["label"]
        params = state.params
        qs = state.model_state.get("quant_state", {})
        sm = jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(_specs(params), _specs(qs),
                      P("data", None), P("data", None)),
            out_specs=(P(), _specs(params), _specs(params["qparams"]),
                       _specs(qs)),
            check_vma=False)
        loss, grads, new_qp, new_qs = sm(params, qs, tokens, labels)

        updates, new_opt_state = tx.update(grads, state.opt_state, params)
        base = {"params": params["params"], "qparams": new_qp}
        new_params = optax.apply_updates(base, updates)
        new_model_state = dict(state.model_state)
        if "quant_state" in new_model_state:
            new_model_state["quant_state"] = new_qs
        new_state = QATTrainState(
            step=state.step + 1,
            params=new_params,
            model_state=new_model_state,
            opt_state=new_opt_state,
        )
        return new_state, {"loss": loss}

    return jax.jit(step, donate_argnums=(0,) if donate else ())
