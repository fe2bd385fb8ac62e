"""QAT optimizer partition: weights vs. quantizer step-size parameters.

The LSQ recipe (arXiv:1902.08153 §3.1, carried by the reference through its
``use_grad_scaling``/``grad_scaler`` knobs, /root/reference/torchlsq/
functional.py:66-68) balances the scale/shift updates against the weight
updates with the ``1/sqrt(numel·quant_max)`` gradient scale — a design that
assumes an SGD-class optimizer, where the UPDATE is proportional to the
GRADIENT.  Adam-class optimizers normalize each parameter's update to ~lr
regardless of gradient magnitude, which silently nullifies the grad scale:
every step moves a quantizer scale by ~lr — often 10%+ of the scale's own
magnitude — and AdamW additionally weight-decays scale/shift toward zero,
which is never meaningful for a quantization range.

``qat_optimizer`` restores the paper's semantics without giving up Adam for
the weights: it partitions the train-state tree at the top-level collections
(``'params'`` → weights transform, ``'qparams'`` → quantizer transform) and
defaults the quantizer side to SGD with momentum 0.9 and NO weight decay, so
the LSQ grad scale is load-bearing again.

Measured evidence (mobilenetv2 CIFAR w8a8, 1500 steps):

* WHY the partition exists — the scale-health diagnostic
  docs/measurements/learnable_diag_tpu.json: unguarded adamw on the qparams
  drove 428/2939 activation scales negative during the LSQ+ init window
  (top-1 −6.1%) while the guarded partition kept every scale positive.
  Stabilizing ``init_mode='learnable'`` is the partition's tested purpose.
* A MEASURED NEGATIVE for full-run paper-class SGD on conv-net activation
  qparams: the ``sgdq`` recipe (this partition with SGD cosine-3e-3 m=0.9
  on the qparams, adamw weights) COLLAPSES mobilenetv2 w8a8 to random
  (−86% top-1, 3 seeds — ``seed*/sgdq`` in recipe_sweep_mnv2_tpu.json).
  Mechanism (CPU repro): post-window, momentum concentrates descent on a
  few activation scales (min scale −35% per 5 steps); once a scale is
  small enough that every input saturates, the STE mask zeroes dX — the
  layer is dead, no task gradient flows — and dS loses its in-range
  restoring term, so the eps floor just pins the absorbing state.
  Adam-class optimizers escape it because the next sign flip moves the
  scale back at full ~lr regardless of gradient magnitude.  Keep Adam on
  conv-net qparams (the measured-safe default) unless the qparam lr is
  well below the weight lr.

Usage::

    tx = qat_optimizer(optax.adamw(sched))           # qparams: SGD(m=0.9)
    tx = qat_optimizer(optax.adamw(sched),           # explicit quantizer tx
                       optax.sgd(sched_q, momentum=0.9))
    state = create_train_state(model, tx, x0)        # drop-in everywhere
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import optax

__all__ = ["qat_optimizer", "project_scale_floor"]


def project_scale_floor(eps: float = 1.1920929e-07
                        ) -> optax.GradientTransformation:
    """Params-aware projection: after the update, every leaf keyed ``scale``
    satisfies ``scale >= eps`` (f32 machine epsilon by default — the same
    floor the kernels clamp to, core/golden.py::clamp_scale).

    Why: the fake-quant forward uses ``max(eps, |scale|)`` (lsq_kernel.h:
    157-158), so a scale parameter driven *negative* by the optimizer doesn't
    break the forward — but it inverts the gradient's effect on the raw
    parameter: descent that should shrink the effective scale now GROWS
    ``|scale|`` without bound.  Measured during LSQ+ backprop-init
    (init_mode='learnable') with adamw: 428/2939 activation scales negative
    within 120 steps, top-1 −6.1%.  torch.ao's ``_LearnableFakeQuantize``
    applies exactly this clamp after each step for the same reason.

    Implemented like ``optax.keep_params_nonnegative``: the incoming update
    ``u`` for a scale leaf with current value ``p`` becomes
    ``max(p + u, eps) − p``.  Non-scale leaves and masked (non-array) leaves
    pass through untouched.  Requires ``params`` at ``update()`` time.
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("project_scale_floor requires params "
                             "(call tx.update(grads, state, params))")

        def proj(path, u, p):
            is_scale = (len(path) > 0
                        and getattr(path[-1], "key", None) == "scale")
            if not is_scale or not hasattr(u, "dtype") \
                    or not hasattr(p, "dtype"):
                return u
            return jnp.maximum(p + u, jnp.asarray(eps, p.dtype)) - p

        return (jax.tree_util.tree_map_with_path(proj, updates, params),
                state)

    return optax.GradientTransformation(init_fn, update_fn)


def qat_optimizer(
    weights_tx: optax.GradientTransformation,
    qparams_tx: Optional[optax.GradientTransformation] = None,
    *,
    qparam_lr: Union[float, optax.Schedule] = 0.01,
    qparam_momentum: float = 0.9,
    qparam_grad_clip: Optional[float] = 1.0,
    project_scale: bool = True,
) -> optax.GradientTransformation:
    """Partition the optimizer over the QAT train-state collections.

    Args:
      weights_tx: transform for everything under ``'params'`` (the model
        weights) — typically ``optax.adamw(...)``.
      qparams_tx: transform for everything under ``'qparams'`` (LSQ
        scale/shift).  Default: ``optax.sgd(qparam_lr, momentum=
        qparam_momentum)`` — the LSQ paper's optimizer class, no weight
        decay, so the ``1/sqrt(numel·quant_max)`` grad scale governs the
        update magnitude as designed.
      qparam_lr: learning rate (or schedule) for the default quantizer SGD;
        ignored when ``qparams_tx`` is given.
      qparam_momentum: momentum for the default quantizer SGD.
      qparam_grad_clip: global-norm clip over the qparams gradients, applied
        BEFORE ``qparams_tx`` (None disables).  The LSQ+ backprop-init border
        term ``2(x_fq−x)·(qmax−zp)`` is unbounded in x: one batch with a
        far-outlier activation produces a gradient spike orders of magnitude
        above steady state, which under SGD momentum diverges
        (measured: init_mode='learnable' + SGD → NaN train loss).  The clip
        bounds the spike without touching steady-state updates, whose norm
        the 1/sqrt(numel·qmax) grad scale keeps ≪ 1.
      project_scale: clamp every ``scale`` leaf to ≥ f32-eps after the
        update (see :func:`project_scale_floor`; torch.ao applies the same
        post-step clamp in ``_LearnableFakeQuantize``).

    Returns an ``optax.GradientTransformation`` over the full
    ``{'params': …, 'qparams': …}`` tree, drop-in for ``make_train_step`` /
    ``create_train_state``.  Models with no quantizers (``QConfig()``
    float baselines) have an empty ``'qparams'`` subtree and work unchanged.

    The partition matches on the TOP-LEVEL key only (cf. ADVICE r3 on
    ``fsdp.py``'s scope matching): a user parameter that happens to be
    *named* ``qparams`` deeper in the tree still gets the weights transform.
    """
    if qparams_tx is None:
        qparams_tx = optax.sgd(qparam_lr, momentum=qparam_momentum)
    pieces = []
    if qparam_grad_clip is not None:
        pieces.append(optax.clip_by_global_norm(qparam_grad_clip))
    pieces.append(qparams_tx)
    if project_scale:
        pieces.append(project_scale_floor())
    qparams_tx = optax.chain(*pieces) if len(pieces) > 1 else pieces[0]

    def label(params):
        return {
            "params": jax.tree.map(lambda _: "w", params.get("params", {})),
            "qparams": jax.tree.map(lambda _: "q", params.get("qparams", {})),
        }

    return optax.multi_transform({"w": weights_tx, "q": qparams_tx}, label)
