"""5-axis parallel QAT demo: expert-parallel MoE LM + pipeline-parallel LM.

The reference has no distributed layer at all (SURVEY.md §2c); this example
shows the two round-3 axes on top of DP/TP/SP — all on whatever devices are
visible (run with XLA_FLAGS=--xla_force_host_platform_device_count=8 and a
CPU backend for a laptop-size virtual mesh):

  1. EP — a QuantTransformerLM with MoE MLP blocks (per-expert LSQ scales),
     stacked expert weights sharded over an 'expert' mesh axis via
     `moe_sharding`, trained with the ORDINARY `make_train_step`
     (state_sharding=...), then converted and greedily decoded on the int8
     serving path.
  2. PP — a dense LM restacked into per-stage slabs and trained with the
     GPipe scan+ppermute step (`make_pipeline_train_step`), then unstacked
     back into plain-LM variables.

  python examples/parallel_qat.py --steps 10
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jaxlsq.models import QuantTransformerLM, default_qconfig
from jaxlsq.parallel import (create_pipeline_state, create_train_state,
                             make_pipeline_train_step, make_train_step,
                             pipeline_mesh, unstack_pipeline_variables)
from jaxlsq.parallel.moe import moe_sharding
from jaxlsq.serve import convert, make_generate

VOCAB, DIM, DEPTH, T = 128, 64, 4, 32


def lm_loss(logits, batch):
    return optax.softmax_cross_entropy_with_integer_labels(
        logits[:, :-1], batch["label"][:, 1:]).mean()


def batches(b, steps, seed=0):
    r = np.random.RandomState(seed)
    for _ in range(steps):
        toks = jnp.asarray(r.randint(0, VOCAB, size=(b, T)))
        yield {"input": toks, "label": toks}


def run_ep(args):
    n = jax.device_count()
    ep = 4 if n % 4 == 0 else (2 if n % 2 == 0 else 1)
    devs = np.asarray(jax.devices()[:n]).reshape(n // ep, ep)
    mesh = Mesh(devs, axis_names=("data", "expert"))
    print(f"[EP] mesh data={n // ep} expert={ep}")

    qc = default_qconfig(8, 8, per_channel_weights=True, init_batches=2)
    model = QuantTransformerLM(
        vocab=VOCAB, dim=DIM, depth=2, num_heads=4, qconfig=qc, max_len=T,
        pos_embedding="rope", moe_experts=4, moe_top_k=2,
        moe_capacity_factor=2.0)
    tx = optax.sgd(1e-2, momentum=0.9)
    b = 4 * mesh.shape["data"]
    state = create_train_state(model, tx, next(batches(2, 1))["input"])
    sh = moe_sharding(mesh, state, num_experts=4)
    state = jax.tree.map(jax.device_put, state, sh)
    step = make_train_step(model, tx, loss_fn=lm_loss, mesh=mesh,
                           state_sharding=sh, donate=False)
    bsh = lambda a: jax.device_put(a, NamedSharding(
        mesh, P("data", *([None] * (a.ndim - 1)))))
    for i, batch in enumerate(batches(b, args.steps)):
        state, metrics = step(state, jax.tree.map(bsh, batch))
        if i % max(1, args.steps // 5) == 0:
            print(f"[EP] step {i} loss {float(metrics['loss']):.4f} "
                  "(incl. load-balance aux)")

    # serve: convert + greedy decode on the int8 path (expert stacks packed
    # with per-expert scales)
    host_state = jax.device_get(state)
    sv = convert({**host_state.params, **host_state.model_state}, qc)
    sm = dataclasses.replace(model, qconfig=qc.for_serving("static",
                                                           impl="xla"))
    gen = jax.jit(make_generate(sm, prompt_len=8, n_new=8, jit=False))
    prompts = next(batches(2, 1, seed=7))["input"][:, :8]
    out = gen(sv, prompts)
    print(f"[EP] int8 MoE decode: {np.asarray(out)[0].tolist()}")


def run_pp(args):
    n = jax.device_count()
    stage = 4 if n % 4 == 0 else (2 if n % 2 == 0 else 1)
    mesh = pipeline_mesh(stage=stage, data=n // stage)
    print(f"[PP] mesh data={n // stage} stage={stage}")

    qc = default_qconfig(8, 8, init_batches=2)
    model = QuantTransformerLM(vocab=VOCAB, dim=DIM, depth=DEPTH,
                               num_heads=4, qconfig=qc, max_len=T)
    tx = optax.sgd(1e-2, momentum=0.9)
    state = create_pipeline_state(model, tx, mesh,
                                  next(batches(2, 1))["input"])
    step = make_pipeline_train_step(
        model, tx, mesh, num_microbatches=args.microbatches,
        loss_fn=lambda lg, lb: lm_loss(lg, {"label": lb}),
        donate=False, remat=args.remat)
    b = args.microbatches * 2 * mesh.shape["data"]
    for i, batch in enumerate(batches(b, args.steps, seed=1)):
        state, metrics = step(state, batch)
        if i % max(1, args.steps // 5) == 0:
            print(f"[PP] step {i} loss {float(metrics['loss']):.4f}")

    # unstack back to plain-LM variables (checkpoints/serving interop)
    host = jax.device_get(state)
    variables = {
        "params": unstack_pipeline_variables(host.params["params"], DEPTH),
        "qparams": unstack_pipeline_variables(host.params["qparams"], DEPTH),
        "quant_state": unstack_pipeline_variables(
            host.model_state["quant_state"], DEPTH),
    }
    logits = model.apply(variables, next(batches(2, 1))["input"],
                         training=False)
    print(f"[PP] unstacked plain-LM forward ok: {logits.shape}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--microbatches", type=int, default=4)
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()
    run_ep(args)
    run_pp(args)
    print("done")
