"""End-to-end QAT example: ResNet-18-class model, LSQ+ quantizers everywhere,
data-parallel over all local devices, checkpointed, then converted to the
INT8 serving path.

Runs on synthetic CIFAR-shaped data (no dataset download in this
environment); swap ``synthetic_batches`` for a real input pipeline.

  python examples/train_qat.py --steps 50 --bits 8
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

from jaxlsq.models import default_qconfig, resnet18_cifar
from jaxlsq.parallel import (create_train_state, make_mesh, make_train_step,
                             shard_batch)
from jaxlsq.serve import convert
from jaxlsq.utils import StepTimer, quantizer_report, format_report, \
    restore_or_init, save_checkpoint


def synthetic_batches(batch, steps, seed=0):
    r = np.random.RandomState(seed)
    for _ in range(steps):
        yield {"input": jnp.asarray(r.randn(batch, 32, 32, 3).astype(np.float32)),
               "label": jnp.asarray(r.randint(0, 10, size=batch))}


def native_loader_batches(batch, steps, seed=0, shard_dir="/tmp/jaxlsq_shards"):
    """Same synthetic data, but staged as .npy shards on disk and streamed
    through the native C++ prefetching loader (jaxlsq.native.NativeShardLoader)
    — the production-shaped input path."""
    import os

    from jaxlsq.native import NativeShardLoader

    os.makedirs(shard_dir, exist_ok=True)
    r = np.random.RandomState(seed)
    pairs = []
    for i in range(4):
        xp = os.path.join(shard_dir, f"x{i}.npy")
        yp = os.path.join(shard_dir, f"y{i}.npy")
        if not (os.path.exists(xp) and os.path.exists(yp)):
            np.save(xp, r.randn(512, 32, 32, 3).astype(np.float32))
            np.save(yp, r.randint(0, 10, size=512).astype(np.int32))
        pairs.append((xp, yp))
    with NativeShardLoader(pairs, batch=batch, seed=seed, workers=4) as ld:
        for _ in range(steps):
            x, y = ld.next()
            yield {"input": jnp.asarray(x), "label": jnp.asarray(y)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--bits", type=int, default=8, choices=(4, 8))
    ap.add_argument("--init-batches", type=int, default=10)
    ap.add_argument("--ckpt", default="/tmp/jaxlsq_ckpt")
    ap.add_argument("--native-loader", action="store_true",
                    help="stream batches through the C++ shard loader")
    args = ap.parse_args()

    n_dev = jax.device_count()
    mesh = make_mesh(data=n_dev, model=1) if n_dev > 1 else None
    print(f"devices: {n_dev}  mesh: {mesh}")

    qc = default_qconfig(args.bits, 8, per_channel_weights=True,
                         init_batches=args.init_batches)
    model = resnet18_cifar(10, qc)
    tx = optax.sgd(0.05, momentum=0.9)

    sample = jnp.zeros((args.batch, 32, 32, 3), jnp.float32)
    state, resumed = restore_or_init(
        args.ckpt, lambda: create_train_state(model, tx, sample))
    if resumed >= 0:
        print(f"resumed from step {resumed}")

    step = make_train_step(model, tx, mesh=mesh)
    timer = StepTimer(warmup=2)
    batches = (native_loader_batches(args.batch, args.steps)
               if args.native_loader else
               synthetic_batches(args.batch, args.steps))
    for batch in batches:
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        state, metrics = step(state, batch)
        sps = timer.tick(metrics["loss"])
        if int(state.step) % 10 == 0:
            rate = f"  {sps:.2f} steps/s" if sps else ""
            print(f"step {int(state.step):5d}  loss {float(metrics['loss']):.4f}{rate}")

    save_checkpoint(args.ckpt, state, int(state.step))
    print(format_report(quantizer_report(
        {**state.params, **state.model_state}), max_rows=8))

    # Which layers pay the most for quantization?  (mixed-precision picker)
    from jaxlsq.utils import format_sensitivity, sensitivity_report

    sens_batch = next(iter(synthetic_batches(args.batch, 1)))
    rep = sensitivity_report(model, {**state.params, **state.model_state},
                             sens_batch)
    print(format_sensitivity(rep))

    serve_vars = convert({**state.params, **state.model_state}, qc)
    serve_model = dataclasses.replace(model, qconfig=qc.for_serving("static"))
    x = jnp.zeros((8, 32, 32, 3), jnp.float32)
    logits = serve_model.apply(serve_vars, x, training=False)
    print("serving logits:", np.asarray(logits[0, :4]))


if __name__ == "__main__":
    main()
