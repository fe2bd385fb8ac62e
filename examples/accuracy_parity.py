"""QAT accuracy parity runs at the BASELINE.md bar (top-1 within 0.1% at
8-bit on ResNet/MobileNet-class models; 4-bit reported alongside).

No dataset is fetchable in this environment (zero egress), so the task is a
procedurally generated 24-class oriented-grating problem: each image is a
sinusoidal grating whose ORIENTATION encodes the class (24 orientations over
[0, pi), 7.5 degrees apart), with per-sample random frequency, phase, amplitude, spatial jitter,
a random background gradient, and additive noise.  Orientation is the only
discriminative feature, so the task is fine-grained enough that precision
loss can actually cost accuracy (unlike blob-classification toys).

Usage (runs on whatever backend boots; ~5-10 min warm on one v5e):

    python examples/accuracy_parity.py [--steps 1500] [--out FILE.json]

Writes float / W8A8 / W4A8 top-1 for resnet18_cifar and mobilenetv2_cifar,
including POST-CONVERSION serving accuracy (int8/int4 packed weights +
static activation quant) — the number that actually ships.
"""

import argparse
import dataclasses
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from jaxlsq.models import default_qconfig
from jaxlsq.models.qconfig import QConfig
from jaxlsq.models.zoo import mobilenetv2_cifar, resnet18_cifar
from jaxlsq.parallel import create_train_state, make_train_step
from jaxlsq.serve import convert

N_CLASSES = 24
SIZE = 32


@functools.partial(jax.jit, static_argnums=1)
def make_batch(key, n=128):
    """n oriented-grating images (n, 32, 32, 3) + labels (n,) — generated ON
    DEVICE (host→device image transfers over the remote-TPU tunnel cost more
    than the train step itself; the task is procedural, so generate it where
    it is consumed)."""
    ks = jax.random.split(key, 8)
    labels = jax.random.randint(ks[0], (n,), 0, N_CLASSES)
    theta = (labels * (np.pi / N_CLASSES)
             + 0.02 * jax.random.normal(ks[1], (n,)))
    freq = jax.random.uniform(ks[2], (n,), minval=2.0, maxval=6.0)
    phase = jax.random.uniform(ks[3], (n,), minval=0.0, maxval=2 * np.pi)
    amp = jax.random.uniform(ks[4], (n,), minval=0.25, maxval=1.0)
    xx = jnp.arange(SIZE)[None, :] / SIZE          # (1, S)
    yy = jnp.arange(SIZE)[:, None] / SIZE          # (S, 1)
    u = (jnp.cos(theta)[:, None, None] * xx[None]
         + jnp.sin(theta)[:, None, None] * yy[None])
    g = amp[:, None, None] * jnp.sin(
        2 * np.pi * freq[:, None, None] * u + phase[:, None, None])
    gxy = 0.5 * jax.random.normal(ks[5], (n, 2, 1, 1))
    bg = gxy[:, 0] * xx[None] + gxy[:, 1] * yy[None]
    tint = jax.random.uniform(ks[6], (n, 1, 1, 3), minval=0.7, maxval=1.3)
    img = ((g + bg)[..., None] * tint
           + 1.0 * jax.random.normal(ks[7], (n, SIZE, SIZE, 3)))
    return img.astype(jnp.float32), labels.astype(jnp.int32)


def qconfigs():
    pc = dict(per_channel_weights=True, init_batches=20)
    return {
        "float": QConfig(),
        "w8a8": default_qconfig(8, 8, **pc),
        "w4a8": default_qconfig(4, 8, **pc),
    }


def run_one(model_fn, name, steps, batch_size, seed, results):
    test_x, test_y = make_batch(jax.random.key(10_000 + seed), 2000)

    for cfg_name, qc in qconfigs().items():
        key = jax.random.key(seed)  # same data sequence for every config
        model = model_fn(qc)
        tx = optax.adamw(optax.cosine_decay_schedule(3e-3, steps))
        x0, _ = make_batch(jax.random.key(seed + 999), batch_size)
        state = create_train_state(model, tx, x0)
        raw_step = make_train_step(model, tx, jit=False)

        # Whole chunks of training fused into one device program (lax.scan):
        # per-step dispatch over the remote-TPU tunnel costs more than the
        # step itself (~0.6 s vs ~10 ms measured), so 1500 host dispatches
        # become 6.
        CHUNK = min(250, steps)

        @functools.partial(jax.jit, donate_argnums=0)
        def run_chunk(carry):
            def body(c, _):
                state, key = c
                key, sub = jax.random.split(key)
                bx, by = make_batch(sub, batch_size)
                state, metrics = raw_step(state, {"input": bx, "label": by})
                return (state, key), metrics["loss"]
            (state, key), losses = jax.lax.scan(body, carry, None,
                                                length=CHUNK)
            return (state, key), losses[-1]

        t0 = time.time()
        carry = (state, key)
        n_chunks = max(1, steps // CHUNK)
        for _ in range(n_chunks):
            carry, last_loss = run_chunk(carry)
        steps_ran = n_chunks * CHUNK  # recorded honestly (chunk granularity)
        state = carry[0]
        loss = float(last_loss)
        dt = time.time() - t0

        variables = {**state.params, **state.model_state}
        eval_fn = jax.jit(lambda v, x: model.apply(
            v, x, training=False,
            mutable=["quant_state", "qparams", "batch_stats"])[0])
        pred = jnp.argmax(eval_fn(variables, test_x), -1)
        acc = float((pred == test_y).mean())
        row = {"train_loss": round(loss, 4), "top1": round(acc, 4),
               "train_s": round(dt, 1), "steps_ran": steps_ran}

        if qc.weight is not None:  # converted serving accuracy
            sv = convert(variables, qc)
            sqc = qc.for_serving("static", "xla")
            smodel = model_fn(sqc)
            spred = jnp.argmax(
                jax.jit(lambda v, x: smodel.apply(v, x, training=False))(
                    sv, test_x), -1)
            row["top1_served"] = round(float((spred == test_y).mean()), 4)
            from jaxlsq.serve.convert import serving_bits
            row["served_weight_bits"] = serving_bits(qc.weight.spec)
        results[f"{name}/{cfg_name}"] = row
        print(name, cfg_name, row, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--out", default="docs/measurements/accuracy_qat_tpu.json")
    args = ap.parse_args()

    results = {
        "task": ("procedural 24-orientation grating classification, 32x32x3; "
                 "orientation is the only discriminative feature (random "
                 "freq/phase/amp/background/noise)"),
        "train": f"{args.steps} steps x B{args.batch}, adamw cosine 3e-3",
        "eval": "2000 held-out samples (fixed seed)",
        "backend": jax.default_backend(),
        "note": ("proxy task (no dataset egress from this environment); the "
                 "0.1% BASELINE bar is checked as float-vs-QAT top-1 delta "
                 "on this task, see deltas"),
    }
    run_one(lambda qc: resnet18_cifar(N_CLASSES, qc), "resnet18",
            args.steps, args.batch, seed=1, results=results)
    run_one(lambda qc: mobilenetv2_cifar(N_CLASSES, qc), "mobilenetv2",
            args.steps, args.batch, seed=2, results=results)

    for m in ("resnet18", "mobilenetv2"):
        base = results[f"{m}/float"]["top1"]
        for c in ("w8a8", "w4a8"):
            results[f"{m}/{c}"]["delta_vs_float"] = round(
                results[f"{m}/{c}"]["top1"] - base, 4)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
