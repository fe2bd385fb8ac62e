"""QAT accuracy parity runs at the BASELINE.md bar (top-1 within 0.1% at
8-bit on ResNet/MobileNet-class models; 4-bit reported alongside).

No dataset is fetchable in this environment (zero egress), so the task is a
procedurally generated 10-class oriented-grating problem: each image is a
sinusoidal grating whose ORIENTATION encodes the class (10 orientations over
[0, pi)), with per-sample random frequency, phase, amplitude, spatial jitter,
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

N_CLASSES = 10
SIZE = 32


def make_batch(rng: np.random.Generator, n: int):
    """n oriented-grating images (n, 32, 32, 3) + labels (n,)."""
    labels = rng.integers(0, N_CLASSES, n)
    theta = labels * (np.pi / N_CLASSES) + rng.normal(0, 0.02, n)
    freq = rng.uniform(2.0, 6.0, n)
    phase = rng.uniform(0, 2 * np.pi, n)
    amp = rng.uniform(0.5, 1.5, n)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE] / SIZE
    u = (np.cos(theta)[:, None, None] * xx[None]
         + np.sin(theta)[:, None, None] * yy[None])
    g = amp[:, None, None] * np.sin(
        2 * np.pi * freq[:, None, None] * u + phase[:, None, None])
    # random background gradient + channel tints + noise
    gx = rng.normal(0, 0.5, (n, 1, 1))
    gy = rng.normal(0, 0.5, (n, 1, 1))
    bg = gx * xx[None] + gy * yy[None]
    img = g + bg
    tint = rng.uniform(0.7, 1.3, (n, 1, 1, 3))
    img = img[..., None] * tint + rng.normal(0, 0.3, (n, SIZE, SIZE, 3))
    return img.astype(np.float32), labels.astype(np.int32)


def qconfigs():
    pc = dict(per_channel_weights=True, init_batches=20)
    return {
        "float": QConfig(),
        "w8a8": default_qconfig(8, 8, **pc),
        "w4a8": default_qconfig(4, 8, **pc),
    }


def run_one(model_fn, name, steps, batch_size, seed, results):
    test_rng = np.random.default_rng(10_000 + seed)
    test_x, test_y = make_batch(test_rng, 2000)
    test_x, test_y = jnp.asarray(test_x), jnp.asarray(test_y)

    for cfg_name, qc in qconfigs().items():
        rng = np.random.default_rng(seed)
        model = model_fn(qc)
        tx = optax.adamw(optax.cosine_decay_schedule(3e-3, steps))
        x0, y0 = make_batch(rng, batch_size)
        state = create_train_state(model, tx, jnp.asarray(x0))
        step = make_train_step(model, tx)
        t0 = time.time()
        for i in range(steps):
            bx, by = make_batch(rng, batch_size)
            state, metrics = step(state, {"input": jnp.asarray(bx),
                                          "label": jnp.asarray(by)})
        loss = float(metrics["loss"])
        dt = time.time() - t0

        variables = {**state.params, **state.model_state}
        eval_fn = jax.jit(lambda v, x: model.apply(
            v, x, training=False,
            mutable=["quant_state", "qparams", "batch_stats"])[0])
        pred = jnp.argmax(eval_fn(variables, test_x), -1)
        acc = float((pred == test_y).mean())
        row = {"train_loss": round(loss, 4), "top1": round(acc, 4),
               "train_s": round(dt, 1)}

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
        "task": ("procedural 10-orientation grating classification, 32x32x3; "
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
