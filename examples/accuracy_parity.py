"""QAT accuracy parity runs at the BASELINE.md bar (top-1 within 0.1% at
8-bit on ResNet/MobileNet-class models; 4-bit reported alongside).

Statistical protocol (VERDICT r2 next-#1 — the round-2 experiment was
underpowered: 2k eval samples, sigma ~0.2%, and a 99.25% float baseline left
quantization damage no room to show):

* task difficulty raised until the float baseline lands ~90-95% top-1
  (36 orientation classes = 5 degrees apart, lower amplitude floor, more noise),
  so precision loss CAN move the metric;
* 20,000 held-out eval samples, all configs of a seed evaluated on the SAME
  fixed set, so the float-vs-QAT delta is a PAIRED statistic: its std error
  is sqrt(n01 + n10 - (n01-n10)^2/n)/n over the disagreement counts
  (McNemar), far tighter than the ~0.2% unpaired sigma;
* >=3 seeds per (model, config); the JSON records per-seed top-1/deltas,
  the paired sigma per seed, and the across-seed mean +/- 95% CI
  (t-distribution, df = n_seeds - 1).

No dataset is fetchable in this environment (zero egress), so the task is a
procedurally generated oriented-grating problem: orientation encodes the
class; frequency, phase, amplitude, background gradient, tint and noise are
per-sample nuisances.  Orientation is the only discriminative feature.

Usage (runs on whatever backend boots; ~30-45 min warm on one v5e):

    python examples/accuracy_parity.py [--steps 1500] [--seeds 3]
        [--out FILE.json]

Writes float / W8A8 / W4A8 top-1 for resnet18_cifar and mobilenetv2_cifar,
including POST-CONVERSION serving accuracy (int8/int4 packed weights +
static activation quant) — the number that actually ships.  Reference seam
being validated: observers.py:403-422 (calculate_qparams) -> convert.
"""

import argparse
import dataclasses
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

# persistent compile cache: repeat runs skip the slow remote compiles
try:
    import os as _os
    jax.config.update("jax_compilation_cache_dir",
                      _os.environ.get("JAXLSQ_COMPILE_CACHE",
                                      "/tmp/jaxlsq_compile_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np
import optax

from jaxlsq.models import default_qconfig
from jaxlsq.models.qconfig import QConfig
from jaxlsq.models.zoo import mobilenetv2_cifar, resnet18_cifar
from jaxlsq.parallel import create_train_state, make_train_step
from jaxlsq.serve import convert

N_CLASSES = 36        # 5 degrees apart — fine-grained enough to hurt
SIZE = 32
EVAL_N = 20_000
EVAL_CHUNK = 2_000    # conv activations for 20k at once would blow HBM


@functools.partial(jax.jit, static_argnums=1)
def make_batch(key, n=128):
    """n oriented-grating images (n, 32, 32, 3) + labels (n,) — generated ON
    DEVICE (host->device transfers over the remote-TPU tunnel cost more than
    the train step; the task is procedural, so generate it where it is
    consumed)."""
    ks = jax.random.split(key, 8)
    labels = jax.random.randint(ks[0], (n,), 0, N_CLASSES)
    theta = (labels * (np.pi / N_CLASSES)
             + 0.02 * jax.random.normal(ks[1], (n,)))
    freq = jax.random.uniform(ks[2], (n,), minval=2.0, maxval=6.0)
    phase = jax.random.uniform(ks[3], (n,), minval=0.0, maxval=2 * np.pi)
    # lower amplitude floor than round 2 (0.15 vs 0.25): weak gratings under
    # the same noise power are where orientation read-out gets hard
    amp = jax.random.uniform(ks[4], (n,), minval=0.15, maxval=1.0)
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
           + 1.15 * jax.random.normal(ks[7], (n, SIZE, SIZE, 3)))
    return img.astype(jnp.float32), labels.astype(jnp.int32)


def qconfigs():
    pc = dict(per_channel_weights=True, init_batches=20)
    return {
        "float": QConfig(),
        "w8a8": default_qconfig(8, 8, **pc),
        "w4a8": default_qconfig(4, 8, **pc),
    }


def eval_preds(apply_fn, test_keys, batch_fn):
    """Predictions over the fixed eval set, chunked; returns (preds, labels)
    as numpy."""
    preds, labels = [], []
    for k in test_keys:
        x, y = batch_fn(k, EVAL_CHUNK)
        preds.append(np.asarray(jnp.argmax(apply_fn(x), -1)))
        labels.append(np.asarray(y))
    return np.concatenate(preds), np.concatenate(labels)


def paired_delta(pred_a, pred_b, labels):
    """top1(a) - top1(b) with its PAIRED std error (same eval samples):
    sigma = sqrt(n01 + n10 - (n01-n10)^2/n) / n over disagreement counts."""
    a = pred_a == labels
    b = pred_b == labels
    n = labels.size
    n01 = int(np.sum(a & ~b))   # a right, b wrong
    n10 = int(np.sum(~a & b))
    delta = (n01 - n10) / n
    sigma = float(np.sqrt(max(n01 + n10 - (n01 - n10) ** 2 / n, 0))) / n
    return delta, sigma


def run_seed(model_fn, name, steps, batch_size, seed, results):
    """Train float/w8a8/w4a8 with one data seed; eval all on the same fixed
    20k set; return {cfg: preds} + labels for pairing."""
    test_keys = [jax.random.key(1_000_000 + 1000 * seed + i)
                 for i in range(EVAL_N // EVAL_CHUNK)]
    out_preds = {}
    labels_ref = None

    for cfg_name, qc in qconfigs().items():
        key = jax.random.key(seed)  # same data sequence for every config
        model = model_fn(qc)
        tx = optax.adamw(optax.cosine_decay_schedule(3e-3, steps))
        x0, _ = make_batch(jax.random.key(seed + 999), batch_size)
        state = create_train_state(model, tx, x0)
        raw_step = make_train_step(model, tx, jit=False)

        # whole chunks of training fused into one device program (lax.scan):
        # per-step dispatch over the remote-TPU tunnel costs more than the
        # step itself (~0.6 s vs ~10 ms measured)
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
        preds, labels = eval_preds(lambda x: eval_fn(variables, x),
                                   test_keys, make_batch)
        labels_ref = labels
        acc = float((preds == labels).mean())
        out_preds[cfg_name] = preds
        row = {"train_loss": round(loss, 4), "top1": round(acc, 5),
               "train_s": round(dt, 1), "steps_ran": steps_ran}

        if qc.weight is not None:  # converted serving accuracy
            sv = convert(variables, qc)
            sqc = qc.for_serving("static", "xla")
            smodel = model_fn(sqc)
            sfn = jax.jit(lambda v, x: smodel.apply(v, x, training=False))
            spreds, _ = eval_preds(lambda x: sfn(sv, x), test_keys,
                                   make_batch)
            out_preds[cfg_name + "_served"] = spreds
            row["top1_served"] = round(float((spreds == labels).mean()), 5)
            from jaxlsq.serve.convert import serving_bits
            row["served_weight_bits"] = serving_bits(qc.weight.spec)
        results[f"{name}/seed{seed}/{cfg_name}"] = row
        print(name, f"seed{seed}", cfg_name, row, flush=True)

    return out_preds, labels_ref


def summarize(results, name, seeds, cfgs=("w8a8", "w4a8")):
    """Across-seed mean +/- 95% CI for each config's paired delta vs float."""
    # two-sided t critical values for df = n-1
    T95 = {1: 12.706, 2: 4.303, 3: 3.182, 4: 2.776, 5: 2.571}
    for cfg in cfgs:
        for suffix in ("", "_served"):
            key = cfg + suffix
            deltas = [results[f"{name}/seed{s}/paired"][key]["delta"]
                      for s in seeds
                      if key in results[f"{name}/seed{s}/paired"]]
            if not deltas:
                continue
            m = float(np.mean(deltas))
            if len(deltas) > 1:
                sd = float(np.std(deltas, ddof=1))
                half = T95.get(len(deltas) - 1, 2.0) * sd / np.sqrt(
                    len(deltas))
            else:
                sd, half = 0.0, float("nan")
            results[f"{name}/summary/{key}"] = {
                "mean_delta_vs_float": round(m, 5),
                "ci95_half_width": round(half, 5),
                "per_seed_deltas": [round(d, 5) for d in deltas],
                # the BASELINE bar protects against DEGRADATION: the CI's
                # lower edge must not cross -0.1%.  (A QAT model beating
                # float — common on noisy tasks, quantization regularizes —
                # trivially satisfies it.)
                "no_degradation_beyond_0.1pct": bool(m - half >= -0.001),
                "within_0.1pct_band": bool(abs(m) + half <= 0.001),
            }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--seed-start", type=int, default=1,
                    help="first seed (extend an earlier batch without "
                         "re-running it; merge the JSONs offline)")
    ap.add_argument("--models", default="resnet18,mobilenetv2")
    ap.add_argument("--out", default="docs/measurements/accuracy_qat_tpu.json")
    args = ap.parse_args()

    results = {
        "task": (f"procedural {N_CLASSES}-orientation grating classification "
                 "(5 deg apart), 32x32x3; amplitude floor 0.15, noise 1.15 — "
                 "difficulty tuned so the float baseline lands ~90-95% and "
                 "quantization damage can show"),
        "train": f"{args.steps} steps x B{args.batch}, adamw cosine 3e-3",
        "eval": (f"{EVAL_N} held-out samples, SAME fixed set for every "
                 "config of a seed (paired deltas, McNemar sigma); "
                 f"{args.seeds} seeds per model"),
        "backend": jax.default_backend(),
        "bar": ("BASELINE.md: QAT top-1 within 0.1% of float at 8-bit; "
                "checked as mean paired delta +/- 95% CI across seeds"),
    }
    model_fns = {"resnet18": lambda qc: resnet18_cifar(N_CLASSES, qc),
                 "mobilenetv2": lambda qc: mobilenetv2_cifar(N_CLASSES, qc)}
    for name in args.models.split(","):
        seeds = list(range(args.seed_start, args.seed_start + args.seeds))
        for seed in seeds:
            preds, labels = run_seed(model_fns[name], name, args.steps,
                                     args.batch, seed, results)
            paired = {}
            for cfg in ("w8a8", "w4a8"):
                for suffix in ("", "_served"):
                    key = cfg + suffix
                    if key in preds:
                        d, sg = paired_delta(preds[key], preds["float"],
                                             labels)
                        paired[key] = {"delta": round(d, 5),
                                       "paired_sigma": round(sg, 6)}
            results[f"{name}/seed{seed}/paired"] = paired
            print(name, f"seed{seed} paired:", paired, flush=True)
        summarize(results, name, seeds)
        with open(args.out, "w") as f:  # checkpoint after each model
            json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
