"""QAT recipe sweep on the BASELINE accuracy misses (VERDICT r3 next-#1).

Round 3 recorded an honest miss: mobilenetv2 w8a8 mean paired delta -1.6%
(resnet18 -0.089% with CI edge -0.153%) — but the harness swept exactly ONE
recipe (observer-init + MovingAverage minmax).  This script points the
framework's own arsenal at the miss, one knob at a time:

  base       the r3 recipe (observer minmax, 20-batch window)  [control]
  noact      weights quantized, activations float               [attribution]
  noweight   activations quantized, weights float               [attribution]
  learnable  LSQ+ backprop init (init_mode='learnable'), 100-batch window —
             the reference's headline feature (functional.py:60-64,
             observers.py:441-443), built for exactly this class of gap
  mse        act_observer='mse' (MSE-minimizing range search)
  histogram  act_observer='histogram' (torch.ao default static observer)
  window100  observer window 20 -> 100 batches
  full8      reduce_range=False: full 8-bit activation range (the 7-bit
             narrowing is a torch-backend overflow guard — README.md:141 —
             that costs a bit of precision TPU serving does not need)
  dwfloat    mixed precision: depthwise conv ACTIVATIONS stay float
             (with_overrides on the 'depthwise' path; weights stay int8)
  combo      the winners combined (filled in after a first pass)

Every recipe is evaluated twice: with the QAT-final batch_stats and with
BN re-estimation (utils.reestimate_batch_stats, 400 batches) — MobileNet's
depthwise+BN stacks are the textbook case for stale-EMA damage.

Protocol matches examples/accuracy_parity.py (paired deltas on a fixed 20k
eval set, McNemar sigma, across-seed CI); the float baseline is trained
ONCE per seed and shared by all recipes.

    python examples/recipe_sweep.py --model mobilenetv2 --seeds 3
        [--steps 1500] [--recipes base,learnable,...]
        [--bits w8a8|w4a8|w4a4]   # w4a8/w4a4 select the 4-bit campaign
        [--out docs/measurements/recipe_sweep_mnv2_tpu.json]

Round-5 extension (VERDICT r4 next-#1): ``--bits w4a8`` sweeps the 4-bit
weight campaign (committed miss: mnv2 w4a8 −2.5% at init_batches=20 +
reduce_range=True = a 3-BIT weight range), incl. plan_mixed_precision
(4, 8) mixes; ``--bits w4a4`` decides the LSQ+ learnable-init keep-claim
at the bitwidth the paper targets.
"""

import argparse
import dataclasses
import functools
import hashlib
import json
import sys
import time
import zipfile

sys.path.insert(0, "/root/repo")

import jax

if "--cpu" in sys.argv:  # debug runs; the axon sitecustomize ignores env vars
    jax.config.update("jax_platforms", "cpu")

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

sys.path.insert(0, "/root/repo/examples")
from accuracy_parity import (EVAL_CHUNK, EVAL_N, N_CLASSES, eval_preds,
                             make_batch, paired_delta)

from jaxlsq.models import default_qconfig
from jaxlsq.models.qconfig import QConfig
from jaxlsq.models.zoo import mobilenetv2_cifar, resnet18_cifar
from jaxlsq.parallel import (create_train_state, make_train_step,
                             qat_optimizer)
from jaxlsq.utils import reestimate_batch_stats

PC = dict(per_channel_weights=True)


def _code_tag():
    """Version token for the float-baseline cache (ADVICE r4): the cached
    predictions are only valid while the model/data/train-loop code that
    produced them is unchanged, so fold a hash of those sources into the
    cache filename."""
    h = hashlib.sha256()
    for p in ("/root/repo/examples/accuracy_parity.py",
              "/root/repo/jaxlsq/models/zoo.py",
              "/root/repo/jaxlsq/parallel/train.py"):
        with open(p, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:8]


def default_tx(steps):
    return optax.adamw(optax.cosine_decay_schedule(3e-3, steps))


def sgdq_tx(steps):
    """LSQ-paper optimizer class for the quantizer params: SGD momentum 0.9
    on the same cosine schedule, no weight decay — restores the
    1/sqrt(numel*qmax) grad scale's role (parallel/optim.py docstring).
    qat_optimizer defaults add grad-clip(1.0) + scale eps-projection, the
    learnable-init stabilizers."""
    return qat_optimizer(
        default_tx(steps),
        optax.sgd(optax.cosine_decay_schedule(3e-3, steps), momentum=0.9))


def adamq_tx(steps):
    """Adam on the qparams but guarded: grad-clip + scale projection (the
    unguarded adamw run drove 428/2939 activation scales negative during the
    backprop-init window — docs/measurements/learnable_diag_tpu.json)."""
    return qat_optimizer(
        default_tx(steps),
        optax.adam(optax.cosine_decay_schedule(3e-3, steps)))


def recipes():
    base = default_qconfig(8, 8, init_batches=20, **PC)
    out = {
        "base": base,
        "noact": dataclasses.replace(base, activation=None),
        "noweight": dataclasses.replace(base, weight=None),
        "learnable": default_qconfig(8, 8, init_batches=100,
                                     init_mode="learnable", **PC),
        "mse": default_qconfig(8, 8, init_batches=20, act_observer="mse",
                               **PC),
        "histogram": default_qconfig(8, 8, init_batches=20,
                                     act_observer="histogram", **PC),
        "window100": default_qconfig(8, 8, init_batches=100, **PC),
        "full8": default_qconfig(8, 8, init_batches=20, reduce_range=False,
                                 **PC),
        "dwfloat": base.with_overrides(
            {"depthwise": dataclasses.replace(base, activation=None)}),
    }
    # Round-2 combos (seed-1 first pass: window100 -0.43% and full8 -0.46%
    # vs base -1.60% — both are activation-RANGE levers; compose them)
    combo = default_qconfig(8, 8, init_batches=100, reduce_range=False, **PC)
    out["combo"] = combo
    out["combo_dw"] = combo.with_overrides(
        {"depthwise": dataclasses.replace(combo, activation=None)})
    out["window400"] = default_qconfig(8, 8, init_batches=400, **PC)
    out["combo400"] = default_qconfig(8, 8, init_batches=400,
                                      reduce_range=False, **PC)
    # Optimizer-partition recipes (VERDICT r4): adamw normalizes every
    # qparam update to ~lr (10%+ of a typical activation scale per step)
    # and decays scale/shift toward zero; sgdq_tx restores LSQ semantics.
    out["sgdq"] = (base, sgdq_tx)
    out["learnable_sgdq"] = (default_qconfig(8, 8, init_batches=100,
                                             init_mode="learnable", **PC),
                             sgdq_tx)
    out["combo_sgdq"] = (combo, sgdq_tx)
    out["combo400_sgdq"] = (out["combo400"], sgdq_tx)
    # Window-length extrapolation (20 -> -1.6%, 100 -> -0.79%, 400 -> -0.41%):
    # the observer-driven phase is what converges; push it to 80% of the
    # budget, and all the way (static-estimate for the WHOLE run — the
    # torch.ao default QAT recipe: observer tracks, fake-quant follows, STE
    # only; no LSQ learning phase at all).
    from jaxlsq.models.calibrate import set_static_estimate
    out["window1200"] = default_qconfig(8, 8, init_batches=1200, **PC)
    out["combo1200"] = default_qconfig(8, 8, init_batches=1200,
                                       reduce_range=False, **PC)
    out["static"] = (base, default_tx, set_static_estimate)
    out["static_full8"] = (default_qconfig(8, 8, init_batches=20,
                                           reduce_range=False, **PC),
                           default_tx, set_static_estimate)
    # LSQ+ learnable init, STABILIZED (parallel/optim.py: qparam grad clip +
    # scale eps-projection): the raw runs failed two ways — adamw drove
    # scales negative (-6.1%), plain SGD diverged on border-term spikes
    # (NaN).  These recipes are the same inits with the guards on.
    learn = default_qconfig(8, 8, init_batches=100, init_mode="learnable",
                            **PC)
    out["learnable_clip"] = (learn, sgdq_tx)
    out["learnable_adamq"] = (learn, adamq_tx)
    out["combo_learnable"] = (default_qconfig(
        8, 8, init_batches=100, init_mode="learnable",
        reduce_range=False, **PC), adamq_tx)
    # Knowledge distillation from the per-seed float model (already trained
    # as the parity baseline): combo1200 (current best, -0.34%) + KL term.
    # Marked by name — the sweep loop builds the loss from the seed's float
    # teacher (parallel/train.py::distillation_loss).
    out["distill"] = out["combo1200"]
    out["distill_static"] = out["static"]
    out["distill_percentile"] = (default_qconfig(
        8, 8, init_batches=1200, act_observer="percentile", **PC),)
    out["percentile1200"] = default_qconfig(
        8, 8, init_batches=1200, act_observer="percentile", **PC)
    # True LSQ+ ordering: statistics init FIRST (20 calibration batches),
    # THEN the backprop-init window refines from there (marked by name —
    # the sweep loop passes warm_batches=20 to train_one).
    # NOTE (r5): learnable-mode quantizers carry NO observer (reference
    # parity — learnable mode never consults one), which made calibrate()
    # a silent no-op in the r4 warm rows; _with_observer attaches one so
    # the warm start actually warms.
    out["learnable_warm"] = (_with_observer(learn), sgdq_tx)
    out["combo_learnable_warm"] = (_with_observer(default_qconfig(
        8, 8, init_batches=100, init_mode="learnable",
        reduce_range=False, **PC)), sgdq_tx)
    return out


def _with_observer(qc):
    """Attach a MovingAverageMinMax observer to the ACTIVATION quantizer of a
    learnable-mode qconfig so ``calibrate`` (the warm start) has something to
    drive — learnable mode builds none by default (quantizer.py:136-139)."""
    from jaxlsq.observers import MovingAverageMinMaxObserver
    return dataclasses.replace(
        qc, activation=dataclasses.replace(
            qc.activation, observer=MovingAverageMinMaxObserver()))


def recipes_w4a8():
    """The 4-bit weight campaign (VERDICT r4 next-#1).  The committed miss
    (mobilenetv2 w4a8 −2.5%, accuracy_qat_tpu.json) was measured with
    init_batches=20 AND reduce_range=True — at 4 bits the one-bit narrowing
    leaves a 3-BIT weight range ([−4, 3] in the int4 carrier), so the two
    w8a8 winning levers are transferred and attributed separately here."""
    out = {
        # control: the committed-miss configuration, reproduced in-harness
        "base4": default_qconfig(4, 8, init_batches=20, **PC),
        # lever A alone: full 4-bit weight (and 8-bit act) range
        "full8_4": default_qconfig(4, 8, init_batches=20,
                                   reduce_range=False, **PC),
        # lever B alone: long observer window
        "window1200_4": default_qconfig(4, 8, init_batches=1200, **PC),
        # both (the w8a8 shipped recipe at w4)
        "combo1200_4": default_qconfig(4, 8, init_batches=1200,
                                       reduce_range=False, **PC),
        # + knowledge distillation from the per-seed float teacher
        "distill4": default_qconfig(4, 8, init_batches=1200,
                                    reduce_range=False, **PC),
        # LSQ+ backprop init at 4-bit WEIGHTS (acts 8-bit) — guarded Adam
        "learnable4": (default_qconfig(4, 8, init_batches=100,
                                       init_mode="learnable", **PC),
                       adamq_tx),
    }
    # planned mixed precision (plan_mixed_precision, bit_options=(4, 8)):
    # scout = combo1200_4, then retrain with the planned per-layer mix.
    # Budgets: 4.8 avg bits (~25% of numel promoted) and 5.6 (~40%).
    out["mp4_48"] = default_qconfig(4, 8, init_batches=1200,
                                    reduce_range=False, **PC)
    out["mp4_56"] = out["mp4_48"]
    return out


MP_TARGETS = {"mp4_48": 4.8, "mp4_56": 5.6}
MP_SCOUT = "combo1200_4"


def recipes_w4a4():
    """w4a4: the regime the LSQ+ learnable init exists for (reference
    functional.py:60-64 / observers.py:441-443; LSQ+ paper targets W4A4).
    qat_recipes.md's 'matters at ≤4 bits' keep-claim is decided HERE —
    learnable (100-batch backprop-init window) vs the same-window observer
    (window100_44) and the long-window combo, at 4-bit activations."""
    learn = default_qconfig(4, 4, init_batches=100, init_mode="learnable",
                            **PC)
    return {
        "base44": default_qconfig(4, 4, init_batches=20, **PC),
        "full44": default_qconfig(4, 4, init_batches=20,
                                  reduce_range=False, **PC),
        "window100_44": default_qconfig(4, 4, init_batches=100, **PC),
        "combo1200_44": default_qconfig(4, 4, init_batches=1200,
                                        reduce_range=False, **PC),
        "distill44": default_qconfig(4, 4, init_batches=1200,
                                     reduce_range=False, **PC),
        "learnable44": (learn, adamq_tx),
        "learnable44_sgdq": (learn, sgdq_tx),
        # warm start needs an attached observer (see _with_observer)
        "learnable44_warm": (_with_observer(learn), sgdq_tx),
        # learnable with the reduce_range=False lever too (best-case LSQ+)
        "combo_learnable44": (default_qconfig(
            4, 4, init_batches=100, init_mode="learnable",
            reduce_range=False, **PC), adamq_tx),
    }


def train_one(model, steps, batch_size, seed, tx_factory=default_tx,
              state_fn=None, loss_fn=None, warm_batches=0):
    key = jax.random.key(seed)
    tx = tx_factory(steps)
    x0, _ = make_batch(jax.random.key(seed + 999), batch_size)
    state = create_train_state(model, tx, x0)
    if state_fn is not None:  # e.g. set_static_estimate on quant_state
        state = state.replace(model_state=state_fn(dict(state.model_state)))
    if warm_batches:
        # statistics-first LSQ+: observer-calibrate the activation ranges on
        # a few batches, then hand back to the learnable window (backprop
        # refinement starts FROM the data-driven init instead of scale=1.0)
        from jaxlsq.models.calibrate import calibrate
        from jaxlsq.models.toggles import map_quant_state
        variables = {**state.params, **state.model_state}
        wkeys = jax.random.split(jax.random.key(555_000 + seed), warm_batches)
        variables = calibrate(
            model, variables, [make_batch(k, batch_size)[0] for k in wkeys])
        variables = map_quant_state(
            variables, lambda qs: {
                **qs, "learning_enabled": jnp.asarray(True),
                "observer_enabled": jnp.asarray(False)})
        state = state.replace(
            params={"params": variables["params"],
                    "qparams": variables.get("qparams", {})},
            model_state={k: v for k, v in variables.items()
                         if k not in ("params", "qparams")})
    kw = {} if loss_fn is None else {"loss_fn": loss_fn}
    raw_step = make_train_step(model, tx, jit=False, **kw)
    CHUNK = min(250, steps)

    @functools.partial(jax.jit, donate_argnums=0)
    def run_chunk(carry):
        def body(c, _):
            state, key = c
            key, sub = jax.random.split(key)
            bx, by = make_batch(sub, batch_size)
            state, metrics = raw_step(state, {"input": bx, "label": by})
            return (state, key), metrics["loss"]
        (state, key), losses = jax.lax.scan(body, carry, None, length=CHUNK)
        return (state, key), losses[-1]

    carry = (state, key)
    for _ in range(max(1, steps // CHUNK)):
        carry, last_loss = run_chunk(carry)
    return carry[0], float(last_loss)


def eval_top1(model, variables, test_keys):
    eval_fn = jax.jit(lambda v, x: model.apply(
        v, x, training=False,
        mutable=["quant_state", "qparams", "batch_stats"])[0])
    preds, labels = eval_preds(lambda x: eval_fn(variables, x),
                               test_keys, make_batch)
    return preds, labels


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--seed-start", type=int, default=1)
    ap.add_argument("--model", default="mobilenetv2")
    ap.add_argument("--recipes", default="all")
    ap.add_argument("--bn-batches", type=int, default=400)
    ap.add_argument("--bits", default="w8a8",
                    choices=["w8a8", "w4a8", "w4a4"])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.out is None:
        short = {"mobilenetv2": "mnv2", "resnet18": "rn18"}[args.model]
        suffix = "" if args.bits == "w8a8" else f"_{args.bits}"
        args.out = (f"docs/measurements/recipe_sweep_{short}{suffix}"
                    "_tpu.json")

    model_fns = {"resnet18": lambda qc: resnet18_cifar(N_CLASSES, qc),
                 "mobilenetv2": lambda qc: mobilenetv2_cifar(N_CLASSES, qc)}
    model_fn = model_fns[args.model]
    all_recipes = {"w8a8": recipes, "w4a8": recipes_w4a8,
                   "w4a4": recipes_w4a4}[args.bits]()
    names = (list(all_recipes) if args.recipes == "all"
             else args.recipes.split(","))

    # Merge into an existing table (the sweep runs in passes; training is
    # deterministic per seed, so the shared float baseline reproduces).
    results = {}
    try:
        with open(args.out) as f:
            results = json.load(f)
    except (OSError, json.JSONDecodeError):
        pass
    results.update({
        "what": (f"{args.bits} recipe sweep on the BASELINE accuracy bar; "
                 "paired deltas vs a per-seed shared float baseline on a "
                 "fixed 20k eval set; each recipe also evaluated after BN "
                 f"re-estimation ({args.bn_batches} batches)"),
        "model": args.model,
        "train": f"{args.steps} steps x B{args.batch}, adamw cosine 3e-3",
        "backend": jax.default_backend(),
    })
    seeds = list(range(args.seed_start, args.seed_start + args.seeds))
    deltas = {n: {"raw": [], "bnr": []} for n in names}
    mp_scouts = {}  # seed -> (scout_model, trained scout variables)

    for seed in seeds:
        test_keys = [jax.random.key(1_000_000 + 1000 * seed + i)
                     for i in range(EVAL_N // EVAL_CHUNK)]
        t0 = time.time()
        # The float baseline is deterministic per (model, seed, steps, batch);
        # cache its per-example predictions so multi-pass sweeps (scout pass,
        # winner-on-more-seeds pass) do not retrain it.  Distillation recipes
        # still need the teacher variables and force a retrain.
        fcache = (f"/tmp/jaxlsq_float_{args.model}_s{seed}"
                  f"_t{args.steps}_b{args.batch}_{_code_tag()}.npz")
        need_teacher = any(n.startswith("distill") for n in names)
        fvars = None
        try:
            if need_teacher:
                raise OSError  # teacher params not cached; retrain
            z = np.load(fcache)
            fpreds, labels, floss = z["fpreds"], z["labels"], float(z["loss"])
            print(f"seed{seed}: loaded cached float baseline from {fcache}",
                  flush=True)
        except (OSError, ValueError, KeyError, zipfile.BadZipFile):
            fstate, floss = train_one(model_fn(QConfig()), args.steps,
                                      args.batch, seed)
            fvars = {**fstate.params, **fstate.model_state}
            fpreds, labels = eval_top1(model_fn(QConfig()), fvars, test_keys)
            import os
            np.savez(fcache + ".tmp.npz", fpreds=np.asarray(fpreds),
                     labels=np.asarray(labels), loss=floss)
            os.replace(fcache + ".tmp.npz", fcache)  # atomic: no torn cache
        facc = float((fpreds == labels).mean())
        results[f"seed{seed}/float"] = {
            "top1": round(facc, 5), "train_loss": round(floss, 4),
            "s": round(time.time() - t0, 1)}
        print(f"seed{seed} float: top1={facc:.4f} loss={floss:.4f}",
              flush=True)

        # shared calibration batches for BN re-estimation
        bn_keys = jax.random.split(jax.random.key(777_000 + seed),
                                   args.bn_batches)
        bn_inputs = jax.jit(
            lambda ks: jax.vmap(lambda k: make_batch(k, args.batch)[0])(ks)
        )(bn_keys)

        for name in names:
            qc = all_recipes[name]
            tx_factory, state_fn = default_tx, None
            if isinstance(qc, tuple):
                qc, *rest = qc
                tx_factory = rest[0] if len(rest) > 0 else default_tx
                state_fn = rest[1] if len(rest) > 1 else None
            loss_fn = None
            if name.startswith("distill"):
                from jaxlsq.parallel import distillation_loss
                loss_fn = distillation_loss(model_fn(QConfig()), fvars,
                                            alpha=0.5, temperature=2.0)
            warm = 20 if name.endswith("_warm") else 0
            t0 = time.time()
            row_extra = {}
            if args.bits == "w4a8" and name in MP_TARGETS:
                # plan_mixed_precision flow: sensitivity-plan a (4, 8) weight
                # mix on a trained uniform-w4 scout, then train fresh with
                # the planned per-layer overrides.
                from jaxlsq.utils import plan_mixed_precision
                if seed not in mp_scouts:
                    sm_model = model_fn(all_recipes[MP_SCOUT])
                    sstate, _ = train_one(sm_model, args.steps, args.batch,
                                          seed)
                    mp_scouts[seed] = (
                        sm_model, {**sstate.params, **sstate.model_state})
                sm_model, svars = mp_scouts[seed]
                bx, by = make_batch(jax.random.key(424_242 + seed),
                                    args.batch)
                plan = plan_mixed_precision(
                    sm_model, svars, {"input": bx, "label": by},
                    bit_options=(4, 8),
                    target_avg_bits=MP_TARGETS[name])
                qc = plan["qconfig"]
                row_extra = {
                    "avg_bits": round(plan["avg_bits"], 3),
                    "n_int8": sum(1 for b in plan["assignment"].values()
                                  if b == 8),
                    "n_scopes": len(plan["assignment"]),
                }
            model = model_fn(qc)
            state, loss = train_one(model, args.steps, args.batch, seed,
                                    tx_factory, state_fn, loss_fn, warm)
            variables = {**state.params, **state.model_state}
            preds, _ = eval_top1(model, variables, test_keys)
            acc = float((preds == labels).mean())
            d, sg = paired_delta(preds, fpreds, labels)
            row = {"top1": round(acc, 5), "delta": round(d, 5),
                   "sigma": round(sg, 6), "train_loss": round(loss, 4),
                   **row_extra}
            deltas[name]["raw"].append(d)

            v_bnr = reestimate_batch_stats(model, variables, bn_inputs)
            preds_b, _ = eval_top1(model, v_bnr, test_keys)
            acc_b = float((preds_b == labels).mean())
            db, sgb = paired_delta(preds_b, fpreds, labels)
            row.update({"top1_bnreest": round(acc_b, 5),
                        "delta_bnreest": round(db, 5),
                        "sigma_bnreest": round(sgb, 6),
                        "s": round(time.time() - t0, 1)})
            deltas[name]["bnr"].append(db)
            results[f"seed{seed}/{name}"] = row
            print(f"seed{seed} {name}: {row}", flush=True)
            with open(args.out, "w") as f:
                json.dump(results, f, indent=1)

    T95 = {1: 12.706, 2: 4.303, 3: 3.182, 4: 2.776, 5: 2.571,
           9: 2.262, 19: 2.093, 39: 2.023}
    for name in names:
        for kind in ("raw", "bnr"):
            ds = deltas[name][kind]
            if not ds:
                continue
            m = float(np.mean(ds))
            half = (T95.get(len(ds) - 1, 2.0) * float(np.std(ds, ddof=1))
                    / np.sqrt(len(ds))) if len(ds) > 1 else float("nan")
            results[f"summary/{name}/{kind}"] = {
                "mean_delta": round(m, 5),
                "ci95_half": round(half, 5),
                "per_seed": [round(d, 5) for d in ds],
            }
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
