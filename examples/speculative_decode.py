"""Speculative decoding demo: train a target LM and a 30x-smaller draft on
the same corpus, convert both to int8 serving form, and measure speculative
vs plain greedy decode on the chip.

Acceptance rate is a property of how well the draft tracks the target, so
random-weight models would show nothing; this trains both on a small
procedural corpus (token sequences from a seeded Markov chain) until the
draft predicts the target's continuations often enough to matter.

  python examples/speculative_decode.py [--steps 1200]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from jaxlsq.models import QuantTransformerLM, default_qconfig
from jaxlsq.parallel import create_train_state, make_train_step
from jaxlsq.serve import convert, make_generate, make_speculative_generate

VOCAB, T = 512, 64


def corpus_batch(key, batch):
    """Markov-chain token sequences: next ~ (3*cur + small noise) mod VOCAB —
    deterministic enough that both models learn the same continuations."""
    k1, k2 = jax.random.split(key)
    start = jax.random.randint(k1, (batch, 1), 0, VOCAB)
    # mostly-deterministic chain (a branch every ~10 steps): the draft can
    # actually track the target's greedy choices, which is the premise of
    # speculative decoding (acceptance == draft quality, not a property of
    # the method)
    noise = (jax.random.randint(k2, (batch, T), 0, 10) == 0).astype(jnp.int32)

    def step(tok, n):
        nxt = (3 * tok + n) % VOCAB
        return nxt, nxt

    _, seq = jax.lax.scan(
        lambda c, xs: step(c, xs), start[:, 0], noise.T)
    return jnp.concatenate([start, seq.T[:, : T - 1]], axis=1)


def train(model, steps, batch, seed):
    tx = optax.adam(2e-3)
    lossfn = lambda logits, b: optax.softmax_cross_entropy_with_integer_labels(
        logits[:, :-1], b["label"][:, 1:]).mean()
    key = jax.random.key(seed)
    sample = corpus_batch(key, batch)
    state = create_train_state(model, tx, sample)
    raw = make_train_step(model, tx, loss_fn=lossfn, jit=False)

    import functools

    @functools.partial(jax.jit, donate_argnums=0)
    def chunk(carry):
        def body(c, _):
            state, key = c
            key, sub = jax.random.split(key)
            toks = corpus_batch(sub, batch)
            state, m = raw(state, {"input": toks, "label": toks})
            return (state, key), m["loss"]
        (state, key), losses = jax.lax.scan(body, carry, None, length=steps)
        return (state, key), losses[-1]

    (state, _), loss = chunk((state, key))
    return state, float(loss)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--n-new", type=int, default=256)
    ap.add_argument("--temperature", type=float, default=0.0,
                    help="0 = greedy (exactness asserted); >0 = stochastic "
                         "speculative sampling (acceptance = overlap of the "
                         "two softened distributions, E[min(p,q)] summed)")
    args = ap.parse_args()

    qc = default_qconfig(8, 8, init_batches=4)
    target = QuantTransformerLM(vocab=VOCAB, dim=1024, depth=4, num_heads=8,
                                qconfig=qc, max_len=T + args.n_new + args.k)
    draft = QuantTransformerLM(vocab=VOCAB, dim=128, depth=1, num_heads=2,
                               qconfig=qc, max_len=T + args.n_new + args.k)

    tstate, tloss = train(target, args.steps, 64, seed=0)
    print(f"target trained: loss {tloss:.3f}", flush=True)
    dstate, dloss = train(draft, args.steps, 64, seed=0)
    print(f"draft trained:  loss {dloss:.3f}", flush=True)

    sv_t = convert({**tstate.params, **tstate.model_state}, qc)
    sv_d = convert({**dstate.params, **dstate.model_state}, qc)
    st = dataclasses.replace(target, qconfig=qc.for_serving("none", "auto"))
    sd = dataclasses.replace(draft, qconfig=qc.for_serving("none", "auto"))

    prompt = np.asarray(corpus_batch(jax.random.key(99), 1))[:, :32]
    prompt = jnp.asarray(prompt)

    def best_time(fn, *a, rounds=5):
        np.asarray(fn(*a))
        ts = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            np.asarray(fn(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    if args.temperature > 0:
        from jaxlsq.serve import make_sampler

        key = jax.random.key(7)
        plain = make_generate(st, 32, args.n_new, sampled=True,
                              logits_to_token=make_sampler(args.temperature))
        spec = make_speculative_generate(st, sd, 32, args.n_new, k=args.k,
                                         temperature=args.temperature,
                                         return_stats=True)
        got, stats = spec(sv_t, sv_d, prompt, key)
        got = np.asarray(got)
        assert got.shape == (1, args.n_new)
        acc = float(stats["accepted_per_round"])
        print(f"sampled T={args.temperature}; accepted/round = {acc:.2f} "
              f"(k={args.k})", flush=True)
        tp = best_time(plain, sv_t, prompt, key)
        ts_ = best_time(lambda *a: spec(*a)[0], sv_t, sv_d, prompt, key)
    else:
        plain = make_generate(st, 32, args.n_new)
        spec = make_speculative_generate(st, sd, 32, args.n_new, k=args.k,
                                         return_stats=True)
        want = np.asarray(plain(sv_t, prompt))
        got, stats = spec(sv_t, sv_d, prompt)
        assert (want == np.asarray(got)).all(), "speculative must equal greedy"
        acc = float(stats["accepted_per_round"])
        print(f"exactness ok; accepted/round = {acc:.2f} (k={args.k})",
              flush=True)
        tp = best_time(plain, sv_t, prompt)
        ts_ = best_time(lambda *a: spec(*a)[0], sv_t, sv_d, prompt)

    res = {
        "accepted_per_round": round(acc, 2),
        "target": "d1024x4 int8", "draft": "d128x1 int8",
        "train_steps": args.steps, "k": args.k, "n_new": args.n_new,
        "temperature": args.temperature,
        "plain_ms": round(tp * 1e3, 1), "spec_ms": round(ts_ * 1e3, 1),
        "speedup": round(tp / ts_, 2),
        "backend": jax.default_backend(),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
