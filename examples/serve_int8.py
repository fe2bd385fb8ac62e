"""Serving example: convert a QAT transformer LM to INT8, shard it
tensor-parallel over the mesh 'model' axis, and serve greedy decodes through
the continuous-batching engine — then demonstrate prefix caching (a shared
system prompt prefilled once) and the AOT deployment artifact
(jax.export StableHLO of the whole generate loop).

  python examples/serve_int8.py --requests 32
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from jaxlsq.models import QuantTransformerLM, default_qconfig
from jaxlsq.parallel import make_mesh
from jaxlsq.serve import ServingEngine, convert, shard_converted


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--seq", type=int, default=32)
    args = ap.parse_args()

    qc = default_qconfig(8, 8, per_channel_weights=True, init_batches=0)
    model = QuantTransformerLM(vocab=256, dim=128, depth=2, num_heads=4,
                               qconfig=qc, max_len=args.seq + 32)
    tok0 = jnp.zeros((1, args.seq), jnp.int32)
    variables = model.init(jax.random.key(0), tok0, training=False)

    serve_vars = convert(variables, qc)
    serve_model = dataclasses.replace(model, qconfig=qc.for_serving("static"))

    n_dev = jax.device_count()
    if n_dev > 1:
        mesh = make_mesh(data=1, model=n_dev)
        serve_vars = shard_converted(serve_vars, mesh)
        print(f"TP-sharded over {n_dev} devices")

    def apply_fn(tokens):
        return serve_model.apply(serve_vars, tokens, training=False)

    r = np.random.RandomState(0)
    with ServingEngine(apply_fn, example_shape=(args.seq,), max_batch=16,
                       dtype=jnp.int32) as eng:
        eng.warmup()
        futs = eng.submit_many(
            [r.randint(0, 256, size=args.seq).astype(np.int32)
             for _ in range(args.requests)])
        outs = [f.result(timeout=300) for f in futs]
    print(f"served {len(outs)} requests in {eng.stats['batches']} batches "
          f"(padding waste {eng.stats['padded_examples']} examples)")
    print("logits[0, -1, :4] =", outs[0][-1, :4])

    # Token-level continuous batching: generation requests of different
    # prompt lengths join one running decode batch at token boundaries.
    from jaxlsq.serve import DecodeEngine, make_sampler

    gen_model = dataclasses.replace(model, qconfig=qc.for_serving("none"))
    with DecodeEngine(gen_model, serve_vars, max_batch=4,
                      prompt_buckets=(8, args.seq),
                      logits_to_token=make_sampler(temperature=0.8, top_k=40),
                      rng=jax.random.key(1)) as deng:
        deng.warmup()
        gfuts = [deng.submit(r.randint(0, 256, size=int(r.randint(4, args.seq))),
                             n_new=16) for _ in range(8)]
        gens = [f.result(timeout=600) for f in gfuts]
    util = deng.stats["active_token_sum"] / max(deng.stats["slot_tokens"], 1)
    print(f"generated {len(gens)} continuations of 16 tokens "
          f"({deng.stats['steps']} decode steps, slot utilization {util:.0%})")
    print("tokens[0] =", gens[0])

    # Prefix caching: a shared system prompt is prefilled ONCE; each request
    # admits from a copy of that cache and prefills only its own suffix.
    system_prompt = r.randint(0, 256, size=12).astype(np.int32)
    with DecodeEngine(gen_model, serve_vars, max_batch=4,
                      prompt_buckets=(8,)) as peng:
        h = peng.register_prefix(system_prompt)
        pfuts = [peng.submit(r.randint(0, 256, size=4), n_new=8, prefix=h)
                 for _ in range(4)]
        pouts = [f.result(timeout=600) for f in pfuts]
    print(f"prefix caching: {peng.stats['prefix_tokens_reused']} prompt "
          f"tokens served from the shared prefill "
          f"({len(pouts)} requests x {len(system_prompt)} prefix tokens)")

    # Paged KV memory: the same engine discipline over block-table page
    # pools — cache HBM scales with the pages live requests use, and the
    # shared prefix is shared ZERO-COPY (slots point at the handle's pages).
    from jaxlsq.serve import PagedDecodeEngine

    with PagedDecodeEngine(gen_model, serve_vars, num_pages=24, page_size=8,
                           max_batch=4, prompt_buckets=(8,)) as geng:
        h = geng.register_prefix(system_prompt)
        gfuts = [geng.submit(r.randint(0, 256, size=4), n_new=8, prefix=h)
                 for _ in range(4)]
        gouts = [f.result(timeout=600) for f in gfuts]
    print(f"paged serving: {len(gouts)} requests, "
          f"{geng.stats['prefix_pages_shared']} prefix pages shared "
          f"zero-copy, {geng.stats['admissions_deferred']} deferred on pool "
          f"backpressure ({geng._alloc.num_pages} pages of {geng.page_size})")

    # AOT deployment artifact: the whole scan-fused greedy generate loop as
    # a versioned StableHLO blob — weights remain call-time arguments.
    from jaxlsq.serve import export_generate, load_exported

    blob = export_generate(gen_model, serve_vars, prompt_len=8, n_new=8,
                           batch_size=2)
    runner = load_exported(blob)
    prompts = jnp.asarray(r.randint(0, 256, size=(2, 8)), jnp.int32)
    toks = runner(serve_vars, prompts)
    print(f"AOT artifact: {len(blob) / 1024:.0f} KiB StableHLO, "
          f"decoded {toks.shape} tokens after round-trip")


if __name__ == "__main__":
    main()
