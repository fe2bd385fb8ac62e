"""Attribute the paged-vs-dense decode gap operation-by-operation.

BENCH_r04: paged_vs_dense_b8_L2048 = 0.86 at the shipped default
page_size=1024; the r4 decision note attributed the residual to "write
scatter + per-layer table plumbing inside the scan" — a hypothesis, not a
measurement (VERDICT r4 next-#4).  This script isolates the three paged-path
ops against their dense counterparts at the bench shape (B=8, L=2048,
KVH=16, hd=64, int8 carriers, 4 layers):

  update     quantize-on-write: dense dynamic_update_slice vs paged
             scatter-through-the-block-table (paged_update)
  attention  fused flash-decoding kernel: dense (B,KVH,L,hd) layout vs the
             paged scalar-prefetch pools
  step       the full transformer decode step, dense vs paged (the bench's
             own comparison, re-measured here as the cross-check)

Each leg is a device-side lax.scan chain (one dispatch per trip count; slope
between two lengths cancels dispatch + prefill), min-of-rounds interleaved.

    python -u examples/paged_profile.py \
        [--out docs/measurements/paged_profile_tpu.json]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

try:
    import os
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAXLSQ_COMPILE_CACHE",
                                     "/tmp/jaxlsq_compile_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from jaxlsq.serve.attention import decode_attention
from jaxlsq.serve.decode import init_kv_cache
from jaxlsq.serve.paged import init_paged_cache, paged_attention, paged_update

B, KVH, HD, L, PS, DEPTH = 8, 16, 64, 2048, 1024, 4


class _Dims:
    max_len, dim, num_heads, depth, num_kv_heads = L, KVH * HD, KVH, DEPTH, None


def _chain(step, carry0, n):
    """jit'd scan chain: returns a callable whose cost is n * step."""
    @jax.jit
    def run(carry):
        carry, _ = jax.lax.scan(step, carry, None, length=n)
        return jax.tree.leaves(carry)[0].ravel()[:4]
    return run, carry0


def _slope(run1, run2, c1, c2, n1, n2, rounds=8):
    np.asarray(run1(c1)); np.asarray(run2(c2))  # compile + warm
    t1s, t2s = [], []
    for _ in range(rounds):
        t0 = time.perf_counter(); np.asarray(run1(c1))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(run2(c2))
        t2s.append(time.perf_counter() - t0)
    return max((min(t2s) - min(t1s)) / (n2 - n1), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out",
                    default="docs/measurements/paged_profile_tpu.json")
    ap.add_argument("--rounds", type=int, default=8)
    args = ap.parse_args()
    assert jax.default_backend() == "tpu"

    r = np.random.RandomState(0)
    key = jax.random.key(0)
    dcache = init_kv_cache(_Dims, B, dtype=jnp.int8)          # per-layer
    pcache = init_paged_cache(_Dims, B, page_size=PS, dtype=jnp.int8)
    kv0 = jnp.asarray(r.randn(B, KVH, 1, HD).astype(np.float32))
    q0 = jnp.asarray(r.randn(B, KVH, 1, HD).astype(np.float32))
    start = jnp.asarray(512, jnp.int32)  # mid-cache write/read position

    from jaxlsq.models.zoo import _cached_attention

    # ---- update-only legs: one quantize-on-write row per layer per step.
    # Position advances mod a window so the chain stays shape-static.
    def mk_dense_upd():
        def step(carry, _):
            cache, kv, i = carry
            idx = start + (i % 1024)

            def q8(a):
                s = jnp.max(jnp.abs(a), axis=-1) / 127.0
                s = jnp.maximum(s, jnp.finfo(jnp.float32).tiny)
                d = jnp.clip(jnp.round(a / s[..., None]), -127, 127)
                return d.astype(jnp.int8), s.astype(jnp.float32)

            new = []
            for (ck, cv) in cache:
                kq, ks = q8(kv)
                vq, vs = q8(kv)
                ckd = jax.lax.dynamic_update_slice(ck[0], kq, (0, 0, idx, 0))
                cks = jax.lax.dynamic_update_slice(ck[1], ks, (0, 0, idx))
                cvd = jax.lax.dynamic_update_slice(cv[0], vq, (0, 0, idx, 0))
                cvs = jax.lax.dynamic_update_slice(cv[1], vs, (0, 0, idx))
                new.append(((ckd, cks), (cvd, cvs)))
            probe = new[0][0][0].astype(jnp.float32).ravel()[:1] * 1e-9
            return (tuple(new), kv + probe.reshape(1, 1, 1, 1), i + 1), None
        return step

    def mk_paged_upd():
        def step(carry, _):
            cache, kv, i = carry
            idx = start + (i % 1024)
            new = [paged_update(lay, kv, kv, idx) for lay in cache]
            probe = new[0].kp.astype(jnp.float32).ravel()[:1] * 1e-9
            return (tuple(new), kv + probe.reshape(1, 1, 1, 1), i + 1), None
        return step

    # ---- attention-only legs: fixed cache bytes, q varies per step.
    def mk_dense_attn(cache):
        def step(carry, _):
            q, i = carry
            acc = 0.0
            for (ck, cv) in cache:
                y = decode_attention(q, ck, cv, start)
                acc = acc + y
            return (q + acc * 1e-9, i + 1), None
        return step

    def mk_paged_attn(cache):
        def step(carry, _):
            q, i = carry
            acc = 0.0
            for lay in cache:
                y = paged_attention(q, lay, start, impl="pallas")
                acc = acc + y
            return (q + acc * 1e-9, i + 1), None
        return step

    N1, N2 = 16, 208
    legs = {}

    def measure(name, mk_step, carry0):
        s = mk_step
        r1, c1 = _chain(s, carry0, N1)
        r2, c2 = _chain(s, carry0, N2)
        legs[name] = _slope(r1, r2, c1, c2, N1, N2, args.rounds)
        print(f"{name}: {legs[name]*1e3:.4f} ms/step", flush=True)

    measure("dense_update", mk_dense_upd(), (dcache, kv0, jnp.int32(0)))
    measure("paged_update", mk_paged_upd(), (pcache, kv0, jnp.int32(0)))

    # warm caches with one write so attention reads realistic bytes
    dc = jax.jit(lambda c: tuple(
        _cached_attention(kv0, kv0, kv0, lay, start, "xla")[1]
        for lay in c))(dcache)
    pc = jax.jit(lambda c: tuple(
        paged_update(lay, kv0, kv0, start) for lay in c))(pcache)
    measure("dense_attn", mk_dense_attn(dc), (q0, jnp.int32(0)))
    measure("paged_attn", mk_paged_attn(pc), (q0, jnp.int32(0)))

    d_upd, p_upd = legs["dense_update"], legs["paged_update"]
    d_att, p_att = legs["dense_attn"], legs["paged_attn"]
    out = {
        "what": ("paged-vs-dense decode gap attribution at the bench shape "
                 f"(B={B}, KVH={KVH}, hd={HD}, L={L}, ps={PS}, int8, "
                 f"{DEPTH} layers); ms per decode step for the isolated op "
                 "across all layers; slope-timed scan chains, min of "
                 f"{args.rounds} interleaved rounds"),
        "dense_update_ms": round(d_upd * 1e3, 4),
        "paged_update_ms": round(p_upd * 1e3, 4),
        "update_delta_ms": round((p_upd - d_upd) * 1e3, 4),
        "dense_attn_ms": round(d_att * 1e3, 4),
        "paged_attn_ms": round(p_att * 1e3, 4),
        "attn_delta_ms": round((p_att - d_att) * 1e3, 4),
        "backend": jax.default_backend(),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
