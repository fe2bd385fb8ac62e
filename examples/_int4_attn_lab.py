"""Bound the int4 KV-cache decode-attention unpack cost (VERDICT r4 #3).

Round-1 findings at B=8, KVH=16, L=2048 (sequential-leg timing):
  bf16 0.231, int8 0.181, int4 0.212, int8_hd32 (= int4 bytes, no unpack)
  0.187 ms/step — so (a) the unpack costs ~13%, and (b) the kernel is NOT
  bandwidth-bound at this shape: halving the bytes again (hd32) did not
  help.  The floor is per-program latency: 128 (b, kv-head) programs x
  L/block_l grid steps, each a tiny gt=1 dot pair + softmax bookkeeping.

This version times all legs INTERLEAVED (same tenancy windows) and adds:
  * block_l=2048 variants — one grid step per program instead of two
  * an L=8192 shape — 4x the bytes per program: does the byte win return?

    python -u examples/_int4_attn_lab.py [--L 2048] [--bl 1024,2048]
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

B, KVH, DEPTH = 8, 16, 4
N1, N2 = 16, 208


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--L", type=int, default=2048)
    ap.add_argument("--bl", default="1024,2048")
    ap.add_argument("--rounds", type=int, default=8)
    args = ap.parse_args()
    L = args.L
    bls = [int(v) for v in args.bl.split(",")]
    assert jax.default_backend() == "tpu"
    r = np.random.RandomState(0)
    start = jnp.asarray(L - 2, jnp.int32)  # full-cache stream

    def build(name, hd, dtype, block_l):
        class _Dims:
            max_len, dim, num_heads, depth = L, KVH * hd, KVH, DEPTH
            num_kv_heads = None

        cache = init_kv_cache(_Dims, B, dtype=dtype)
        kv = jnp.asarray(r.randn(B, KVH, 1, hd).astype(np.float32))
        from jaxlsq.models.zoo import _cached_attention
        cache = jax.jit(lambda c: tuple(
            _cached_attention(kv, kv, kv, lay, start, "xla")[1]
            for lay in c))(cache)
        q0 = jnp.asarray(r.randn(B, KVH, 1, hd).astype(np.float32))

        def step(carry, _):
            q, i = carry
            acc = 0.0
            for (ck, cv) in cache:
                acc = acc + decode_attention(q, ck, cv, start, impl="pallas",
                                             block_l=block_l)
            return (q + acc * 1e-9, i + 1), None

        def chain(n):
            @jax.jit
            def run(q):
                (qf, _), _ = jax.lax.scan(step, (q, jnp.int32(0)), None,
                                          length=n)
                return qf.ravel()[:4]
            return run

        return chain(N1), chain(N2), q0

    progs = {}
    for bl in bls:
        tag = f"_bl{bl}" if len(bls) > 1 else ""
        progs[f"bf16{tag}"] = build("bf16", 64, jnp.bfloat16, bl)
        progs[f"int8{tag}"] = build("int8", 64, jnp.int8, bl)
        progs[f"int4{tag}"] = build("int4", 64, "int4", bl)
        progs[f"int8_hd32{tag}"] = build("hd32", 32, jnp.int8, bl)

    for r1, r2, q0 in progs.values():
        np.asarray(r1(q0)); np.asarray(r2(q0))  # compile + warm
    rec = {name: ([], []) for name in progs}
    for _ in range(args.rounds):
        for name, (r1, r2, q0) in progs.items():
            t0 = time.perf_counter(); np.asarray(r1(q0))
            rec[name][0].append(time.perf_counter() - t0)
            t0 = time.perf_counter(); np.asarray(r2(q0))
            rec[name][1].append(time.perf_counter() - t0)

    out = {}
    for name in progs:
        dt = max((min(rec[name][1]) - min(rec[name][0])) / (N2 - N1), 1e-9)
        out[name] = round(dt * 1e3, 4)
        print(f"L={L} {name}: {dt*1e3:.4f} ms/step (4 layers)", flush=True)
    print(json.dumps({"L": L, **out}))


if __name__ == "__main__":
    main()
