"""int4 wo_matmul kernel lab (VERDICT r4 next-#3).

Measures, at serving shapes, the candidate nibble-path designs against the
shipped int8 kernel and the regime floors:

  int8        shipped _wo8_kernel
  int4_cur    shipped _wo4_kernel (i32 widen + shifts, f32 planes, 2 dots)
  int4_bf16   same unpack, bf16 plane dtype (half the convert-output bytes;
              dots already run bf16-pass at default precision)
  int4_native w stored as jnp.int4 (XLA packs storage 2/byte): Mosaic's own
              int4->f32 convert replaces the manual widen/shift/convert chain,
              and K stays contiguous (ONE dot per k-step, no split halves)

Floors at M128/K8192/N8192 on v5e: MXU bf16 = 2MKN/197e12 = 0.087 ms;
int8 DMA = 67.1 MB / measured-stream; int4 DMA = 33.5 MB.  The M=128 bench
shape is COMPUTE-bound — the byte win can only show at small M (decode).

Usage: python -u examples/_int4_kernel_lab.py [--m 16,128]
"""

import argparse
import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jaxlsq import QuantSpec
from jaxlsq.serve import quantize_weight, wo_matmul
from jaxlsq.serve.matmul import _cdiv, _pad_to, _qparams_rows


def _wo4_bf16_kernel(xlo_ref, xhi_ref, p_ref, s_ref, o_ref, acc_ref, *,
                     nk: int):
    """Current split-half unpack, but planes+x in bf16 (symmetric: no zp)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pi = p_ref[:].astype(jnp.int32)
    hi = (pi >> 4).astype(jnp.bfloat16)
    lo = ((pi << 28) >> 28).astype(jnp.bfloat16)
    acc_ref[:] += jax.lax.dot(xlo_ref[:], lo,
                              preferred_element_type=jnp.float32)
    acc_ref[:] += jax.lax.dot(xhi_ref[:], hi,
                              preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[:]).astype(o_ref.dtype)


def _wo4_native_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, nk: int,
                       plane):
    """w_ref is an int4-typed (bk, bn) block; Mosaic unpacks in the convert."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:].astype(plane)
    acc_ref[:] += jax.lax.dot(x_ref[:].astype(plane), w,
                              preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[:]).astype(o_ref.dtype)


def run_bf16(x2d, packed, bm, bn, bk):
    kdim, n = packed.orig_shape
    m = x2d.shape[0]
    bm = min(bm, max(8, _cdiv(m, 8) * 8))
    xp = _pad_to(x2d.astype(jnp.bfloat16), bm, bk)
    mp = xp.shape[0]
    grid_m, grid_n = _cdiv(mp, bm), _cdiv(n, bn)
    n_pad = grid_n * bn
    s2, _ = _qparams_rows(packed, n_pad)
    k2 = packed.data.shape[0]
    if xp.shape[1] < 2 * k2:
        xp = jnp.pad(xp, ((0, 0), (0, 2 * k2 - xp.shape[1])))
    wp = _pad_to(packed.data, bk, bn)
    k2p = wp.shape[0]
    xlo, xhi = xp[:, :k2p], xp[:, k2:k2 + k2p]
    nk = k2p // bk
    out = pl.pallas_call(
        functools.partial(_wo4_bf16_kernel, nk=nk),
        out_shape=jax.ShapeDtypeStruct((mp, n_pad), jnp.float32),
        grid=(grid_m, grid_n, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(xlo, xhi, wp, s2)
    return out[:m, :n]


def run_native(x2d, w4, scale, bm, bn, bk, plane=jnp.float32):
    kdim, n = w4.shape
    m = x2d.shape[0]
    bm = min(bm, max(8, _cdiv(m, 8) * 8))
    xp = _pad_to(x2d.astype(jnp.float32), bm, bk)
    mp = xp.shape[0]
    grid_m, grid_n = _cdiv(mp, bm), _cdiv(n, bn)
    n_pad = grid_n * bn
    s2 = scale.reshape(1, -1)
    if n_pad > n:
        s2 = jnp.pad(s2, ((0, 0), (0, n_pad - n)), constant_values=1.0)
    nk = kdim // bk
    out = pl.pallas_call(
        functools.partial(_wo4_native_kernel, nk=nk, plane=plane),
        out_shape=jax.ShapeDtypeStruct((mp, n_pad), jnp.float32),
        grid=(grid_m, grid_n, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(xp, w4, s2)
    return out[:m, :n]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", default="16,128")
    ap.add_argument("--k", type=int, default=8192)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--rounds", type=int, default=10)
    args = ap.parse_args()

    k, n = args.k, args.n
    r = np.random.RandomState(1)
    spec4 = QuantSpec.make(4, signed=True, symmetric=True, per_channel=True,
                           axis=1)
    spec8 = QuantSpec.make(8, signed=True, symmetric=True, per_channel=True,
                           axis=1)
    w = jnp.asarray(0.02 * r.randn(k, n).astype(np.float32))
    scale = jnp.asarray(0.001 + 0.0005 * r.rand(n).astype(np.float32))
    zp = jnp.zeros((n,))
    p8 = quantize_weight(w, scale, zp, spec8, bits=8)
    p4 = quantize_weight(w, scale, zp, spec4, bits=4)
    # native int4 array: same quantized values, (K, N), int4 dtype
    q = jnp.round(jnp.clip(w / scale[None, :], -8, 7))
    w4 = q.astype(jnp.int4)
    sc = p4.scale.astype(jnp.float32)

    results = {}
    for m in [int(v) for v in args.m.split(",")]:
        x = jnp.asarray(r.randn(m, k).astype(np.float32))

        # int4_native / int4_native_bf16 (jnp.int4-typed refs) are DROPPED:
        # Mosaic on this v5e rejects int4 vector loads outright
        # ("UNIMPLEMENTED: TPU backend error") — measured 2026-08-20.
        variants = {
            "int8": (lambda x: wo_matmul(x, p8, impl="pallas"), p8),
            "int4_cur": (lambda x: wo_matmul(x, p4, impl="pallas"), p4),
            "int4_bf16": (lambda x: run_bf16(x, p4, 256, 2048, 512), p4),
        }

        # correctness first (each vs the XLA dequant matmul at ITS bits)
        ok = {}
        fns = {}
        for name, (fn, pk) in variants.items():
            ref = np.asarray(wo_matmul(x, pk, impl="xla"))
            try:
                y = np.asarray(jax.jit(fn)(x))
                rel = (np.abs(y - ref).max()
                       / max(np.abs(ref).max(), 1e-9))
                ok[name] = float(rel)
                fns[name] = fn
            except Exception as e:
                ok[name] = f"FAIL: {str(e)[:160]}"
        print(f"M={m} correctness (max rel err vs same-bits XLA):",
              json.dumps(ok), flush=True)

        def chain(fn, kk):
            @jax.jit
            def f(x):
                def body(i, acc):
                    y = fn(x + acc[0, 0] * 1e-9)
                    return y[:, :k]
                return jnp.sum(jax.lax.fori_loop(0, kk, body, x)[:1, :8])
            return f

        # sub-ms kernels need LONG chains (CLAUDE.md: distrust sub-ms slopes)
        # — a 40-step delta is ~1-4 ms, inside dispatch jitter (measured: the
        # int4-vs-int8 ORDER flipped between 8/48-chain runs); a 256-step
        # delta rides ~10-30 ms of pure kernel time.
        K1, K2 = 32, 288
        timed = {}
        for name, fn in fns.items():
            if not isinstance(ok[name], float):
                continue
            pair = (chain(fn, K1), chain(fn, K2))
            try:
                float(pair[0](x)); float(pair[1](x))
                timed[name] = pair
            except Exception as e:
                print(f"M={m} {name}: chain compile FAIL "
                      f"{str(e)[:160]}", flush=True)
        rec = {name: ([], []) for name in timed}
        for _ in range(args.rounds):
            for name, (f1, f2) in timed.items():
                t0 = time.perf_counter(); float(f1(x))
                rec[name][0].append(time.perf_counter() - t0)
                t0 = time.perf_counter(); float(f2(x))
                rec[name][1].append(time.perf_counter() - t0)
        out = {}
        for name in timed:
            dt = max((min(rec[name][1]) - min(rec[name][0])) / (K2 - K1),
                     1e-9)
            wbytes = k * n * (1 if name == "int8" else 0.5)
            out[name] = {"ms": round(dt * 1e3, 4),
                         "w_gbps": round(wbytes / dt / 1e9, 1)}
        results[f"M{m}"] = out
        print(f"M={m}:", json.dumps(out), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
