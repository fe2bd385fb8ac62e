"""Continuous-batching serving engine (BASELINE.json north_star: "...with
continuous batching across hosts and collectives overlapped with compute").

The reference has no serving runtime at all (SURVEY.md §5); this is a new
TPU-native component.  Design:

* Requests are enqueued from any thread (`submit` returns a Future).
* A dispatcher thread drains the queue continuously: whatever arrived is
  padded up to the nearest power-of-two batch bucket and launched — no fixed
  batch-formation window beyond ``max_wait_ms`` when the queue is EMPTY.  New
  requests admitted while the chip is busy form the next batch immediately
  (the "continuous" in continuous batching — arrival never waits for an
  epoch boundary).
* One compiled program per bucket size (XLA static shapes), warmed eagerly
  with `warmup()` or lazily on first use.
* Multi-host / TP: pass an ``apply_fn`` already jitted over a mesh with the
  converted variables sharded by ``shard_converted`` — the engine is
  placement-agnostic; XLA overlaps its collectives with compute.

This is a host-side runtime around the compiled serve path; the dense compute
itself is jaxlsq/serve/matmul.py.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ServingEngine"]


class _Request:
    __slots__ = ("x", "future", "t_enqueue")

    def __init__(self, x):
        self.x = x
        self.future: Future = Future()
        self.t_enqueue = time.perf_counter()


class ServingEngine:
    """Continuous-batching wrapper around a compiled per-example model fn.

    Args:
      apply_fn: callable ``(batch_x) -> batch_out`` over a LEADING batch axis;
        should be jitted (the engine jits it if not).
      example_shape: per-example input shape (no batch axis).
      max_batch: largest bucket (power-of-two buckets from 1 up to this).
      max_wait_ms: how long the dispatcher sleeps when idle before
        re-checking the queue (latency floor when the system is unloaded).
      dtype: input dtype.
    """

    def __init__(self, apply_fn: Callable, example_shape: Sequence[int], *,
                 max_batch: int = 64, max_wait_ms: float = 2.0,
                 dtype=jnp.float32):
        self._fn = jax.jit(apply_fn) if not hasattr(apply_fn, "lower") \
            else apply_fn
        self.example_shape = tuple(example_shape)
        self.dtype = dtype
        self.buckets = []
        b = 1
        while b <= max_batch:
            self.buckets.append(b)
            b *= 2
        self.max_batch = self.buckets[-1]
        self.max_wait_s = max_wait_ms / 1e3
        self._queue: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._stats_lock = threading.Lock()
        # Serializes submit() against close() so a request can never be
        # enqueued after the close sentinel (whose leftovers flush would
        # otherwise miss it, leaving its Future unresolved forever).
        self._lifecycle_lock = threading.Lock()
        self.stats = {"requests": 0, "batches": 0, "padded_examples": 0}
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------ API

    def submit(self, x) -> Future:
        """Enqueue one example (shape == example_shape); returns a Future
        resolving to the model output for that example."""
        x = np.asarray(x)
        if x.shape != self.example_shape:
            raise ValueError(
                f"expected example shape {self.example_shape}, got {x.shape}")
        req = _Request(x)
        with self._lifecycle_lock:
            if self._stop:
                raise RuntimeError("ServingEngine is closed")
            self._queue.put(req)
        return req.future

    def submit_many(self, xs) -> list:
        return [self.submit(x) for x in xs]

    def warmup(self):
        """Compile every bucket size up front (slow first compiles otherwise)."""
        for b in self.buckets:
            x = jnp.zeros((b,) + self.example_shape, self.dtype)
            jax.block_until_ready(self._fn(x))

    def close(self):
        with self._lifecycle_lock:
            already = self._stop
            self._stop = True
            if not already:
                self._queue.put(None)  # wake the dispatcher
        self._thread.join(timeout=10)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------ dispatcher

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.max_batch

    def _drain(self, first: _Request) -> list:
        batch = [first]
        while len(batch) < self.max_batch:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            if req is None:
                self._stop = True
                break
            batch.append(req)
        return batch

    def _loop(self):
        while not self._stop:
            try:
                first = self._queue.get(timeout=self.max_wait_s)
            except queue.Empty:
                continue
            if first is None:
                break
            batch = self._drain(first)
            self._run(batch)
        # flush whatever remains after close()
        leftovers = []
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            if req is not None:
                leftovers.append(req)
        for i in range(0, len(leftovers), self.max_batch):
            self._run(leftovers[i:i + self.max_batch])

    def _run(self, batch: list):
        n = len(batch)
        bucket = self._bucket_for(n)
        try:
            x = np.zeros((bucket,) + self.example_shape, dtype=np.dtype(
                jnp.dtype(self.dtype).name))
            for i, req in enumerate(batch):
                x[i] = req.x
            out = np.asarray(jax.block_until_ready(self._fn(jnp.asarray(x))))
            for i, req in enumerate(batch):
                req.future.set_result(out[i])
        except Exception as e:  # propagate to every waiter in the batch
            for req in batch:
                if not req.future.done():
                    req.future.set_exception(e)
            return
        with self._stats_lock:
            self.stats["requests"] += n
            self.stats["batches"] += 1
            self.stats["padded_examples"] += bucket - n
