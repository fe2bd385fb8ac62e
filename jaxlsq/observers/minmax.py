"""Min/max range observers for activation-quantizer initialization.

JAX reimplementation of the torch observers the reference plugs into its
``init_mode='observer'`` path (observers.py:176-187 instantiates one;
README.md:109-110 recommends ``MovingAverage(PerChannel)MinMaxObserver``).
The reference borrows PyTorch's implementations; this framework re-creates
their semantics as pure functional state transitions (SURVEY.md §7 step 3):

* state is an explicit pytree ``ObserverState(min_val, max_val, seen)``;
* ``update(state, x)`` returns a new state (plain min/max or exponential
  moving average, per-tensor or per-channel);
* ``calculate_qparams(state, spec)`` maps the tracked range to
  (scale, zero_point) with torch-compatible semantics:
    - affine:    scale = (max⁺ − min⁻)/(qmax − qmin),
                 zp = clamp(qmin − round(min⁻/scale), qmin, qmax)
    - symmetric: scale = 2·max(−min⁻, max⁺)/(qmax − qmin),
                 zp = 0 for signed ranges, else midpoint of the range
  with min⁻ = min(min, 0), max⁺ = max(max, 0) and an eps floor on scale —
  mirroring torch.quantization.observer.ObserverBase._calculate_qparams, which
  is what the reference's ``calculate_qparams()`` call returns
  (observers.py:448).

The LSQ quantizer then converts zero_point to its float shift via
``shift = −zp·scale`` (observers.py:366-368).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.spec import QuantSpec

__all__ = ["ObserverState", "MinMaxObserver", "MovingAverageMinMaxObserver",
           "MSEObserver", "PercentileObserver", "observer_qparams"]


class ObserverState(struct.PyTreeNode):
    """Tracked range.  Shapes: (1,) per-tensor, (C,) per-channel."""
    min_val: jnp.ndarray
    max_val: jnp.ndarray
    # Number of updates seen (traced); the first update overwrites instead of
    # averaging, like torch's uninitialized-buffer check.
    seen: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class MinMaxObserver:
    """Running min/max observer (torch MinMaxObserver / PerChannel variant).

    ``averaging_constant=None`` → plain running min/max;
    otherwise exponential moving average (torch MovingAverage*MinMaxObserver):
      min ← min + c·(batch_min − min).
    """

    per_channel: bool = False
    axis: int = 1
    averaging_constant: Optional[float] = None

    # Cheap update (one fusable min/max reduce): the traced QAT path keeps it
    # always-on and jnp.where-merges — see LSQQuantizer._forward_traced.
    expensive_update = False

    def init(self, num_channels: int = 1) -> ObserverState:
        c = num_channels if self.per_channel else 1
        return ObserverState(
            min_val=jnp.zeros((c,), jnp.float32),
            max_val=jnp.zeros((c,), jnp.float32),
            seen=jnp.zeros((), jnp.int32),
        )

    def _batch_min_max(self, x: jnp.ndarray):
        x = jax.lax.stop_gradient(x).astype(jnp.float32)
        if self.per_channel:
            red = tuple(a for a in range(x.ndim) if a != self.axis)
            return jnp.min(x, axis=red), jnp.max(x, axis=red)
        return jnp.min(x).reshape(1), jnp.max(x).reshape(1)

    def update(self, state: ObserverState, x: jnp.ndarray) -> ObserverState:
        bmin, bmax = self._batch_min_max(x)
        first = state.seen == 0
        if self.averaging_constant is None:
            new_min = jnp.where(first, bmin, jnp.minimum(state.min_val, bmin))
            new_max = jnp.where(first, bmax, jnp.maximum(state.max_val, bmax))
        else:
            c = jnp.float32(self.averaging_constant)
            new_min = jnp.where(first, bmin,
                                state.min_val + c * (bmin - state.min_val))
            new_max = jnp.where(first, bmax,
                                state.max_val + c * (bmax - state.max_val))
        return ObserverState(min_val=new_min, max_val=new_max,
                             seen=state.seen + 1)

    def calculate_qparams(self, state: ObserverState,
                          spec: QuantSpec) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return observer_qparams(state.min_val, state.max_val, spec)


def MovingAverageMinMaxObserver(averaging_constant: float = 0.01,
                                per_channel: bool = False,
                                axis: int = 1) -> MinMaxObserver:
    """torch ``MovingAverage(PerChannel)MinMaxObserver`` equivalent."""
    return MinMaxObserver(per_channel=per_channel, axis=axis,
                          averaging_constant=averaging_constant)


@dataclasses.dataclass(frozen=True)
class MSEObserver:
    """MSE-minimizing range observer (BASELINE.json north_star "MSE-min ...
    activation init"; no counterpart exists in the reference, which only uses
    torch's min/max observers — README.md:109-110).

    Each update shrinks the batch's [min, max] range by a grid of factors
    ``f ∈ (0, 1]``, fake-quantizes the batch at the qparams each shrunken
    range implies, and keeps the range minimizing ``||x_fq − x||²`` — per
    channel when ``per_channel``.  Ranges are then EMA-merged across batches
    like MovingAverageMinMaxObserver.  Entirely traced control flow
    (``lax.map`` over the candidate grid) so it runs inside jit.

    ``spec`` must be the QuantSpec of the quantizer this observer feeds (the
    search needs the quant range; the duck-typed ``update(state, x)``
    interface has no spec argument).
    """

    spec: QuantSpec
    per_channel: bool = False
    axis: int = 1
    num_candidates: int = 64
    averaging_constant: Optional[float] = 0.01

    # 64-candidate grid search per update: the traced QAT path gates it
    # behind lax.cond so post-window steps pay nothing.
    expensive_update = True

    def init(self, num_channels: int = 1) -> ObserverState:
        c = num_channels if self.per_channel else 1
        return ObserverState(
            min_val=jnp.zeros((c,), jnp.float32),
            max_val=jnp.zeros((c,), jnp.float32),
            seen=jnp.zeros((), jnp.int32),
        )

    def _best_range(self, x: jnp.ndarray):
        xf = jax.lax.stop_gradient(x).astype(jnp.float32)
        if self.per_channel:
            red = tuple(a for a in range(x.ndim) if a != self.axis)
            bmin, bmax = jnp.min(xf, axis=red), jnp.max(xf, axis=red)
            bshape = [1] * x.ndim
            bshape[self.axis] = bmin.shape[0]
        else:
            red = tuple(range(x.ndim))
            bmin = jnp.min(xf).reshape(1)
            bmax = jnp.max(xf).reshape(1)
            bshape = [1] * x.ndim
        qmin, qmax = float(self.spec.quant_min), float(self.spec.quant_max)

        def mse(f):
            mn, mx = bmin * f, bmax * f
            scale, zp = observer_qparams(mn, mx, self.spec)
            s = scale.reshape(bshape)
            z = zp.reshape(bshape)
            xq = jnp.round(jnp.clip(xf / s + z, qmin, qmax))
            return jnp.sum(((xq - z) * s - xf) ** 2, axis=red)  # (C,) or ()

        fs = jnp.linspace(1.0 / self.num_candidates, 1.0, self.num_candidates)
        errs = jax.lax.map(mse, fs)              # (num, C) or (num,)
        errs = errs.reshape(self.num_candidates, -1)
        best_f = fs[jnp.argmin(errs, axis=0)]    # (C,)
        return bmin * best_f, bmax * best_f

    def update(self, state: ObserverState, x: jnp.ndarray) -> ObserverState:
        nmin, nmax = self._best_range(x)
        first = state.seen == 0
        if self.averaging_constant is None:
            new_min = jnp.where(first, nmin, jnp.minimum(state.min_val, nmin))
            new_max = jnp.where(first, nmax, jnp.maximum(state.max_val, nmax))
        else:
            c = jnp.float32(self.averaging_constant)
            new_min = jnp.where(first, nmin,
                                state.min_val + c * (nmin - state.min_val))
            new_max = jnp.where(first, nmax,
                                state.max_val + c * (nmax - state.max_val))
        return ObserverState(min_val=new_min, max_val=new_max,
                             seen=state.seen + 1)

    def calculate_qparams(self, state: ObserverState,
                          spec: QuantSpec) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return observer_qparams(state.min_val, state.max_val, spec)


@dataclasses.dataclass(frozen=True)
class PercentileObserver:
    """Percentile range observer (TensorRT-style calibration; no counterpart
    in the reference, which only uses torch's min/max observers —
    README.md:109-110).

    Min/max observers are outlier-hostages: ONE extreme activation stretches
    the whole range and wastes quantization levels on values that never
    recur.  This observer tracks the ``(100−p, p)`` batch percentiles instead
    (default p=99.99: clip the 1-in-10⁴ tail), EMA-merged across batches like
    MovingAverageMinMaxObserver.  The traced quantile is one device sort per
    update — gated behind ``lax.cond`` post-window via ``expensive_update``
    (see LSQQuantizer._forward_traced).
    """

    percentile: float = 99.99
    per_channel: bool = False
    axis: int = 1
    averaging_constant: Optional[float] = 0.01
    # Subsample cap before the device sort.  XLA's sort is O(N log^2 N)
    # passes — a FULL percentile over a (128, 32, 32, C) conv activation is
    # seconds per update and made the percentile1200 recipe ~50x the minmax
    # cost (r5 campaign: one mobilenetv2 seed did not finish in an hour).
    # TensorRT-style calibrators subsample for the same reason; a
    # deterministic stride keeps the update traced-shape-static and
    # reproducible.  None = exact (fine for small tensors / unit tests).
    sample_cap: Optional[int] = 1 << 16

    expensive_update = True

    def __post_init__(self):
        if not 50.0 < self.percentile <= 100.0:
            raise ValueError(
                f"percentile must be in (50, 100], got {self.percentile}")
        if self.sample_cap is not None and self.sample_cap < 1024:
            raise ValueError("sample_cap must be >= 1024 (or None for exact)")

    def init(self, num_channels: int = 1) -> ObserverState:
        c = num_channels if self.per_channel else 1
        return ObserverState(
            min_val=jnp.zeros((c,), jnp.float32),
            max_val=jnp.zeros((c,), jnp.float32),
            seen=jnp.zeros((), jnp.int32),
        )

    def _subsample(self, flat: jnp.ndarray) -> jnp.ndarray:
        """Deterministic strided subsample along the LAST axis down to
        ``sample_cap`` elements (static shapes; stride >= 1)."""
        n = flat.shape[-1]
        if self.sample_cap is None or n <= self.sample_cap:
            return flat
        stride = -(-n // self.sample_cap)
        return flat[..., ::stride]

    def _batch_range(self, x: jnp.ndarray):
        xf = jax.lax.stop_gradient(x).astype(jnp.float32)
        q = jnp.asarray([100.0 - self.percentile, self.percentile])
        if self.per_channel:
            xc = jnp.moveaxis(xf, self.axis, 0).reshape(x.shape[self.axis], -1)
            lo, hi = jnp.percentile(self._subsample(xc), q, axis=1)  # (C,)
            return lo, hi
        lo, hi = jnp.percentile(self._subsample(xf.reshape(-1)), q)
        return lo.reshape(1), hi.reshape(1)

    def update(self, state: ObserverState, x: jnp.ndarray) -> ObserverState:
        bmin, bmax = self._batch_range(x)
        first = state.seen == 0
        if self.averaging_constant is None:
            new_min = jnp.where(first, bmin, jnp.minimum(state.min_val, bmin))
            new_max = jnp.where(first, bmax, jnp.maximum(state.max_val, bmax))
        else:
            c = jnp.float32(self.averaging_constant)
            new_min = jnp.where(first, bmin,
                                state.min_val + c * (bmin - state.min_val))
            new_max = jnp.where(first, bmax,
                                state.max_val + c * (bmax - state.max_val))
        return ObserverState(min_val=new_min, max_val=new_max,
                             seen=state.seen + 1)

    def calculate_qparams(self, state: ObserverState,
                          spec: QuantSpec) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return observer_qparams(state.min_val, state.max_val, spec)


def observer_qparams(min_val: jnp.ndarray, max_val: jnp.ndarray,
                     spec: QuantSpec) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """torch-compatible (scale, zero_point) from a tracked [min, max] range."""
    qmin, qmax = float(spec.quant_min), float(spec.quant_max)
    eps = jnp.float32(jnp.finfo(jnp.float32).eps)
    min_neg = jnp.minimum(min_val, 0.0)
    max_pos = jnp.maximum(max_val, 0.0)
    if spec.symmetric:
        amax = jnp.maximum(-min_neg, max_pos)
        scale = amax / ((qmax - qmin) / 2.0)
        scale = jnp.maximum(scale, eps)
        if spec.quant_min <= 0 <= spec.quant_max and spec.quant_min < 0:
            zp = jnp.zeros_like(scale)
        else:
            # unsigned carrier: centre of the range (torch uses 128 for quint8)
            zp = jnp.full_like(scale, float((spec.quant_min + spec.quant_max + 1) // 2))
    else:
        scale = (max_pos - min_neg) / (qmax - qmin)
        scale = jnp.maximum(scale, eps)
        zp = qmin - jnp.round(min_neg / scale)
        zp = jnp.clip(zp, qmin, qmax)
    return scale, zp
