"""Histogram range observer (torch.ao ``HistogramObserver`` parity).

The reference's ``LSQFakeQuantizer`` accepts ANY torch.quantization observer
through its kwargs-introspection plumbing (observers.py:176-187); besides the
MovingAverage min/max observers its README recommends (README.md:109-110),
torch.ao's default static-quant observer is ``HistogramObserver``.  This module
re-creates its semantics as a pure functional state transition so it can drive
the LSQ init window like any other observer in this framework:

* ``update(state, x)`` maintains a ``bins``-bin running histogram over the
  union range of everything seen.  When a batch widens the range, the old
  histogram is remapped into the new bin grid by upsampling each bin
  ``upsample_rate``-fold and scatter-adding the fine bins' mid-points into the
  new boundaries — the exact scheme of torch's ``_combine_histograms`` /
  ``_upscale_histogram``.  Everything is shape-static and traced (the
  data-dependent branches of torch's eager code — first call, unchanged range,
  degenerate old range — become ``jnp.where`` merges), so the update runs
  inside jit; the quantizer gates it behind ``lax.cond`` via
  ``expensive_update = True``.
* ``calculate_qparams(state, spec)`` runs the caffe2 ``NormMinimization``
  quantile search of torch's ``_non_linear_param_search``: alternately pull the
  start/end bin toward the 1e-5-step quantiles, score each candidate range
  with the piecewise-uniform L2 quantization error (``_get_norm`` /
  ``_compute_quantization_error``), and stop when the error rises.  The
  eager ``while``/``break`` loop becomes one ``lax.while_loop`` whose inner
  bin scans are ``searchsorted`` on the histogram CDF, so qparams can be
  computed inside a traced step as well.  The selected range then maps to
  (scale, zero_point) with the same min/max formula as every other observer
  (``observer_qparams``).

Per-tensor only, like torch's (it rejects per-channel qschemes).  Parity is
pinned against ``torch.ao.quantization.observer.HistogramObserver`` in
tests/test_histogram_observer.py (same batches → same histogram / range /
qparams), including range-growth, constant-tensor, and narrowed-range cases.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.spec import QuantSpec
from .minmax import observer_qparams

__all__ = ["HistogramObserver", "HistogramObserverState"]


class HistogramObserverState(struct.PyTreeNode):
    """Running histogram over the union range of all observed batches.

    ``min_val``/``max_val`` keep the (1,) layout of ``ObserverState`` so the
    quantizer's qparams plumbing is shape-uniform across observer kinds.
    """

    min_val: jnp.ndarray    # (1,) f32
    max_val: jnp.ndarray    # (1,) f32
    histogram: jnp.ndarray  # (bins,) f32
    seen: jnp.ndarray       # () int32


def _histc(x: jnp.ndarray, bins: int, mn: jnp.ndarray,
           mx: jnp.ndarray) -> jnp.ndarray:
    """``torch.histc`` semantics: ``bins`` equal-width bins over [mn, mx];
    out-of-range values are IGNORED (not clamped); x == mx lands in the last
    bin; a degenerate mn == mx range drops all (in-range) mass into the middle
    bin ``bins // 2`` (measured torch behavior)."""
    x = x.ravel()
    width = (mx - mn) / bins
    degenerate = width <= 0
    safe_w = jnp.where(degenerate, 1.0, width)
    idx = jnp.floor((x - mn) / safe_w)
    idx = jnp.where(x >= mx, bins - 1, idx)  # right edge is inclusive
    idx = jnp.where(degenerate, bins // 2, idx)
    valid = (x >= mn) & (x <= mx)
    idx = jnp.clip(idx, 0, bins - 1).astype(jnp.int32)
    return jnp.zeros((bins,), jnp.float32).at[idx].add(
        valid.astype(jnp.float32))


@dataclasses.dataclass(frozen=True)
class HistogramObserver:
    """torch.ao ``HistogramObserver`` equivalent (per-tensor only)."""

    bins: int = 2048
    upsample_rate: int = 16

    # Histogram maintenance is a scatter per step and the qparams search is a
    # while_loop: the traced QAT path gates the whole update behind lax.cond
    # so post-window steps pay nothing (same policy as MSEObserver).
    expensive_update = True

    def init(self, num_channels: int = 1) -> HistogramObserverState:
        if num_channels != 1:
            raise ValueError(
                "HistogramObserver is per-tensor only (torch parity: it "
                "rejects per-channel qschemes); got "
                f"num_channels={num_channels}")
        return HistogramObserverState(
            min_val=jnp.zeros((1,), jnp.float32),
            max_val=jnp.zeros((1,), jnp.float32),
            histogram=jnp.zeros((self.bins,), jnp.float32),
            seen=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------ update

    def _upscale(self, hist: jnp.ndarray, omin, omax, nmin, nmax
                 ) -> jnp.ndarray:
        """Remap ``hist`` (over [omin, omax]) onto the bin grid of
        [nmin, nmax] — torch's ``_upscale_histogram``: split every source bin
        into ``upsample_rate`` fine bins, then scatter the fine bins' mass
        into whichever destination bin contains their mid-point."""
        u, bins = self.upsample_rate, self.bins
        fine = jnp.repeat(hist, u) / u
        bin_size = (omax - omin) / (bins * u)
        mid = jnp.linspace(omin, omax, bins * u + 1)[:-1] + 0.5 * bin_size
        boundaries = jnp.linspace(nmin, nmax, bins + 1)
        assign = jnp.searchsorted(boundaries, mid, side="right") - 1
        assign = jnp.clip(assign, 0, bins - 1)
        return jnp.zeros((bins,), jnp.float32).at[assign].add(fine)

    def update(self, state: HistogramObserverState,
               x: jnp.ndarray) -> HistogramObserverState:
        xf = jax.lax.stop_gradient(x).astype(jnp.float32).ravel()
        x_min, x_max = jnp.min(xf), jnp.max(xf)
        omin, omax = state.min_val[0], state.max_val[0]
        first = state.seen == 0
        new_min = jnp.where(first, x_min, jnp.minimum(omin, x_min))
        new_max = jnp.where(first, x_max, jnp.maximum(omax, x_max))

        update_hist = _histc(xf, self.bins, new_min, new_max)
        # The old histogram expressed in the new bin grid.  torch's three
        # eager branches (_combine_histograms) become where-merges:
        same = (new_min == omin) & (new_max == omax)
        old_degenerate = omin == omax
        # degenerate old range: all old mass lives at the single value omin
        deg = _histc(omin.reshape(1), self.bins, new_min, new_max) \
            * jnp.sum(state.histogram)
        remapped = self._upscale(
            state.histogram, omin,
            # guard the upscale grid against a degenerate source range (the
            # `deg` branch is selected in that case anyway)
            jnp.where(old_degenerate, omin + 1.0, omax), new_min, new_max)
        old_in_new = jnp.where(same, state.histogram,
                               jnp.where(old_degenerate, deg, remapped))
        hist = jnp.where(first, update_hist, update_hist + old_in_new)
        return HistogramObserverState(
            min_val=new_min.reshape(1), max_val=new_max.reshape(1),
            histogram=hist, seen=state.seen + 1)

    # ----------------------------------------------------- qparams search

    def _quant_error(self, hist, bin_width, start_bin, end_bin, dst_nbins):
        """L2 error of quantizing the histogram (piecewise-uniform density)
        to ``dst_nbins`` levels over bins [start_bin, end_bin] — torch's
        ``_compute_quantization_error`` / ``_get_norm`` vectorized."""
        bins = self.bins
        dst_w = bin_width * (end_bin - start_bin + 1).astype(jnp.float32) \
            / dst_nbins
        safe_dst = jnp.where(dst_w == 0, 1.0, dst_w)

        src = jnp.arange(bins, dtype=jnp.float32)
        begin = (src - start_bin.astype(jnp.float32)) * bin_width
        end = begin + bin_width
        dst_of_begin = jnp.clip(jnp.floor(begin / safe_dst), 0, dst_nbins - 1)
        dst_of_end = jnp.clip(jnp.floor(end / safe_dst), 0, dst_nbins - 1)
        density = hist / jnp.where(bin_width == 0, 1.0, bin_width)

        def norm(b, e):
            return density * (e * e * e - b * b * b) / 3.0

        begin_center = (dst_of_begin + 0.5) * safe_dst
        total = norm(begin - begin_center, jnp.full((bins,), safe_dst / 2))
        total += (dst_of_end - dst_of_begin - 1) * norm(-safe_dst / 2,
                                                        safe_dst / 2)
        end_center = dst_of_end * safe_dst + safe_dst / 2
        total += norm(-safe_dst / 2, end - end_center)
        return jnp.where(dst_w == 0, 0.0, jnp.sum(total))

    def _search(self, state: HistogramObserverState, dst_nbins: int):
        """torch ``_non_linear_param_search``: shrink [start_bin, end_bin]
        toward the moving quantiles until the quantization error rises."""
        bins = self.bins
        hist = state.histogram
        omin = state.min_val[0]
        bin_width = (state.max_val[0] - omin) / bins
        csum = jnp.cumsum(hist)
        total = csum[-1]
        step = jnp.float32(1e-5)

        def cond(c):
            alpha, beta, _, _, _, done = c
            return (alpha < beta) & ~done

        def body(c):
            alpha, beta, start, end, norm_min, done = c
            next_alpha, next_beta = alpha + step, beta - step
            # first bin ≥ the lower quantile / last bin ≤ the upper quantile
            left = jnp.searchsorted(csum, next_alpha * total, side="left")
            right = jnp.searchsorted(csum, next_beta * total,
                                     side="right") - 1
            left = jnp.clip(left, start, end).astype(jnp.int32)
            right = jnp.clip(right, start, end).astype(jnp.int32)
            move_start = (left - start) > (end - right)
            n_start = jnp.where(move_start, left, start)
            n_end = jnp.where(move_start, end, right)
            alpha = jnp.where(move_start, next_alpha, alpha)
            beta = jnp.where(move_start, beta, next_beta)
            unchanged = (n_start == start) & (n_end == end)
            nrm = self._quant_error(hist, bin_width, n_start, n_end,
                                    dst_nbins)
            worse = ~unchanged & (nrm > norm_min)
            keep = unchanged | worse
            return (alpha, beta,
                    jnp.where(keep, start, n_start),
                    jnp.where(keep, end, n_end),
                    jnp.where(keep, norm_min, nrm),
                    done | worse)

        init = (jnp.float32(0.0), jnp.float32(1.0), jnp.int32(0),
                jnp.int32(bins - 1), jnp.float32(jnp.inf),
                jnp.asarray(False))
        _, _, start, end, _, _ = jax.lax.while_loop(cond, body, init)
        new_min = omin + bin_width * start.astype(jnp.float32)
        new_max = omin + bin_width * (end.astype(jnp.float32) + 1.0)
        return new_min.reshape(1), new_max.reshape(1)

    def calculate_qparams(self, state: HistogramObserverState,
                          spec: QuantSpec) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # torch: dst_nbins = 2**iinfo(dtype).bits — the CARRIER's level count
        # (the full type range even when the quant range is narrowed).
        dst_nbins = int(spec.type_max) - int(spec.type_min) + 1
        new_min, new_max = self._search(state, dst_nbins)
        scale, zp = observer_qparams(new_min, new_max, spec)
        # Uninitialized observer: torch warns and returns (1.0, 0).
        fresh = state.seen == 0
        return (jnp.where(fresh, 1.0, scale),
                jnp.where(fresh, 0.0, zp))
