"""Quantization specification: the static configuration of an LSQ/LSQ+ fake-quantizer.

This is the TPU-native equivalent of the scattered static arguments of the reference's
``torchlsq::lsq`` op schema (reference: torchlsq/csrc/ops/lsq.cpp:137-146) and the
dtype/qscheme bookkeeping inside ``LSQFakeQuantizer.__init__`` / ``_verify_qmin_qmax``
(reference: torchlsq/quantized/modules/observers.py:164-242).  Everything here is a
hashable, frozen dataclass so it can be closed over by ``jax.jit`` traces as static
metadata — under XLA there is no runtime dispatcher, so "configuration" must be
trace-time constant.

Key semantics carried over from the reference (see SURVEY.md §0):

* ``quant_min``/``quant_max`` — the *quantization range* actually used for clamping.
* ``type_min``/``type_max`` — the numeric limits of the carrier integer type.  These
  may be wider than the quant range (e.g. a 7-bit range carried in int8 to avoid
  overflow in integer kernels; reference: torchlsq/functional.py:69-71 and the
  ``avoid_torch_overflow``/``reduce_range`` logic at observers.py:225-242).
* symmetric vs affine — symmetric forces the shift gradient to zero
  (reference: lsq_kernel.h:85,118) and overrides the initial shift
  (observers.py:238-241).
* per-tensor vs per-channel with a channel axis (default 0 for weights, 1 for
  activations; observers.py:196-198).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

__all__ = [
    "QuantSpec",
    "int_dtype_range",
    "DTYPE_RANGES",
]

# Carrier integer type limits, analogous to the reference's TYPES_RANGE_MAPPING
# (observers.py:14-17) but extended beyond torch's qint8/quint8 pair since JAX
# serving kernels can carry int4 natively.
DTYPE_RANGES = {
    "int8": (-128, 127),
    "uint8": (0, 255),
    "int4": (-8, 7),
    "uint4": (0, 15),
}


def int_dtype_range(bits: int, signed: bool) -> Tuple[int, int]:
    """Numeric limits of a ``bits``-wide (un)signed integer."""
    if signed:
        return -(2 ** (bits - 1)), 2 ** (bits - 1) - 1
    return 0, 2**bits - 1


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    """Static description of one fake-quantizer.

    Attributes:
      quant_min / quant_max: clamping range of the quantized value.
      type_min / type_max: numeric limits of the carrier int type (>= quant range).
      symmetric: if True the shift is frozen (dB == 0) — reference's
        ``is_affine=False`` path.
      per_channel: per-channel (one scale/shift per index along ``axis``) vs
        per-tensor (scalar scale/shift).
      axis: channel axis for per-channel mode.
      use_grad_scaling: apply the LSQ paper's 1/sqrt(N * quant_max) gradient scale
        (reference: lsq_cpu.cpp:103-104).
      grad_scaler: extra user gradient multiplier (composes with the above).
    """

    quant_min: int = 0
    quant_max: int = 255
    type_min: Optional[int] = None
    type_max: Optional[int] = None
    symmetric: bool = False
    per_channel: bool = False
    axis: int = 1
    use_grad_scaling: bool = True
    grad_scaler: float = 1.0

    def __post_init__(self):
        if self.quant_min >= self.quant_max:
            raise ValueError(
                f"quant_min ({self.quant_min}) must be < quant_max ({self.quant_max})"
            )
        if self.symmetric and not (self.quant_min <= 0 <= self.quant_max):
            # reference: torchlsq/functional.py:90-91
            raise ValueError(
                "quantization range must cover 0 in symmetric quantization"
            )
        # Default the carrier-type limits to the quant range, like
        # torchlsq/functional.py:92-93.
        if self.type_min is None:
            object.__setattr__(self, "type_min", self.quant_min)
        if self.type_max is None:
            object.__setattr__(self, "type_max", self.quant_max)
        if self.type_min > self.quant_min or self.type_max < self.quant_max:
            raise ValueError(
                "carrier type range must contain the quantization range: "
                f"[{self.type_min},{self.type_max}] vs [{self.quant_min},{self.quant_max}]"
            )

    # ------------------------------------------------------------------ helpers

    @property
    def n_levels(self) -> int:
        return self.quant_max - self.quant_min + 1

    @property
    def bitness(self) -> int:
        """Effective bit width of the quant range (ceil(log2(levels)))."""
        return max(1, math.ceil(math.log2(self.n_levels)))

    def replace(self, **kw) -> "QuantSpec":
        return dataclasses.replace(self, **kw)

    # ------------------------------------------------------------- constructors

    @classmethod
    def make(
        cls,
        bits: int = 8,
        *,
        signed: bool = False,
        symmetric: bool = False,
        per_channel: bool = False,
        axis: int = 1,
        narrow_to_bits: Optional[int] = None,
        use_grad_scaling: bool = True,
        grad_scaler: float = 1.0,
    ) -> "QuantSpec":
        """Build a spec from a bit width.

        ``narrow_to_bits`` reproduces the reference's ``avoid_torch_overflow`` /
        ``reduce_range`` behavior (observers.py:225-242): the quant range is
        narrowed to ``narrow_to_bits`` (e.g. 7-bit inside an 8-bit carrier) while
        ``type_min/max`` keep the full carrier range.
        """
        tmin, tmax = int_dtype_range(bits, signed)
        if narrow_to_bits is None:
            qmin, qmax = tmin, tmax
        else:
            if narrow_to_bits > bits:
                raise ValueError("narrow_to_bits must be <= bits")
            # Mirrors observers.py:234-237: range [0, 2^nb - 1], shifted down by
            # 2^(nb-1) for signed types.  (For narrow_to_bits == bits - 1 this is
            # exactly torch's reduce_range.)
            qmin, qmax = 0, 2**narrow_to_bits - 1
            if signed:
                half = 2 ** (narrow_to_bits - 1)
                qmin, qmax = qmin - half, qmax - half
        return cls(
            quant_min=qmin,
            quant_max=qmax,
            type_min=tmin,
            type_max=tmax,
            symmetric=symmetric,
            per_channel=per_channel,
            axis=axis,
            use_grad_scaling=use_grad_scaling,
            grad_scaler=grad_scaler,
        )

    @classmethod
    def weight_default(cls, bits: int = 8, *, per_channel: bool = False, axis: int = 0,
                       reduce_range: bool = True) -> "QuantSpec":
        """qint8-style weight spec: signed symmetric, 7-bit narrowed by default
        (reference: observers.py:219-221,234-237 with avoid_torch_overflow=True)."""
        return cls.make(
            bits,
            signed=True,
            symmetric=True,
            per_channel=per_channel,
            axis=axis,
            narrow_to_bits=bits - 1 if reduce_range else None,
        )

    @classmethod
    def activation_default(cls, bits: int = 8, *, per_channel: bool = False, axis: int = 1,
                           symmetric: bool = False, reduce_range: bool = True) -> "QuantSpec":
        """quint8-style activation spec: unsigned affine, 7-bit narrowed by default
        (reference: observers.py:223,234-237)."""
        return cls.make(
            bits,
            signed=False,
            symmetric=symmetric,
            per_channel=per_channel,
            axis=axis,
            narrow_to_bits=bits - 1 if reduce_range else None,
        )

    def symmetric_init_shift(self, init_scale: float) -> float:
        """The reference's symmetric-mode initial-shift override
        (observers.py:238-241): ``-(|qmin+qmax| // 2) * sign(qmin+qmax) * init_scale``.

        For a balanced signed range this is ~0; for an unsigned "symmetric" range
        it centres the zero-point in the middle of the range.
        """
        ssum = self.quant_min + self.quant_max
        sign = math.copysign(1.0, ssum)
        return -float(abs(ssum) // 2) * sign * init_scale
