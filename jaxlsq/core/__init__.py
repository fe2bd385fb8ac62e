from .spec import QuantSpec, int_dtype_range, DTYPE_RANGES
from .golden import (
    golden_forward,
    golden_backward,
    effective_grad_scale,
    clamp_scale,
    broadcast_qparams,
)

__all__ = [
    "QuantSpec",
    "int_dtype_range",
    "DTYPE_RANGES",
    "golden_forward",
    "golden_backward",
    "effective_grad_scale",
    "clamp_scale",
    "broadcast_qparams",
]
