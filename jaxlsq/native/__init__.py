"""jaxlsq.native — host C++ reference library (second oracle + offline tools).

Compiled on demand from ``lsq_ref.cpp`` with the system toolchain and loaded
via ctypes (no pybind11 in this environment — SURVEY.md environment notes).
The JAX/Pallas path never depends on this; it exists so the framework's
numeric contract (SURVEY.md §0) is pinned by TWO independent implementations,
and as a zero-dependency host tool for offline weight packing.
"""

from .build import is_available, load_library
from .ops import native_backward, native_forward, native_quantize_i8

__all__ = ["is_available", "load_library", "native_forward",
           "native_backward", "native_quantize_i8"]
