"""jaxlsq.native — host C++ components (oracle, offline tools, IO runtime).

Compiled on demand with the system toolchain and loaded via ctypes (no
pybind11 in this environment — SURVEY.md environment notes):

* ``lsq_ref.cpp`` — independent reference implementation of the numeric
  contract (SURVEY.md §0); the JAX/Pallas path never depends on it.
* ``loader.cpp`` — multi-threaded prefetching shard loader
  (``NativeShardLoader``): the native IO half of the training runtime
  (memory-mapped .npy shards → shuffled batch ring, deterministic per seed).
"""

from .build import is_available, load_library
from .loader import NativeShardLoader
from .ops import native_backward, native_forward, native_quantize_i8

__all__ = ["is_available", "load_library", "native_forward",
           "native_backward", "native_quantize_i8", "NativeShardLoader"]
