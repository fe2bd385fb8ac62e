"""jaxlsq — a TPU-native LSQ/LSQ+ quantized-training (QAT) + serving framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of the reference
PyTorch extension ``DeadAt0m/LSQFakeQuantize-PyTorch`` (Learned Step Size
Quantization, arXiv:1902.08153 / arXiv:2004.09576), redesigned TPU-first:

* ``jaxlsq.core``      — static QuantSpec + the golden jnp math (the contract).
* ``jaxlsq.ops``       — ``fake_quant`` functional API (jax.custom_vjp) backed by
                         fused Pallas TPU kernels, plus the reference-compatible
                         ``lsq(...)`` signature.
* ``jaxlsq.observers`` — LSQFakeQuantizer state machine + MinMax observers,
                         functional (jit-compatible) state.
* ``jaxlsq.models``    — flax QAT layers (QDense/QConv), qconfig mapping, model zoo.
* ``jaxlsq.parallel``  — device-mesh / data-parallel QAT utilities.
* ``jaxlsq.serve``     — freeze to INT8/INT4, weight-only matmul with fused
                         dequant epilogue.
"""

__version__ = "0.1.0"

from .core.spec import QuantSpec
from .ops.functional import fake_quant, fake_quant_traced, lsq

# Subpackages (imported lazily where heavy): jaxlsq.observers, jaxlsq.models,
# jaxlsq.parallel, jaxlsq.serve, jaxlsq.utils, jaxlsq.native.

__all__ = ["QuantSpec", "fake_quant", "fake_quant_traced", "lsq", "__version__"]
