"""Test configuration: run everything on a virtual 8-device CPU mesh.

Pallas kernels run in interpret mode on CPU (exercised explicitly in tests);
sharding/collective tests fake an 8-device mesh per SURVEY.md §4
("Distributed tests without a cluster").

Note: this environment preloads a TPU backend via sitecustomize before pytest
starts, so we cannot rely on env vars alone — jax is already imported (but not
yet initialized) by the time this file runs.  ``jax.config.update`` still works
at this point, as does appending XLA_FLAGS before first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


import pytest  # noqa: E402

# -m smoke: fast foundational subset (VERDICT r3 next-#9) — numeric contract
# (golden), functional API, observer state machine, end-to-end QAT, serving
# convert/matmul, and one engine-exactness test.  ~5 min on this machine vs
# ~45 min for the full suite; run per-change, full suite per-milestone.
_SMOKE_MODULES = {
    "test_golden", "test_functional", "test_observer", "test_qat_e2e",
    "test_serve",
}
_SMOKE_NODES = (
    "test_decode.py::TestDecodeEngine::test_staggered_requests_match_lockstep",
    # quantize_model is the advertised third-party entry point (VERDICT r4
    # next-#8): one init/train parity case + the convert/serve case.
    "test_quantize_model.py::TestBitParity::test_qat_train_steps_identical",
    "test_quantize_model.py::TestBitParity::test_convert_and_serving_identical",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = getattr(item.module, "__name__", "")
        if name in _SMOKE_MODULES or any(n in item.nodeid
                                         for n in _SMOKE_NODES):
            item.add_marker(pytest.mark.smoke)
