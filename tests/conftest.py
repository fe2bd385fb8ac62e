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
