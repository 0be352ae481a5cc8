"""Test configuration: run everything on a fake 8-device CPU mesh.

This is the fake-backend the reference lacks (SURVEY.md §4) — the same pjit
programs that run on a TPU pod execute on 8 virtual CPU devices, so
data-parallel semantics (gradient psum, batch sharding, metric reduction)
are tested without hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
