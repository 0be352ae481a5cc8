"""Test configuration: run everything on a fake 8-device CPU mesh.

This is the fake-backend the reference lacks (SURVEY.md §4) — the same pjit
programs that run on a TPU pod execute on 8 virtual CPU devices, so
data-parallel semantics (gradient psum, batch sharding, metric reduction)
are tested without hardware.
"""

import os

# force CPU even when the session environment points at a TPU backend
# (JAX_PLATFORMS=axon): sharding tests need 8 devices, the chip has 1.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# XLA:CPU collectives rendezvous on this 1-core VM can take >40s to gather
# all 8 participants under load; the default terminate timeout turns that
# into a hard abort(). Give the scheduler room instead.
if "collective_call_terminate" not in flags:
    flags += (" --xla_cpu_collective_timeout_seconds=600"
              " --xla_cpu_collective_call_terminate_timeout_seconds=600")
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

# The session sitecustomize prepends the 'axon' TPU platform to JAX_PLATFORMS
# regardless of the env var, so override via config after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: repeated suite runs skip XLA recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/pdac_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert len(jax.devices()) == 8 and jax.devices()[0].platform == "cpu"


def pytest_collection_modifyitems(config, items):
    """Auto-tier: anything not explicitly slow/fuzz/distributed is `fast`.
    `pytest -m fast` is the <5 min tier CI runs on every push (see
    .github/workflows/ci.yml); the full suite stays the default."""
    import pytest as _pytest

    for item in items:
        if not any(m in item.keywords
                   for m in ("slow", "fuzz", "distributed")):
            item.add_marker(_pytest.mark.fast)
