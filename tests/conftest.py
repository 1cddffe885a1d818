"""Test configuration: CPU lane (default) and real-TPU lane.

Default lane: force an 8-device virtual CPU mesh
(``--xla_force_host_platform_device_count=8``) so multi-chip sharding tests
need no TPU hardware; @pytest.mark.tpu tests are skipped.

TPU lane (``ZEGGS_TPU_TESTS=1 pytest -m tpu``): keeps the real TPU backend
and runs ONLY @pytest.mark.tpu tests — the compiled Pallas/Mosaic paths
(fused bf16 + int8 rollouts, mel kernel) execute on the chip instead of in
interpret mode, so a jax/mosaic regression can't hide behind CPU interpret
(VERDICT r2 item 6). Run one TPU process at a time (the tunnel serializes).

Note: this environment's TPU plugin (axon) force-sets
``jax_platforms="axon,..."`` from sitecustomize, overriding the
JAX_PLATFORMS env var, so we must update the jax config *after* import
(before any backend is initialized) to actually land on CPU.
"""

import os

import pytest

RUN_TPU = os.environ.get("ZEGGS_TPU_TESTS") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not RUN_TPU and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if RUN_TPU:
    jax.config.update("jax_compilation_cache_dir", "/tmp/zeggs_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
else:
    jax.config.update("jax_platforms", "cpu")
    # persistent CPU compile cache: the suite re-compiles the same small
    # programs across many modules; on the single-core CI box this is a
    # large fraction of the 28-minute wall time
    jax.config.update("jax_compilation_cache_dir", "/tmp/zeggs_jax_cpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_collection_modifyitems(config, items):
    if RUN_TPU:
        skip = pytest.mark.skip(reason="TPU lane runs only @pytest.mark.tpu tests")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(reason="needs a real TPU (ZEGGS_TPU_TESTS=1 pytest -m tpu)")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)
