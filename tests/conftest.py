"""Test configuration: force an 8-device virtual CPU platform so multi-chip
sharding tests run anywhere (the TPU-native analogue of a fake distributed
backend — see SURVEY.md §4). TPU-hardware tests live behind the
``requires_tpu`` marker and are run explicitly."""

import os

# Must be set before jax is imported anywhere in the test process.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# deterministic fp32 matmuls on CPU for numerical parity tests
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

# XLA-CPU compiles are slow on this box; cache executables across test runs.
import jax  # noqa: E402

# jax may already be imported by a pytest plugin, so set configs directly
# (the env var above is a fallback for fresh processes).
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/fit_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
