"""Test configuration: force an 8-device virtual CPU platform so multi-chip
sharding tests run anywhere (the TPU-native analogue of a fake distributed
backend — see SURVEY.md §4).

Note: this environment's sitecustomize registers an 'axon' TPU plugin and
force-sets ``jax_platforms="axon,cpu"`` at interpreter startup, so the env
var alone is not enough — we override the config directly before any backend
initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# deterministic fp32 matmuls for numerical parity tests
jax.config.update("jax_default_matmul_precision", "highest")
# XLA-CPU compiles are slow on this box; cache executables across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/fit_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.device_count() >= 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}"
)
