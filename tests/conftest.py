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
