"""Test configuration.

Tests run on CPU with 8 virtual devices so sharding/multi-chip tests work
without TPU hardware (SURVEY.md §4e), and with x64 enabled so the solver
can be exercised in the reference's double precision.  Framework code
specifies dtypes explicitly, so enabling x64 does not change f32 paths.
"""

import os

# Must happen before the first backend use.  The environment's axon
# sitecustomize force-registers the TPU platform, so overriding the env
# var is not enough — set the config directly.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))
