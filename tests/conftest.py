"""Test configuration: force JAX onto a virtual 8-device CPU backend.

This is the TPU-world "fake backend" for testing data-parallel sharding
without a real slice (multi-chip hardware is unavailable in CI; see
SURVEY.md §4).  Must run before anything imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# f32 everywhere in tests; parity tolerances assume it.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin in this environment ignores the JAX_PLATFORMS env var;
# the config knob does work, so pin CPU explicitly before any backend init.
import jax

jax.config.update("jax_platforms", "cpu")
