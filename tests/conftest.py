"""Test configuration: force an 8-device CPU mesh before JAX initializes.

This is the idiomatic "multi-node without a cluster" substitute for the
distributed tests the reference lacks (SURVEY.md §4): every test sees 8
virtual CPU devices, so sharding/pjit paths are exercised exactly as they
would be on an 8-chip TPU slice.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The environment may pre-import jax with a TPU plugin (sitecustomize);
# override the platform via the config API too, which wins as long as no
# computation has run yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

# Make the repo root importable regardless of pytest rootdir.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
