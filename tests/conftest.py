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

# Persistent compilation cache: identical jitted programs (e.g. the many
# tiny-trainer train steps across test modules) compile ONCE per machine
# rather than once per trainer construction — the dominant suite cost.
# Machine-local /tmp dir so stale cross-host CPU AOT entries can't SIGILL.
_cache_dir = os.environ.get("DMU_TEST_COMPILE_CACHE",
                            "/tmp/dmu_test_compile_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Make the repo root importable regardless of pytest rootdir.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
