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

# NO persistent compilation cache for the CPU suite. It used to be
# enabled (it accelerates REPEAT suite runs), but on this host the
# XLA:CPU executable-serialization path segfaults: four full-suite runs
# died inside jax's put_executable_and_time at the same suite position
# on TWO different programs (round-4 investigation), alongside
# "machine feature mismatch ... could lead to SIGILL" AOT warnings —
# the serializer targets CPU features (AMX/AVX-512 variants) this VM's
# host doesn't execute. The in-process jit cache still dedupes
# identical programs within a run; a cold suite pays the same compiles
# either way. Opt back in with DMU_TEST_COMPILE_CACHE=<dir> on hosts
# where the write path is healthy.
_cache_dir = os.environ.get("DMU_TEST_COMPILE_CACHE")
if _cache_dir:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
else:
    # jax enables a DEFAULT on-disk cache (~/.cache/jax/jaxcache) even
    # with no dir configured — merely not setting a dir does NOT avoid
    # the crashing write path; turn it off explicitly.
    jax.config.update("jax_enable_compilation_cache", False)

# Make the repo root importable regardless of pytest rootdir.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_executable_mappings():
    """Clear jax's global executable caches after every test module.

    Root cause of the round-4 full-suite segfaults (reproduced 5×, all
    ~3 h in at the same position, inside XLA:CPU compilation): jax's
    pjit cache keeps EVERY compiled executable alive for the process
    lifetime, each holding multiple memory mappings (× 8 virtual
    devices). The suite's hundreds of programs leak ~1.5-2 k mappings
    per minute (measured via /proc/<pid>/maps) until the kernel's
    vm.max_map_count (default 65 530) is hit, at which point LLVM's JIT
    mmap fails and the process segfaults instead of erroring. Dropping
    the caches at module boundaries frees the executables (programs are
    rarely shared across modules, so the recompile cost is minimal) and
    keeps the mapping count bounded for arbitrarily large suites.
    """
    yield
    jax.clear_caches()
    import gc

    gc.collect()
