"""bench.py device-init watchdog: behind the tunneled TPU runtime,
jax.devices() can hang indefinitely on an unhealthy tunnel (observed:
a multi-hour outage); the bench must fail loudly instead of hanging."""

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_init_devices_happy_path():
    import bench

    devices = bench.init_devices_or_die(timeout_s=600)
    assert len(devices) >= 1


def test_init_devices_timeout_exits_with_failure_json():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    code = ("import jax; jax.config.update('jax_platforms', 'cpu');"
            "import bench; bench.init_devices_or_die(timeout_s=0)")
    proc = subprocess.run([sys.executable, "-c", code], cwd=ROOT, env=env,
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 1, proc.stderr
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    assert "BENCH FAILED" in line["metric"]
    assert line["vs_baseline"] == 0.0


def test_time_sampler_warm_window_untimed():
    """The r5 sampler-timing plan (VERDICT r4 #2): one probe call, then
    `warm_windows` UNTIMED windows, then `windows` timed ones — the
    timed statistics must exclude the warm calls (which carry host
    warm-up), and the per-window means must ship for audit."""
    import bench
    import jax.numpy as jnp

    calls = {"n": 0}

    def fake(key):
        calls["n"] += 1
        return jnp.zeros((2,))

    means = []
    med, reps, spread = bench.time_sampler(
        fake, jnp.zeros((2,), jnp.uint32), target_window_s=0.0,
        windows=3, max_calls_per_window=4, warm_windows=1,
        window_means=means)
    # target 0 → k=1 call/window; probe(1) + warm(1) + timed(3).
    assert calls["n"] == 5
    assert reps == 3          # timed calls only
    assert len(means) == 3    # one mean per TIMED window
    assert med >= 0 and spread >= 0
