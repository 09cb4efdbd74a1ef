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
