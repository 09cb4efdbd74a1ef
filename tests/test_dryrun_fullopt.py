"""Full-optimization coverage for the multichip dryrun gate (ADVICE r4).

The gate defaults to ``jax_disable_most_optimizations`` in its CPU
children so it fits the driver's time budget — which means a failure
that only manifests with XLA's full pass pipeline could slip through.
This slow-suite test runs the single-process phase with
``DMU_DRYRUN_FAST_COMPILE=0`` (full optimization; multiprocess phase
off) so the optimized path keeps periodic coverage without burdening
the gate itself.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_single_process_full_optimizations():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "_DMU_DRYRUN_CHILD")}
    env.update({
        "DMU_DRYRUN_FAST_COMPILE": "0",
        "DMU_DRYRUN_MULTIPROCESS": "0",
        "DMU_DRYRUN_DEADLINE": "1800",
    })
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-2000:]
    assert "OK" in out.stdout, out.stdout[-4000:]
