"""TRUE multi-process distributed execution (VERDICT r1 #2).

Spawns two real OS processes that `jax.distributed.initialize` on CPU
(4 virtual devices each → the same 8-device global topology the rest of
the suite virtualizes in one process) and run the REAL trainer over the
global mesh — executing every `jax.process_count() > 1` branch that is
dead code under a single process, including the Orbax coordinated save
barrier the reference crosses with `mp.spawn`
(`/root/reference/scripts/train.py:222-235`).

Parity oracle: a single-process trainer in THIS process, fed the exact
global batches the two workers' loader shards assemble to, must produce
the same losses.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "multiprocess_worker.py"),
             str(pid), f"127.0.0.1:{port}", str(tmp_path)],
            cwd=str(REPO), env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = {}
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert line, f"no RESULT line:\n{out[-4000:]}"
        r = json.loads(line[-1][len("RESULT "):])
        results[r["pid"]] = r
    return results


@pytest.mark.slow
def test_two_process_distributed_training(tmp_path):
    results = _run_workers(tmp_path)
    r0, r1 = results[0], results[1]

    # Replicated scalars must agree bit-for-bit across processes.
    assert r0["losses"] == r1["losses"]
    assert r0["scan_losses"] == r1["scan_losses"]
    assert r0["val_loss"] == r1["val_loss"]
    assert r0["ragged_loss"] == r1["ragged_loss"]
    assert r0["resumed_loss"] == r1["resumed_loss"]
    assert r0["step"] == 4  # 2 singles + one 2-step scan chunk
    for key in ("losses", "scan_losses"):
        assert all(np.isfinite(v) for v in r0[key])
    assert np.isfinite(r0["ragged_loss"])  # pad+mask path under 2 procs

    # ---- single-process parity on the identical global batches ---------
    from diffusion_model_universal_tpu.datasets import (DeviceDataLoader,
                                                        make_augment_fn)
    from diffusion_model_universal_tpu.datasets.sources import make_synthetic
    from diffusion_model_universal_tpu.models import DDPM
    from diffusion_model_universal_tpu.parallel import mesh as M
    from diffusion_model_universal_tpu.trainers import DDPMTrainer

    imgs = make_synthetic(num_samples=64, image_size=32)
    # Worker loaders shard contiguously (rank 0 → imgs[0:32], rank 1 →
    # imgs[32:64]); the assembled GLOBAL batch i is
    # concat(imgs[8i:8i+8], imgs[32+8i:32+8i+8]). Reorder so a plain
    # world_size=1 loader with batch 16 reproduces those batches exactly.
    reordered = np.concatenate(
        [np.concatenate([imgs[8 * i:8 * i + 8],
                         imgs[32 + 8 * i:32 + 8 * i + 8]])
         for i in range(4)])
    aug = make_augment_fn([{"name": "normalize"}], [0.5] * 3, [0.5] * 3,
                          train=False)
    loader = DeviceDataLoader(reordered, batch_size=16, augment=aug,
                              shuffle=False, drop_last=False)
    cfg = {
        "model_name": "DDPM",
        "training": {"num_epochs": 1, "batch_size": 16,
                     "learning_rate": 1e-3, "ema_decay": 0.99,
                     "scheduler": {"type": "constant"}, "scan_steps": 2,
                     "val_interval": 0, "sample_interval": 0,
                     "checkpoint_interval": 0},
        "logging": {"use_wandb": False, "use_tensorboard": False},
        "output": {"output_dir": str(tmp_path / "sp_out")},
    }
    model_cfg = {"num_timesteps": 8, "image_size": 32, "in_channels": 3,
                 "model_channels": 8, "compute_dtype": "float32",
                 "use_pallas": False, "remat": False,
                 "loss_config": {"use_time_weighting": False}}
    tr = DDPMTrainer(DDPM(model_cfg), loader, loader, loader, cfg,
                     mesh=M.make_mesh())
    try:
        it = iter(tr.train_loader)
        sp_losses = [float(tr.step(next(it), tr._step_key(i))["loss"])
                     for i in range(2)]
        state, scan_losses = tr._scan_chunk(tr.state, [next(it), next(it)],
                                            2)
        tr.state = state
        sp_scan = [float(x) for x in np.asarray(scan_losses)]
        sp_val = float(tr.validate())
    finally:
        tr.cleanup()

    np.testing.assert_allclose(r0["losses"], sp_losses, rtol=1e-5)
    np.testing.assert_allclose(r0["scan_losses"], sp_scan, rtol=1e-5)
    np.testing.assert_allclose(r0["val_loss"], sp_val, rtol=1e-5)
