"""Mid-epoch validation stall: prefetched vs unprefetched eval loaders.

Round-2 VERDICT weak #7: validation/test loaders were never wrapped in
``PrefetchLoader``, so every mid-epoch validation serialized host batch
gather against device compute. The fix (datasets/registry.py) wraps all
three loaders, gated by the reference's ``num_workers`` key. This script
measures the before/after on real hardware: one full `trainer.validate()`
pass over the same synthetic val split with ``num_workers: 0``
(unprefetched — the old behavior) vs ``num_workers: 2`` (the default),
identical jitted eval program (warmed first, so the delta is pure host
pipeline overlap).

    python scripts/exp_val_stall.py [--val_samples 8192] [--batch 256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--val_samples", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--image_size", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from diffusion_model_universal_tpu.datasets import get_dataset
    from diffusion_model_universal_tpu.models import DDPM
    from diffusion_model_universal_tpu.trainers import DDPMTrainer
    from diffusion_model_universal_tpu.utils.cache import \
        enable_compilation_cache

    enable_compilation_cache()
    # 90/10 split => val_samples val images.
    total = args.val_samples * 10

    def build(num_workers: int) -> DDPMTrainer:
        cfg = {
            "model_name": "DDPM",
            "model_config": {"num_timesteps": 1000,
                             "image_size": args.image_size,
                             "in_channels": 3, "model_channels": 128,
                             "remat": False},
            "data": {"dataset": "synthetic", "num_samples": total,
                     "image_size": args.image_size,
                     "num_workers": num_workers},
            "training": {"num_epochs": 1, "batch_size": args.batch,
                         "learning_rate": 2e-4,
                         "scheduler": {"type": "cosine"},
                         "val_interval": 0, "sample_interval": 0,
                         "checkpoint_interval": 0},
            "logging": {"use_wandb": False, "use_tensorboard": False,
                        "log_interval": 10 ** 9},
            "output": {"output_dir": "/tmp/dmu_val_stall"},
        }
        model = DDPM(cfg["model_config"])
        train, val, test = get_dataset(cfg)
        return DDPMTrainer(model, train, val, test, cfg)

    results = {}
    for workers, label in ((0, "unprefetched (num_workers: 0)"),
                           (2, "prefetched   (num_workers: 2)")):
        tr = build(workers)
        tr.validate()  # compile + warm the eval program
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            tr.validate()
            times.append(time.perf_counter() - t0)
        best = min(times)
        results[label] = best
        try:
            n_batches = len(tr.val_loader)
        except TypeError:
            n_batches = -1
        print(f"{label}: {best:.3f} s/pass "
              f"({n_batches} val batches of {args.batch}, "
              f"runs {['%.3f' % t for t in times]})", flush=True)
        tr.cleanup()

    vals = list(results.values())
    if len(vals) == 2 and vals[1] > 0:
        print(f"speedup from eval prefetch: {vals[0] / vals[1]:.3f}x "
              f"({(vals[0] - vals[1]) * 1e3:.0f} ms/validation saved)",
              flush=True)


if __name__ == "__main__":
    main()
