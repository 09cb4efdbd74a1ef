"""Convergence demo: train DDPM on the synthetic dataset on real hardware.

Runs the REAL training loop (DiffusionTrainer.train — scan dispatch,
EMA, logging, checkpointing) on the procedural blob dataset, then samples
a grid from the trained weights. Writes:

    <out>/metrics.jsonl       per-step losses (the trainer's own sink)
    <out>/loss_curve.txt      step → epoch-mean loss table
    <out>/samples_final.png   8×8 grid sampled with the trained EMA params

    python scripts/train_demo.py [--epochs 40] [--out /tmp/dmu_demo]

This is the "does the framework actually train" evidence: loss must fall
well below the σ≈1 noise-prediction floor of an untrained net, and the
samples must show the dataset's blob/gradient structure.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", type=str, default="ddpm",
                    choices=["ddpm", "ddim", "score_based", "energy_based"])
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--samples", type=int, default=8192)
    ap.add_argument("--skip_sampling", action="store_true")
    ap.add_argument("--out", type=str, default="/tmp/dmu_demo")
    args = ap.parse_args()

    from diffusion_model_universal_tpu.utils.cache import \
        enable_compilation_cache
    enable_compilation_cache()
    import jax
    import numpy as np

    from diffusion_model_universal_tpu.datasets import get_dataset
    from diffusion_model_universal_tpu.models import MODEL_REGISTRY
    from diffusion_model_universal_tpu.trainers import TRAINER_REGISTRY
    from diffusion_model_universal_tpu.utils.images import save_image

    model_cfg = {
        "num_timesteps": 1000, "image_size": 32, "in_channels": 3,
        "model_channels": args.channels, "remat": False,
        "loss_config": {"use_time_weighting": False},
    }
    if args.model == "score_based":
        # Fewer scales keep the (un-tuned) Langevin sampler demo tractable.
        model_cfg.update(num_scales=200, langevin_steps=5, sigma_max=10.0)
    if args.model == "energy_based":
        model_cfg.update(num_timesteps=100, langevin_steps=5)
    cfg = {
        "model_name": f"{args.model}-demo",
        "model_config": model_cfg,
        "training": {
            "num_epochs": args.epochs, "batch_size": args.batch,
            "learning_rate": 2e-4, "scan_steps": 8,
            "scheduler": {"type": "cosine", "min_lr": 1e-5},
            "ema_decay": 0.999, "val_interval": 0,
            "sample_interval": 0, "checkpoint_interval": 0,
        },
        "data": {"dataset": "synthetic", "data_dir": "unused",
                 "num_samples": args.samples},
        "logging": {"use_wandb": False, "use_tensorboard": False,
                    "log_interval": 1000000},
        "output": {"output_dir": args.out},
    }
    train, val, test = get_dataset(cfg)
    model = MODEL_REGISTRY[args.model](cfg["model_config"])
    trainer = TRAINER_REGISTRY[args.model](model, train, val, test, cfg)

    t0 = time.perf_counter()
    curve = []
    for epoch in range(args.epochs):
        hist = trainer.train(1)
        curve.append((int(trainer.state.step), hist["train_loss"]))
        if epoch % 5 == 0 or epoch == args.epochs - 1:
            print(f"epoch {epoch:3d} step {curve[-1][0]:5d} "
                  f"loss {curve[-1][1]:.4f}", flush=True)
    dt = time.perf_counter() - t0

    with open(os.path.join(args.out, "loss_curve.txt"), "w") as f:
        f.write("step\tepoch_mean_loss\n")
        for s, l in curve:
            f.write(f"{s}\t{l:.5f}\n")

    # Sample a grid from the trained EMA weights.
    grid_path = None
    if not args.skip_sampling:
        samples = model.generate_samples(trainer.state.ema_params,
                                         jax.random.PRNGKey(123), 64)
        grid_path = os.path.join(args.out, "samples_final.png")
        save_image(np.asarray(samples), grid_path)

    first, last = curve[0][1], curve[-1][1]
    print(json.dumps({
        "steps": curve[-1][0], "wall_seconds": round(dt, 1),
        "first_epoch_loss": round(first, 4),
        "final_epoch_loss": round(last, 4),
        "loss_reduction": round(first / max(last, 1e-9), 2),
        "samples": grid_path,
    }))
    trainer.cleanup()


if __name__ == "__main__":
    main()
