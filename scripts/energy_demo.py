"""Energy-based sample-quality demo on real hardware.

Trains EnergyBasedDiffusion through the REAL trainer on the synthetic
blob set and samples a grid. Two recipes:

* ``--objective dsm`` (default): energy-parameterized denoising score
  matching — −∇ₓE(x,t) is trained as the score (ε̂ = √(1−ᾱ)·∇ₓE), and
  sampling runs the DDPM ancestral chain on the energy gradient. This
  is the principled route to sample quality for a scalar-energy model
  (Salimans & Ho 2021, arXiv:2101.03288 §3): the reference's CD+GP
  objective (`/root/reference/models/energy_based.py:179-211` +
  `utils/losses.py:264-287`) presses E toward 1-Lipschitz, so its
  energies cannot express the ~1/σ score magnitudes sampling needs at
  small noise levels and its Langevin grids stay noisy.
* ``--objective cd``: the reference recipe, kept for an honest
  comparison (expected: structure buried in residual noise).

Writes <out>/samples_ema.png (8×8 grid from EMA params) + a JSON
summary; the grid must show the dataset's blob/gradient structure.

    python scripts/energy_demo.py [--epochs 125] [--out /tmp/dmu_energy_demo]
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
    ap.add_argument("--epochs", type=int, default=125)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--samples", type=int, default=8192)
    ap.add_argument("--timesteps", type=int, default=300)
    ap.add_argument("--objective", choices=["dsm", "cd"], default="dsm")
    ap.add_argument("--fid_samples", type=int, default=1024,
                    help="extractor-FID sample count (0 disables); uses "
                         "the SAME extractor seed + real draw as "
                         "score_demo.py, so the numbers are comparable "
                         "across the score/energy/DDPM family table")
    ap.add_argument("--out", type=str, default="/tmp/dmu_energy_demo")
    args = ap.parse_args()

    from diffusion_model_universal_tpu.utils.cache import \
        enable_compilation_cache
    enable_compilation_cache()
    import jax
    import numpy as np

    from diffusion_model_universal_tpu.datasets import get_dataset
    from diffusion_model_universal_tpu.models import EnergyBasedDiffusion
    from diffusion_model_universal_tpu.trainers import EnergyBasedTrainer
    from diffusion_model_universal_tpu.utils.images import save_image

    model_cfg = {
        "image_size": 32, "in_channels": 3,
        "model_channels": args.channels,
        # T=300 with beta_end scaled so ᾱ_T ≈ 0 (full noise destruction
        # at the last level despite the shorter chain).
        "num_timesteps": args.timesteps,
        "beta_start": 1e-4, "beta_end": 0.02 * (1000 / args.timesteps),
        "training_objective": args.objective,
        "langevin_steps": 10, "langevin_step_size": 0.01,
    }
    cfg = {
        "model_name": "ENERGY-DEMO",
        "model_config": model_cfg,
        "training": {"num_epochs": args.epochs, "batch_size": args.batch,
                     "learning_rate": 1e-4, "ema_decay": 0.999,
                     "scheduler": {"type": "constant"}, "scan_steps": 8,
                     "val_interval": 0, "sample_interval": 0,
                     "checkpoint_interval": 0},
        "data": {"dataset": "synthetic", "data_dir": "unused",
                 "num_samples": args.samples},
        "logging": {"use_wandb": False, "use_tensorboard": False,
                    "log_interval": 1000000},
        "output": {"output_dir": args.out},
    }

    train, val, test = get_dataset(cfg)
    model = EnergyBasedDiffusion(model_cfg)
    trainer = EnergyBasedTrainer(model, train, val, test, cfg)

    t0 = time.time()
    first = last = None
    for epoch in range(args.epochs):
        hist = trainer.train(1)
        loss = hist.get("train_loss", float("nan"))
        first = loss if first is None else first
        last = loss
        if epoch % 10 == 0 or epoch == args.epochs - 1:
            print(f"epoch {epoch:4d}  {args.objective} loss {loss:.4f}  "
                  f"({time.time() - t0:.0f}s)", flush=True)
    train_s = time.time() - t0

    t1 = time.time()
    grid = np.asarray(model.generate_samples(
        trainer.state.ema_params, jax.random.PRNGKey(123), 64))
    sample_s = time.time() - t1
    os.makedirs(args.out, exist_ok=True)
    path = save_image(grid, os.path.join(args.out, "samples_ema.png"),
                      nrow=8)

    # Same structure check as score_demo: blob images are smooth; raw
    # Langevin noise is not.
    from diffusion_model_universal_tpu.datasets.sources import make_synthetic
    probe = make_synthetic(num_samples=64, image_size=32)
    data = probe.astype(np.float32) / 127.5 - 1.0

    def smoothness(x):
        gx = np.abs(np.diff(x, axis=2)).mean()
        gy = np.abs(np.diff(x, axis=1)).mean()
        return float(gx + gy)

    # -- extractor-FID on the shared protocol (VERDICT r3 #5) -------------
    # Extractor seed 0, real draw seed 7, key seed 1000: identical to
    # score_demo.py, so this number lands in the same comparison table as
    # the score FID and the equal-budget DDPM FID (ordering-only — the
    # seeded random-feature extractor is not literature-comparable).
    fid_energy = None
    if args.fid_samples:
        from diffusion_model_universal_tpu.utils.benchmarks import (
            FeatureExtractor, extractor_features, sampler_extractor_fid)

        extractor = FeatureExtractor(seed=0)
        real = make_synthetic(num_samples=args.fid_samples, image_size=32,
                              seed=7).astype(np.float32) / 127.5 - 1.0
        real_f = extractor_features(real, extractor)
        t2 = time.time()
        fid_energy = sampler_extractor_fid(
            model.generate_samples, trainer.state.ema_params,
            args.fid_samples, real_f, extractor)
        print(f"energy({args.objective}) FID(random-feat, "
              f"{args.fid_samples}) = {fid_energy:.4f}  "
              f"({time.time() - t2:.0f}s sampling)", flush=True)

    summary = {
        "objective": args.objective,
        "timesteps": args.timesteps,
        "first_epoch_loss": round(float(first), 4),
        "final_epoch_loss": round(float(last), 4),
        "train_seconds": round(train_s, 1),
        "sample_seconds": round(sample_s, 1),
        "data_smoothness": round(smoothness(data), 4),
        "sample_smoothness": round(smoothness(np.clip(grid, -1, 1)), 4),
        "fid_random_feat": (round(fid_energy, 4)
                            if fid_energy is not None else None),
        "fid_samples": args.fid_samples,
        "grid": path,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary), flush=True)
    trainer.cleanup()


if __name__ == "__main__":
    main()
