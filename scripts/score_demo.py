"""Score-based (NCSN) sample-quality demo on real hardware (VERDICT r1 #6).

Trains ScoreBasedDiffusion through the REAL trainer on the synthetic blob
set with the Song & Ermon prescriptions the reference declares but never
tunes (`/root/reference/models/score_based.py:209-247`):

* σ_max from the DATA DIAMETER (Technique 1, arXiv:2006.09011): the max
  pairwise L2 distance over a data sample, measured at startup;
* λ(σ)=σ² DSM weighting (`dsm_weighting: sigma2`) so every noise level
  trains at unit target scale — the unweighted reference objective is
  dominated by σ_min levels by (σ_max/σ_min)² and never learns the
  coarse structure the annealed sampler needs first;
* s_θ(x,σ) = f_θ(x,σ)/σ output parameterization
  (`score_parameterization: sigma`, NCSNv2 Technique 3): with the raw
  parameterization the net must span |score|~1/σ over 3-4 decades and
  underpredicts at small σ, so Langevin stalls with residual noise
  (measured: sample mean-|∇| 0.95 vs data 0.06 on this exact recipe);
* Langevin temperature β chosen so the step size matches the canonical
  α_i = ε·σ_i²/σ_L² schedule (the reference parameterizes step =
  2(σβ)², i.e. ε = 4β²σ_L²; β=0.2 ⇒ ε≈1.6e-5 at σ_L=0.01);
* a final Tweedie denoise (`final_denoise: true`, Technique 5).

Writes <out>/samples_ema.png (8×8 grid from EMA params) + a JSON summary;
the grid must show the dataset's blob/gradient structure. With
``--fid_samples N`` (default 1024) it additionally trains an EQUAL-BUDGET
DDPM (same data/epochs/batch/width) and reports seeded random-feature
extractor FID for both families over the same held-out real draw —
directly comparable to each other (VERDICT r2 #5), not to the
literature (zero-egress env, see utils/benchmarks.py).

    python scripts/score_demo.py [--epochs 125] [--out /tmp/dmu_score_demo]
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
    ap.add_argument("--num_scales", type=int, default=300)
    ap.add_argument("--langevin_steps", type=int, default=5)
    ap.add_argument("--beta", type=float, default=0.2)
    ap.add_argument("--fid_samples", type=int, default=1024,
                    help="extractor-FID sample count (0 disables the FID "
                         "phase and the equal-budget DDPM comparison)")
    ap.add_argument("--out", type=str, default="/tmp/dmu_score_demo")
    args = ap.parse_args()

    from diffusion_model_universal_tpu.utils.cache import \
        enable_compilation_cache
    enable_compilation_cache()
    import jax
    import numpy as np

    from diffusion_model_universal_tpu.datasets import get_dataset
    from diffusion_model_universal_tpu.models import ScoreBasedDiffusion
    from diffusion_model_universal_tpu.trainers import ScoreBasedTrainer
    from diffusion_model_universal_tpu.utils.images import save_image

    # -- σ_max from the data diameter (Technique 1) -----------------------
    from diffusion_model_universal_tpu.datasets.sources import make_synthetic
    probe = make_synthetic(num_samples=256, image_size=32)
    flat = probe.reshape(len(probe), -1).astype(np.float32) / 127.5 - 1.0
    d2 = ((flat[:, None, :] - flat[None, :, :]) ** 2).sum(-1)
    sigma_max = float(np.sqrt(d2.max()))
    print(f"data diameter (σ_max) = {sigma_max:.2f}", flush=True)

    model_cfg = {
        "image_size": 32, "in_channels": 3,
        "model_channels": args.channels, "remat": False,
        "sigma_min": 0.01, "sigma_max": sigma_max,
        "num_scales": args.num_scales,
        "langevin_steps": args.langevin_steps,
        "beta": args.beta,
        "dsm_weighting": "sigma2",
        "score_parameterization": "sigma",
        "final_denoise": True,
    }
    cfg = {
        "model_name": "SCORE-DEMO",
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
    model = ScoreBasedDiffusion(model_cfg)
    trainer = ScoreBasedTrainer(model, train, val, test, cfg)

    t0 = time.time()
    first = last = None
    for epoch in range(args.epochs):
        hist = trainer.train(1)
        loss = hist.get("train_loss", float("nan"))
        first = loss if first is None else first
        last = loss
        if epoch % 10 == 0 or epoch == args.epochs - 1:
            print(f"epoch {epoch:4d}  dsm(σ²-weighted) {loss:.4f}  "
                  f"({time.time() - t0:.0f}s)", flush=True)
    train_s = time.time() - t0

    # -- sample a grid from the EMA params --------------------------------
    t1 = time.time()
    grid = np.asarray(model.generate_samples(
        trainer.state.ema_params, jax.random.PRNGKey(123), 64))
    sample_s = time.time() - t1
    os.makedirs(args.out, exist_ok=True)
    path = save_image(grid, os.path.join(args.out, "samples_ema.png"),
                      nrow=8)

    # Quantitative structure check: blob images are smooth with one bright
    # mode per channel; raw Langevin noise is not. Compare per-image
    # spatial smoothness (mean |∇x|) against the dataset's.
    def smoothness(x):
        gx = np.abs(np.diff(x, axis=2)).mean()
        gy = np.abs(np.diff(x, axis=1)).mean()
        return float(gx + gy)

    data_smooth = smoothness(flat.reshape(-1, 32, 32, 3)[:64])
    sample_smooth = smoothness(np.clip(grid, -1, 1))

    # -- extractor-FID vs an equal-budget DDPM (VERDICT r2 #5) ------------
    # Same data, same epochs/batch/width, same seeded extractor and the
    # same held-out real draw, so the two numbers are directly comparable
    # (to each other; the random-feature extractor is ordering-only, not
    # literature-comparable — zero-egress env).
    fid_score = fid_ddpm = None
    ddpm_seconds = 0.0
    if args.fid_samples:
        from diffusion_model_universal_tpu.models import DDPM
        from diffusion_model_universal_tpu.trainers import DDPMTrainer
        from diffusion_model_universal_tpu.utils.benchmarks import (
            FeatureExtractor, extractor_features, sampler_extractor_fid)

        # Shared protocol with scripts/energy_demo.py: extractor seed 0,
        # real draw seed 7 — FIDs from both demos are comparable.
        extractor = FeatureExtractor(seed=0)
        real = make_synthetic(num_samples=args.fid_samples, image_size=32,
                              seed=7).astype(np.float32) / 127.5 - 1.0
        real_f = extractor_features(real, extractor)
        t2 = time.time()
        fid_score = sampler_extractor_fid(
            model.generate_samples, trainer.state.ema_params,
            args.fid_samples, real_f, extractor)
        print(f"score FID(random-feat, {args.fid_samples}) = "
              f"{fid_score:.4f}  ({time.time() - t2:.0f}s sampling)",
              flush=True)

        ddpm = DDPM({"num_timesteps": 1000, "image_size": 32,
                     "in_channels": 3, "model_channels": args.channels,
                     "remat": False})
        dcfg = {**cfg, "model_name": "DDPM-BASELINE",
                "output": {"output_dir": os.path.join(args.out, "ddpm")}}
        dtrainer = DDPMTrainer(ddpm, train, val, test, dcfg)
        t3 = time.time()
        dtrainer.train(args.epochs)
        ddpm_seconds = time.time() - t3
        fid_ddpm = sampler_extractor_fid(
            ddpm.generate_samples, dtrainer.state.ema_params,
            args.fid_samples, real_f, extractor)
        print(f"equal-budget DDPM FID = {fid_ddpm:.4f}  "
              f"(train {ddpm_seconds:.0f}s)", flush=True)
        dgrid = np.asarray(ddpm.generate_samples(
            dtrainer.state.ema_params, jax.random.PRNGKey(123), 64))
        save_image(dgrid, os.path.join(args.out, "samples_ddpm.png"),
                   nrow=8)
        dtrainer.cleanup()

    summary = {
        "sigma_max": round(sigma_max, 2),
        "first_epoch_loss": round(float(first), 4),
        "final_epoch_loss": round(float(last), 4),
        "train_seconds": round(train_s, 1),
        "sample_seconds": round(sample_s, 1),
        "evals_per_sample": args.num_scales * args.langevin_steps,
        "data_smoothness": round(data_smooth, 4),
        "sample_smoothness": round(sample_smooth, 4),
        "grid": path,
    }
    if fid_score is not None:
        summary.update({
            "fid_samples": args.fid_samples,
            "fid_score_random_feat": round(fid_score, 4),
            "fid_ddpm_equal_budget": round(fid_ddpm, 4),
            "ddpm_train_seconds": round(ddpm_seconds, 1),
        })
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
        f.write("\n")
    print(json.dumps(summary), flush=True)
    trainer.cleanup()


if __name__ == "__main__":
    main()
