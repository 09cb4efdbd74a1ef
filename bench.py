"""Benchmark: DDPM CIFAR-10-config training throughput on one TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

The headline metric from BASELINE.json is DDPM CIFAR-10 train images/sec/
chip with a ≥90%-of-v5e-roofline target. The reference publishes no
numbers (BASELINE.md), so ``vs_baseline`` reports measured / roofline where
the roofline is computed from the ACTUAL compiled step's FLOP count
(XLA cost analysis) against the chip's peak bf16 throughput — i.e.
vs_baseline == MFU of the training step; 0.9 meets the stated target.

Data is synthetic 32×32×3 (identical compute to CIFAR-10; no dataset
download is possible in this zero-egress environment).
"""

from __future__ import annotations

import json
import time


# Peak dense bf16 TFLOP/s per chip (used for the roofline denominator).
PEAK_TFLOPS = {
    "TPU v5 lite": 197.0,   # v5e
    "TPU v5e": 197.0,
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,   # v6e
}


def peak_flops_for(device) -> float:
    kind = getattr(device, "device_kind", "")
    for k, v in PEAK_TFLOPS.items():
        if kind.startswith(k):
            return v * 1e12
    return 197.0e12  # assume v5e


def main() -> None:
    import jax

    from diffusion_model_universal_tpu.utils.cache import \
        enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from diffusion_model_universal_tpu.datasets.sources import make_synthetic
    from diffusion_model_universal_tpu.models import DDPM
    from diffusion_model_universal_tpu.trainers import DDPMTrainer
    from diffusion_model_universal_tpu.datasets.pipeline import (
        DeviceDataLoader, make_augment_fn)

    batch_size = 256
    model = DDPM({
        "num_timesteps": 1000, "image_size": 32, "in_channels": 3,
        "model_channels": 128, "remat": False,
        "loss_config": {"use_time_weighting": True},
    })
    cfg = {
        "model_name": "DDPM-bench",
        "training": {"num_epochs": 1, "batch_size": batch_size,
                     "learning_rate": 2e-4,
                     "scheduler": {"type": "cosine"},
                     "val_interval": 0, "sample_interval": 0,
                     "checkpoint_interval": 0, "ema_decay": 0.9999},
        "logging": {"use_wandb": False, "use_tensorboard": False,
                    "log_interval": 1000000},
        "output": {"output_dir": "/tmp/dmu_tpu_bench"},
    }
    imgs = make_synthetic(num_samples=batch_size * 4, image_size=32)
    aug = make_augment_fn([{"name": "normalize"}], [0.5] * 3, [0.5] * 3,
                          train=True)
    loader = DeviceDataLoader(imgs, batch_size=batch_size, augment=aug)
    trainer = DDPMTrainer(model, loader, loader, loader, cfg)

    batch = trainer._global_batch(next(iter(loader)))
    state = trainer.state

    # FLOPs of the compiled step, for the roofline denominator.
    step_flops = None
    try:
        lowered = trainer.train_step.lower(state, batch,
                                           trainer._step_key(0))
        cost = lowered.compile().cost_analysis()
        if cost:
            c = cost[0] if isinstance(cost, (list, tuple)) else cost
            step_flops = float(c.get("flops", 0.0)) or None
    except Exception:
        pass

    # Warmup (compile) then steady-state timing.
    for i in range(3):
        state, metrics = trainer.train_step(state, batch,
                                            trainer._step_key(i))
    jax.block_until_ready(metrics["loss"])

    n_steps = 30
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = trainer.train_step(state, batch,
                                            trainer._step_key(i + 3))
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    images_per_sec = batch_size * n_steps / dt
    vs_baseline = 0.0
    if step_flops:
        peak = peak_flops_for(jax.devices()[0])
        roofline_img_s = peak / (step_flops / batch_size)
        vs_baseline = images_per_sec / roofline_img_s

    print(json.dumps({
        "metric": "DDPM CIFAR-10 train throughput (C=128 UNet, bf16, B=256)",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 4),
    }))
    trainer.cleanup()


if __name__ == "__main__":
    main()
