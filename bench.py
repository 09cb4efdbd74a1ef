"""Benchmarks: DDPM training throughput + sampler wall-clock on one chip.

Prints one JSON line per metric; the LAST line is the headline metric
(training throughput) that the driver records:

    {"metric": "DDPM 1000-step sampler ...", ...}
    {"metric": "DDIM 50-step sampler ...", ...}
    {"metric": "DDPM CIFAR-10 train throughput ...", "vs_baseline": MFU}

``vs_baseline`` semantics: the reference publishes no numbers
(BASELINE.md), so for every metric ``vs_baseline`` reports
measured / roofline where the roofline comes from the ACTUAL compiled
program's FLOP count (XLA cost analysis) against peak bf16 TFLOP/s —
i.e. the metric's MFU. 0.9 meets BASELINE.json's stated target for
training; the samplers are the BASELINE metric-2 programs (the
reference's 1000 sequential UNet calls, `models/ddpm.py:251-253`,
run here as ONE on-device lax.scan).

Training uses the trainer's scan path (``train_step_scan``): K steps per
dispatch, amortizing the host→device round trip — the same path real
training uses with ``training.scan_steps``.

Data is synthetic (identical compute to CIFAR-10; zero-egress env).
Set DMU_BENCH_SAMPLER=0 to skip the sampler section.
"""

from __future__ import annotations

import json
import os
import time


# Peak dense bf16 TFLOP/s per chip (roofline denominator).
PEAK_TFLOPS = {
    "TPU v5 lite": 197.0,   # v5e
    "TPU v5e": 197.0,
    "TPU v5p": 459.0,
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,   # v6e
}


def peak_flops_for(device) -> float:
    kind = getattr(device, "device_kind", "")
    for k, v in PEAK_TFLOPS.items():
        if kind.startswith(k):
            return v * 1e12
    return 197.0e12  # assume v5e


def _flops_of(jitted, *args) -> float:
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def bench_sampler(peak: float) -> None:
    import jax

    from diffusion_model_universal_tpu.models import DDIM, DDPM

    batch = 64
    cfg = {"num_timesteps": 1000, "image_size": 64, "in_channels": 3,
           "model_channels": 128, "remat": False}
    key = jax.random.PRNGKey(0)

    import jax.numpy as jnp
    import numpy as np

    # ONE DDPM instance serves the ancestral AND DPM++ lines (shared
    # in-process jit caches), and ONE UNet-apply FLOP count feeds every
    # sampler's roofline (all three run the identical denoiser; XLA cost
    # analysis counts a lax.scan body once, so roofline = apply × steps).
    # Keeps bench wall-clock bounded under the tunneled compile service.
    ddpm = DDPM(cfg)
    ddim = DDIM({**cfg, "ddim_sampling_steps": 50})
    params = ddpm.init_params(key)
    xs = jnp.zeros((batch, 64, 64, 3), jnp.float32)
    ts = jnp.zeros((batch,), jnp.int32)
    apply_flops = _flops_of(jax.jit(ddpm.apply), params, xs, ts)

    for name, steps, fn in (
            ("DDPM 1000-step sampler (64x64, B=64)", 1000,
             lambda p, k: ddpm.generate_samples(p, k, batch)),
            ("DDIM 50-step sampler (64x64, B=64)", 50,
             lambda p, k: ddim.generate_samples(p, k, batch)),
            ("DPM-Solver++(2M) 20-step sampler (64x64, B=64)",
             19,   # S-1 model evals
             lambda p, k: ddpm.generate_samples_dpm(
                 p, k, batch, num_steps=20))):
        _ = np.asarray(fn(params, key))     # compile + run
        n = 3 if steps <= 50 else 1
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(params, jax.random.fold_in(key, i))
        # Force materialization: block_until_ready has been observed to
        # return early under tunneled runtimes (BENCH_NOTES / memory).
        _ = np.asarray(out)
        dt = (time.perf_counter() - t0) / n
        mfu = apply_flops * steps / dt / peak if apply_flops else 0.0
        print(json.dumps({
            "metric": name,
            "value": round(dt, 3),
            "unit": "seconds",
            "vs_baseline": round(mfu, 4),
        }), flush=True)


def bench_training(peak: float) -> None:
    import jax
    import jax.numpy as jnp

    from diffusion_model_universal_tpu.datasets.pipeline import (
        DeviceDataLoader, make_augment_fn)
    from diffusion_model_universal_tpu.datasets.sources import make_synthetic
    from diffusion_model_universal_tpu.models import DDPM
    from diffusion_model_universal_tpu.trainers import DDPMTrainer

    # Batch-size sweep (BENCH_NOTES.md): 256→512→1024→2048 keeps gaining
    # (fixed Adam/EMA + dispatch cost amortized over more images; conv
    # efficiency holds) and 4096 regresses. B=2048, K=4 is the measured
    # optimum on v5e. Env overrides exist for sweeps.
    batch_size = int(os.environ.get("DMU_BENCH_BATCH", 2048))
    scan_k = int(os.environ.get("DMU_BENCH_SCANK", 4))
    model = DDPM({
        "num_timesteps": 1000, "image_size": 32, "in_channels": 3,
        "model_channels": 128, "remat": False,
        "loss_config": {"use_time_weighting": True},
    })
    cfg = {
        "model_name": "DDPM-bench",
        "training": {"num_epochs": 1, "batch_size": batch_size,
                     "learning_rate": 2e-4, "scan_steps": scan_k,
                     "scheduler": {"type": "cosine"},
                     "val_interval": 0, "sample_interval": 0,
                     "checkpoint_interval": 0, "ema_decay": 0.9999},
        "logging": {"use_wandb": False, "use_tensorboard": False,
                    "log_interval": 1000000},
        "output": {"output_dir": "/tmp/dmu_tpu_bench"},
    }
    imgs = make_synthetic(num_samples=batch_size * scan_k, image_size=32)
    aug = make_augment_fn([{"name": "normalize"}], [0.5] * 3, [0.5] * 3,
                          train=True)
    loader = DeviceDataLoader(imgs, batch_size=batch_size, augment=aug)
    trainer = DDPMTrainer(model, loader, loader, loader, cfg)

    chunk = [b for b in loader][:scan_k]
    state = trainer.state

    # FLOPs of ONE compiled train step for the roofline denominator
    # (XLA cost analysis counts a lax.scan body once, so the K-step scan
    # program reports 1/K of its real FLOPs; the single-step program is
    # the honest per-step count).
    step_flops = _flops_of(trainer.train_step, state, chunk[0],
                           trainer._step_key(0))

    # Warmup (compile + let the remote compile service settle) then
    # steady-state timing.
    import numpy as np
    for i in range(4):
        state, losses = trainer._scan_chunk(state, chunk, i * scan_k)
    _ = np.asarray(losses)

    n_chunks = 8
    t0 = time.perf_counter()
    for i in range(n_chunks):
        state, losses = trainer._scan_chunk(state, chunk,
                                            (i + 4) * scan_k)
    _ = np.asarray(losses)  # materialize: see sampler comment
    dt = time.perf_counter() - t0

    n_steps = n_chunks * scan_k
    images_per_sec = batch_size * n_steps / dt
    vs_baseline = 0.0
    if step_flops:
        roofline_img_s = peak / (step_flops / batch_size)
        vs_baseline = images_per_sec / roofline_img_s

    print(json.dumps({
        "metric": "DDPM CIFAR-10 train throughput "
                  f"(C=128 UNet, bf16, B={batch_size}, {scan_k}-step scan)",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 4),
    }), flush=True)
    trainer.cleanup()


def main() -> None:
    import jax

    from diffusion_model_universal_tpu.utils.cache import \
        enable_compilation_cache
    enable_compilation_cache()
    peak = peak_flops_for(jax.devices()[0])

    if os.environ.get("DMU_BENCH_SAMPLER", "1") != "0":
        bench_sampler(peak)
    bench_training(peak)  # headline metric LAST


if __name__ == "__main__":
    main()
