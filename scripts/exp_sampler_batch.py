"""Sampler MFU vs batch size (VERDICT r2 #2: the roofline treatment).

The r2 bench measured samplers only at B=64 (DPM++ MFU 0.456) without
asking whether that batch saturates the chip. This sweep times the three
samplers' on-device lax.scan programs at larger B on the 64x64 C=128
flagship denoiser and reports wall-clock, samples/sec/chip, and MFU
(UNet-apply FLOPs x model evals / time / peak), the same roofline the
train step gets. Default batches are {256, 1024}: together with the
bench's standing B=64 line they give the saturation curve at two extra
points while every sampler program costs a multi-minute tunneled
remote compile (BENCH_NOTES, round 3).

    python scripts/exp_sampler_batch.py [--batches 256 1024]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[256, 1024])
    ap.add_argument("--image_size", type=int, default=64)
    ap.add_argument("--skip_ancestral", action="store_true",
                    help="skip the 1000-step chain (long at large B)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _flops_of, peak_flops_for, time_sampler
    from diffusion_model_universal_tpu.models import DDIM, DDPM
    from diffusion_model_universal_tpu.utils.cache import \
        enable_compilation_cache

    enable_compilation_cache()
    peak = peak_flops_for(jax.devices()[0])
    key = jax.random.PRNGKey(0)

    cfg = {"num_timesteps": 1000, "image_size": args.image_size,
           "in_channels": 3, "model_channels": 128, "remat": False}
    ddpm = DDPM(cfg)
    ddim = DDIM({**cfg, "ddim_sampling_steps": 50})
    params = ddpm.init_params(key)

    print(f"{'sampler':28s} {'B':>5s} {'wall s':>8s} {'img/s':>8s} "
          f"{'MFU':>6s} {'reps':>5s} {'spread':>7s}")
    for batch in args.batches:
        xs = jnp.zeros((batch, args.image_size, args.image_size, 3),
                       jnp.float32)
        ts = jnp.zeros((batch,), jnp.int32)
        apply_flops = _flops_of(jax.jit(ddpm.apply), params, xs, ts)

        runs = [
            ("DPM++(2M)-20", 19,
             lambda p, k, b=batch: ddpm.generate_samples_dpm(
                 p, k, b, num_steps=20)),
            ("DDIM-50", 50,
             lambda p, k, b=batch: ddim.generate_samples(p, k, b)),
        ]
        if not args.skip_ancestral:
            runs.append(("DDPM ancestral-1000", 1000,
                         lambda p, k, b=batch: ddpm.generate_samples(
                             p, k, b)))
        for name, evals, fn in runs:
            _ = np.asarray(fn(params, key))  # compile + warm
            # Amortized timing (bench.time_sampler): windows of
            # back-to-back async dispatches, one sync per window,
            # dispersion reported — the r3 n=1-3 methodology could not
            # tell regression from tunnel jitter (VERDICT r3 #4).
            windows = 2 if evals > 50 else 4
            dt, reps, spread = time_sampler(
                lambda k: fn(params, k), key, windows=windows)
            mfu = apply_flops * evals / dt / peak if apply_flops else 0.0
            print(f"{name:28s} {batch:5d} {dt:8.3f} {batch/dt:8.1f} "
                  f"{mfu:6.3f} {reps:5d} {spread*100:6.1f}%", flush=True)


if __name__ == "__main__":
    main()
