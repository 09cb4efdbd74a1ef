"""Per-segment MFU analysis of the flagship DDPM train step on one chip.

Times (a) forward loss, (b) value_and_grad, (c) the full jitted train step
(loss+grad+Adam+EMA), each with XLA-cost-analysis FLOPs, and prints a
table of time / FLOPs / achieved TFLOP/s / MFU. Run on the real TPU:

    python scripts/perf_analysis.py [--batch 256] [--channels 128]

This is the profiling lever from round-1 VERDICT "Next round" item 3 —
it tells you WHERE the 0.33-MFU step loses its time before touching any
kernel. Optionally writes a jax.profiler trace with --trace DIR.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_fn(fn, args, n=20, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def _flops(fn, args):
    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0.0))
    except Exception:
        return 0.0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--trace", type=str, default=None)
    ap.add_argument("--use_pallas", action="store_true")
    args = ap.parse_args()

    from diffusion_model_universal_tpu.utils.cache import \
        enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from diffusion_model_universal_tpu.models import DDPM

    PEAK = 197e12  # v5e bf16

    model = DDPM({
        "num_timesteps": 1000, "image_size": 32, "in_channels": 3,
        "model_channels": args.channels, "remat": False,
        "use_pallas": args.use_pallas,
        "loss_config": {"use_time_weighting": True},
    })
    params = model.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (args.batch, 32, 32, 3), jnp.float32)
    key = jax.random.PRNGKey(2)

    import optax
    opt = optax.adam(2e-4)
    opt_state = opt.init(params)

    fwd = jax.jit(model.loss_function)
    vg = jax.jit(lambda p, b, k: jax.value_and_grad(model.loss_function)(
        p, b, k))

    def full(p, o, e, b, k):
        loss, grads = jax.value_and_grad(model.loss_function)(p, b, k)
        updates, o = opt.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        e = jax.tree_util.tree_map(
            lambda a, q: a * 0.9999 + 1e-4 * q, e, p)
        return p, o, e, loss

    ema = jax.tree_util.tree_map(jnp.copy, params)
    fullj = jax.jit(full, donate_argnums=(0, 1, 2))

    rows = []
    t = _time_fn(fwd, (params, x, key))
    f = _flops(model.loss_function, (params, x, key))
    rows.append(("forward loss", t, f))

    t = _time_fn(vg, (params, x, key))
    f = _flops(lambda p, b, k: jax.value_and_grad(model.loss_function)(
        p, b, k), (params, x, key))
    rows.append(("fwd+bwd", t, f))

    # full step (donating): re-feed updated state each call
    for _ in range(3):
        params, opt_state, ema, loss = fullj(params, opt_state, ema, x, key)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        params, opt_state, ema, loss = fullj(params, opt_state, ema, x, key)
    jax.block_until_ready(loss)
    t = (time.perf_counter() - t0) / n
    try:
        c = fullj.lower(params, opt_state, ema, x, key).compile(
            ).cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        f = float(c.get("flops", 0.0))
    except Exception:
        f = 0.0
    rows.append(("full train step", t, f))

    print(f"\n{'segment':<18}{'ms':>9}{'GFLOP':>10}{'TFLOP/s':>10}{'MFU':>7}"
          f"{'img/s':>9}")
    for name, t, f in rows:
        tf = f / t / 1e12 if t else 0
        print(f"{name:<18}{t*1e3:>9.2f}{f/1e9:>10.1f}{tf:>10.1f}"
              f"{tf*1e12/PEAK:>7.3f}{args.batch/t:>9.0f}")

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(5):
                params, opt_state, ema, loss = fullj(params, opt_state, ema,
                                                     x, key)
            jax.block_until_ready(loss)
        print(f"trace written to {args.trace}")
