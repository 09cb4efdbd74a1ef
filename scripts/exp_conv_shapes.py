"""Per-shape XLA conv efficiency at the flagship UNet's dominant shapes.

Breaks `bench.measure_conv_efficiency`'s FLOP-share-weighted aggregate
into its per-shape terms, to locate WHERE the ~0.76 weighted conv
efficiency is lost — specifically whether the tiny-spatial bottleneck
shapes (4x4 C=256, 2x2 C=512) are weak enough that a batch-in-sublanes
Pallas conv (packing batch into the sublane dim where spatial rows
can't fill it) has real headroom, before investing in a custom_vjp
production kernel. Uses the exact timing methodology (chained reps /
per-rep weight perturbation) as the bench, so the numbers reconcile.

    python scripts/exp_conv_shapes.py [--batch 2048]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from diffusion_model_universal_tpu.utils.cache import \
        enable_compilation_cache

    enable_compilation_cache()
    peak = bench.peak_flops_for(jax.devices()[0])
    key = jax.random.PRNGKey(0)
    print(f"batch={args.batch}  peak={peak/1e12:.0f} TFLOP/s", flush=True)
    weighted, total_share = 0.0, 0.0
    for i, (h, cin, cout, k, stride, share) in enumerate(bench._CONV_SHAPES):
        kx, kw = jax.random.split(jax.random.fold_in(key, i))
        x = (jax.random.normal(kx, (args.batch, h, h, cin), jnp.bfloat16)
             * 0.01)
        w = (jax.random.normal(kw, (k, k, cin, cout), jnp.bfloat16)
             * (1.0 / (k * k * cin)) ** 0.5)
        flops_single = 2.0 * (h // stride) ** 2 * k * k * cin * cout \
            * args.batch
        reps = min(max(int(0.25 * peak * 0.7 / flops_single), 10), 400)
        chain = (cin == cout and stride == 1)

        def run(x, w):
            dn = ("NHWC", "HWIO", "NHWC")
            if chain:
                y = x
                for _ in range(reps):
                    y = jax.lax.conv_general_dilated(
                        y, w, (1, 1), "SAME", dimension_numbers=dn)
                return jnp.sum(y.astype(jnp.float32))
            acc = None
            for r in range(reps):
                y = jax.lax.conv_general_dilated(
                    x, w + jnp.bfloat16(r * 1e-6), (stride, stride),
                    "SAME", dimension_numbers=dn)
                acc = y if acc is None else acc + y
            return jnp.sum(acc.astype(jnp.float32))

        jitted = jax.jit(run)
        flops = bench._flops_of(jitted, x, w) or flops_single * reps
        _ = np.asarray(jitted(x, w))
        t0 = time.perf_counter()
        _ = np.asarray(jitted(x, w))
        dt = time.perf_counter() - t0
        eff = flops / dt / peak
        weighted += share * eff
        total_share += share
        print(f"  {h:>2}x{h:<2} C{cin:>3}->{cout:<3} k{k} s{stride} "
              f"share {share:.3f}  reps {reps:>3}  "
              f"{dt*1e3/reps:7.3f} ms/conv  eff {eff:.3f}", flush=True)
    print(f"weighted conv efficiency: {weighted / total_share:.4f}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
