"""Per-shape XLA conv efficiency at the flagship UNet's dominant shapes.

Breaks `bench.measure_conv_efficiency`'s FLOP-share-weighted aggregate
into its per-shape terms, to locate WHERE the ~0.76 weighted conv
efficiency is lost — specifically whether the tiny-spatial bottleneck
shapes (4x4 C=256, 2x2 C=512) are weak enough that a batch-in-sublanes
Pallas conv (packing batch into the sublane dim where spatial rows
can't fill it; `scripts/exp_conv_kernel.py --shape 2 512 512
--block_b 128`) has real headroom, before investing in a custom_vjp
production kernel. The numbers come from the bench's own timing loop
(`measure_conv_efficiency(per_shape=...)`) — the same jitted programs
as the aggregate, so they reconcile by construction.

    python scripts/exp_conv_shapes.py [--batch 2048]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    args = ap.parse_args()

    import jax

    import bench
    from diffusion_model_universal_tpu.utils.cache import \
        enable_compilation_cache

    enable_compilation_cache()
    peak = bench.peak_flops_for(jax.devices()[0])
    print(f"batch={args.batch}  peak={peak/1e12:.0f} TFLOP/s", flush=True)
    records: list = []
    weighted = bench.measure_conv_efficiency(peak, args.batch,
                                             per_shape=records)
    for h, cin, cout, k, stride, share, ms, eff in records:
        print(f"  {h:>2}x{h:<2} C{cin:>3}->{cout:<3} k{k} s{stride} "
              f"share {share:.3f}  {ms:7.3f} ms/conv  eff {eff:.3f}",
              flush=True)
    print(f"weighted conv efficiency: {weighted:.4f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
