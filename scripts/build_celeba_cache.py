"""Build the `celeba_64.npz` cache from raw CelebA JPEGs, with throughput.

    python scripts/build_celeba_cache.py <data_dir> [--size 64] [--crop 178]

Expects ``<data_dir>/img_align_celeba/*.jpg`` + ``list_eval_partition.txt``
(the official layout; nothing is downloaded — zero-egress env). Writes
``<data_dir>/celeba_64.npz`` with ``images`` (uint8 NHWC) + ``splits``
(0/1/2 per the official partition), which `datasets.sources.load_celeba`
prefers over re-decoding. Ingest runs through the threaded PIL-decode +
native C++ crop/resize pipeline (`sources.decode_jpegs_crop_resize`);
the reference's equivalent is a per-sample torchvision transform chain
(`/root/reference/datasets/celeba_loader.py:88-102`).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("data_dir")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--crop", type=int, default=178)
    ap.add_argument("--threads", type=int, default=os.cpu_count() or 8)
    args = ap.parse_args()

    import numpy as np

    from diffusion_model_universal_tpu.datasets import sources

    data, split_ids = sources.load_celeba(args.data_dir,
                                          image_size=args.size)
    if isinstance(data, np.ndarray) and data.shape[1] == args.size:
        print(f"celeba_{args.size} cache already present; nothing to do")
        return
    if isinstance(data, np.ndarray):
        # A larger cache was found — downscale it instead of re-decoding.
        from diffusion_model_universal_tpu.datasets.pipeline import \
            host_resize
        t0 = time.perf_counter()
        images = host_resize(data, args.size)
        out = os.path.join(args.data_dir, f"celeba_{args.size}.npz")
        np.savez(out, images=images, splits=split_ids)
        print(f"downscaled existing cache {data.shape[1]}->{args.size} in "
              f"{time.perf_counter()-t0:.1f}s -> {out}")
        return
    paths = data
    t0 = time.perf_counter()
    images = sources.decode_jpegs_crop_resize(
        paths, args.crop, args.size, num_threads=args.threads)
    dt = time.perf_counter() - t0
    out = os.path.join(args.data_dir, f"celeba_{args.size}.npz")
    np.savez(out, images=images, splits=split_ids)
    print(f"decoded {len(paths)} JPEGs in {dt:.1f}s "
          f"({len(paths)/dt:.0f} images/sec) -> {out} "
          f"({os.path.getsize(out)/1e9:.2f} GB)")


if __name__ == "__main__":
    main()
