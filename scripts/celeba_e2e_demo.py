"""CelebA-pipeline end-to-end drive on real hardware (stand-in JPEGs).

The environment has zero egress and no CelebA files, so this drive
synthesizes a dataset in the OFFICIAL CelebA layout — aligned 178×218
JPEGs under ``img_align_celeba/`` plus ``list_eval_partition.txt`` with
0/1/2 split ids (`/root/reference/datasets/celeba_loader.py:130-151`) —
and then exercises the REAL pipeline end-to-end:

1. `scripts/build_celeba_cache.py` — threaded PIL decode + native C++
   178-crop→64² resize (`native/batch_loader.cpp`) → `celeba_64.npz`;
2. `scripts/train.py` with `data.dataset: celeba` — the official-split
   loader path, 64×64 training on the TPU through the production
   trainer;
3. `scripts/generate.py` — a sample grid from the trained checkpoint.

Stand-in data, real pipeline: every CelebA-specific code path (layout
discovery, partition parsing, JPEG ingest, cache preference, 64×64
train/sample) runs exactly as it would on the real dataset.

    python scripts/celeba_e2e_demo.py [--num_images 4000] [--epochs 20]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIG = """
model_name: "DDPM-CELEBA-E2E"
model_config:
  time_steps: 1000
  beta_start: 0.0001
  beta_end: 0.02
  image_size: 64
  image_channels: 3
  hidden_channels: {channels}
  loss_type: "mse"

training:
  num_epochs: {epochs}
  batch_size: {batch}
  learning_rate: 2.0e-4
  ema_decay: 0.999
  scan_steps: 4
  scheduler: {{type: "constant"}}
  val_interval: 0
  sample_interval: 0
  checkpoint_interval: 0

data:
  dataset: "celeba"
  data_dir: "{data_dir}"
  image_size: 64
  crop_size: 178

logging:
  use_wandb: false
  use_tensorboard: false
  log_interval: 20
  track_time_metrics: true

output:
  output_dir: "{out_dir}"
"""


def synthesize_celeba_layout(data_dir: Path, n: int) -> float:
    """Write n aligned-CelebA-layout JPEGs + the official partition file."""
    from PIL import Image

    from diffusion_model_universal_tpu.datasets.sources import make_synthetic

    img_dir = data_dir / "img_align_celeba"
    img_dir.mkdir(parents=True, exist_ok=True)
    # Smooth blob images at 218², cropped to the aligned 178×218 (W×H).
    imgs = make_synthetic(num_samples=n, image_size=218, seed=7)
    imgs = imgs[:, :, 20:198, :]  # (n, 218, 178, 3)
    t0 = time.perf_counter()
    lines = []
    for i in range(n):
        name = f"{i + 1:06d}.jpg"
        Image.fromarray(imgs[i]).save(img_dir / name, quality=92)
        # Official scheme: 0=train, 1=val, 2=test.
        split = 0 if i < int(n * 0.8) else (1 if i < int(n * 0.9) else 2)
        lines.append(f"{name} {split}\n")
    (data_dir / "list_eval_partition.txt").write_text("".join(lines))
    return time.perf_counter() - t0


def run(cmd, log_path: Path) -> float:
    print(f"[celeba-e2e] $ {' '.join(map(str, cmd))}", flush=True)
    t0 = time.time()
    with open(log_path, "a") as log:
        log.write(f"\n$ {' '.join(map(str, cmd))}\n")
        log.flush()
        subprocess.run(list(map(str, cmd)), check=True, stdout=log,
                       stderr=subprocess.STDOUT)
    return time.time() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_images", type=int, default=4000)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--root", type=str, default="/tmp/dmu_celeba_e2e")
    args = ap.parse_args()

    root = Path(args.root)
    if root.exists():
        shutil.rmtree(root)
    data_dir, out_dir = root / "data", root / "out"
    out_dir.mkdir(parents=True)
    log_path = root / "driver.log"

    t_jpeg = synthesize_celeba_layout(data_dir, args.num_images)
    print(f"[celeba-e2e] wrote {args.num_images} JPEGs in {t_jpeg:.1f}s",
          flush=True)

    # 1. Cache build: threaded decode + native C++ crop-resize.
    t_cache = run([sys.executable, "-u", "scripts/build_celeba_cache.py",
                   data_dir, "--size", 64], log_path)
    assert (data_dir / "celeba_64.npz").exists()

    # 2. Real train CLI on the celeba loader path (official splits).
    cfg_path = root / "config.yaml"
    cfg_path.write_text(CONFIG.format(
        channels=args.channels, epochs=args.epochs, batch=args.batch,
        data_dir=data_dir, out_dir=out_dir))
    t_train = run([sys.executable, "-u", "-m",
                   "diffusion_model_universal_tpu.scripts.train",
                   "--config", cfg_path, "--model_type", "ddpm"], log_path)

    # 3. Sample grid from the trained checkpoint.
    t_gen = run([sys.executable, "-u", "-m",
                 "diffusion_model_universal_tpu.scripts.generate",
                 "--config", cfg_path, "--model_type", "ddpm",
                 "--checkpoint", out_dir / "checkpoints" / "final_model",
                 "--ema", "--num_samples", "64", "--grid_only",
                 "--output_dir", out_dir / "samples"], log_path)

    # Steady-state train throughput from the JSONL metrics sink
    # (scan-path inter-log-interval rate; the first reading covers the
    # compile and is excluded by taking the median of the rest).
    sps = []
    metrics_path = out_dir / "metrics.jsonl"
    if metrics_path.exists():
        for line in metrics_path.read_text().splitlines():
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            v = rec.get("performance/samples_per_second")
            if v:
                sps.append(v)

    summary = {
        "num_images": args.num_images,
        "jpeg_write_seconds": round(t_jpeg, 1),
        "cache_build_seconds": round(t_cache, 1),
        "train_seconds": round(t_train, 1),
        "train_samples_per_sec_median": (
            round(sorted(sps)[len(sps) // 2], 1) if sps else None),
        "train_throughput_readings": [round(v, 1) for v in sps],
        "generate_seconds": round(t_gen, 1),
        "grid": str(out_dir / "samples" / "samples_grid.png"),
    }
    (root / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
