"""Raw dataset readers (no torchvision dependency, zero network egress).

Each reader returns uint8 NHWC numpy arrays from on-disk files in the
standard formats torchvision would have downloaded, so a data directory
prepared for the reference works unchanged. Nothing here downloads: with no
files present a :class:`DatasetNotFoundError` explains what to provide.
"""

from __future__ import annotations

import gzip
import pickle
import struct
from pathlib import Path
from typing import Tuple

import numpy as np


class DatasetNotFoundError(FileNotFoundError):
    pass


def _open_maybe_gz(path: Path):
    if path.suffix == ".gz":
        return gzip.open(path, "rb")
    return open(path, "rb")


def read_idx_images(path: Path) -> np.ndarray:
    """Parse an IDX3 image file (the MNIST raw format) to [N, H, W] uint8."""
    with _open_maybe_gz(path) as f:
        magic, n, rows, cols = struct.unpack(">IIII", f.read(16))
        if magic != 2051:
            raise ValueError(f"{path}: bad IDX3 magic {magic}")
        data = np.frombuffer(f.read(n * rows * cols), np.uint8)
    return data.reshape(n, rows, cols)


def read_idx_labels(path: Path) -> np.ndarray:
    """Parse an IDX1 label file (MNIST raw format) to [N] uint8."""
    with _open_maybe_gz(path) as f:
        magic, n = struct.unpack(">II", f.read(8))
        if magic != 2049:
            raise ValueError(f"{path}: bad IDX1 magic {magic}")
        return np.frombuffer(f.read(n), np.uint8)


def _find(data_dir: Path, names) -> Path:
    for name in names:
        for candidate in (data_dir / name, data_dir / (name + ".gz")):
            if candidate.exists():
                return candidate
        hits = list(data_dir.rglob(name)) + list(data_dir.rglob(name + ".gz"))
        if hits:
            return hits[0]
    raise DatasetNotFoundError(
        f"none of {names} found under {data_dir} — place the standard "
        "torchvision-format files there (this environment has no network "
        "egress, so nothing is downloaded automatically)")


def load_mnist(data_dir: str) -> Tuple[np.ndarray, np.ndarray]:
    """(train_images [60000,28,28,1], test_images [10000,28,28,1]) uint8."""
    root = Path(data_dir)
    train = read_idx_images(_find(root, ["train-images-idx3-ubyte",
                                         "train-images.idx3-ubyte"]))
    test = read_idx_images(_find(root, ["t10k-images-idx3-ubyte",
                                        "t10k-images.idx3-ubyte"]))
    return train[..., None], test[..., None]


def load_mnist_labels(data_dir: str) -> Tuple[np.ndarray, np.ndarray]:
    """(train_labels [60000], test_labels [10000]) int64 class ids."""
    root = Path(data_dir)
    train = read_idx_labels(_find(root, ["train-labels-idx1-ubyte",
                                         "train-labels.idx1-ubyte"]))
    test = read_idx_labels(_find(root, ["t10k-labels-idx1-ubyte",
                                        "t10k-labels.idx1-ubyte"]))
    return train.astype(np.int64), test.astype(np.int64)


def load_cifar10_labels(data_dir: str) -> Tuple[np.ndarray, np.ndarray]:
    """(train_labels [50000], test_labels [10000]) int64 class ids from
    the same pickle batches as :func:`load_cifar10`."""
    root = Path(data_dir)

    def read_labels(path: Path) -> np.ndarray:
        with open(path, "rb") as f:
            d = pickle.load(f, encoding="bytes")
        raw = d.get(b"labels", d.get("labels"))
        return np.asarray(raw, np.int64)

    train = np.concatenate([
        read_labels(_find(root, [f"data_batch_{i}"])) for i in range(1, 6)])
    return train, read_labels(_find(root, ["test_batch"]))


def load_cifar10(data_dir: str) -> Tuple[np.ndarray, np.ndarray]:
    """(train [50000,32,32,3], test [10000,32,32,3]) uint8 from the
    python-pickle batch files (cifar-10-batches-py)."""
    root = Path(data_dir)

    def read_batch(path: Path) -> np.ndarray:
        with open(path, "rb") as f:
            d = pickle.load(f, encoding="bytes")
        raw = d[b"data"] if b"data" in d else d["data"]
        return np.asarray(raw, np.uint8).reshape(-1, 3, 32, 32).transpose(
            0, 2, 3, 1)

    batches = []
    for i in range(1, 6):
        batches.append(read_batch(_find(root, [f"data_batch_{i}"])))
    train = np.concatenate(batches)
    test = read_batch(_find(root, ["test_batch"]))
    return train, test


def load_celeba(data_dir: str, image_size: int = 64):
    """CelebA images + official split file.

    Returns (paths or preloaded array, split_ids). CelebA is ~200k JPEGs —
    too large to hold decoded fp32 in host RAM, so we return the aligned
    uint8 array only if a prebuilt cache exists (``celeba_{image_size}.npz``
    from `scripts/build_celeba_cache.py`, with any other ``celeba_*.npz``
    as a fallback — the static pipeline resizes to the configured size);
    otherwise decode from ``img_align_celeba/`` via the threaded ingest.
    """
    root = Path(data_dir)
    # Exact-size cache first; else the smallest cache ≥ image_size
    # (downscaling is lossless-enough; upscaling a smaller cache would
    # silently degrade the data, so those are ignored).
    sized = []
    for p in root.glob("celeba_*.npz"):
        try:
            size = int(p.stem.split("_")[-1])
        except ValueError:
            continue
        if size >= image_size:
            # Exact size sorts ahead of any larger cache.
            sized.append((size != image_size, size, p))
    for _, _, cache in sorted(sized):
        with np.load(cache) as z:
            return z["images"], z.get("splits")
    img_dir = None
    for candidate in (root / "img_align_celeba",
                      root / "celeba" / "img_align_celeba"):
        if candidate.exists():
            img_dir = candidate
            break
    if img_dir is None:
        raise DatasetNotFoundError(
            f"CelebA not found under {root}: provide celeba_64.npz or "
            "img_align_celeba/ plus list_eval_partition.txt (no network "
            "egress — nothing is downloaded)")
    split_file = _find(root, ["list_eval_partition.txt"])
    names, split_ids = [], []
    with open(split_file) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 2:
                names.append(parts[0])
                split_ids.append(int(parts[1]))
    paths = [img_dir / n for n in names]
    return paths, np.asarray(split_ids, np.int32)


def make_synthetic(num_samples: int = 2048, image_size: int = 32,
                   channels: int = 3, seed: int = 42) -> np.ndarray:
    """Procedural dataset: smooth random Gaussian blobs + gradients.

    Structured enough that a diffusion model has something to learn in
    smoke tests/benchmarks, fully deterministic for a given seed.
    """
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:image_size, 0:image_size].astype(np.float32)
    yy /= image_size
    xx /= image_size
    imgs = np.zeros((num_samples, image_size, image_size, channels),
                    np.float32)
    for c in range(channels):
        cx = rng.uniform(0.2, 0.8, (num_samples, 1, 1))
        cy = rng.uniform(0.2, 0.8, (num_samples, 1, 1))
        s = rng.uniform(0.05, 0.25, (num_samples, 1, 1))
        amp = rng.uniform(0.4, 1.0, (num_samples, 1, 1))
        blob = amp * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s ** 2)))
        grad = rng.uniform(-0.3, 0.3, (num_samples, 1, 1)) * (xx - 0.5)
        imgs[..., c] = np.clip(blob + grad + 0.3, 0.0, 1.0)
    return (imgs * 255).astype(np.uint8)


def decode_jpegs_crop_resize(paths, crop: int, out_size: int,
                             num_threads: int = 16,
                             chunk: int = 2048) -> np.ndarray:
    """Fast JPEG ingest: threaded PIL decode + native crop/resize.

    The reference decodes CelebA's ~200k JPEGs one-by-one on the Python
    thread (`/root/reference/datasets/celeba_loader.py:88-102` via
    torchvision transforms); here decode runs on a thread pool (libjpeg
    releases the GIL) and the 178→``out_size`` center-crop + bilinear
    resize runs in the threaded C++ loader (`native/batch_loader.cpp`),
    chunked so peak memory stays at one raw chunk.

    Images whose size differs from the majority are handled per-image via
    PIL (CelebA aligned images are uniformly 178×218).
    """
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    from .. import native

    n = len(paths)
    out = np.empty((n, out_size, out_size, 3), np.uint8)
    if n == 0:
        return out

    with Image.open(paths[0]) as im0:
        w0, h0 = im0.size

    def decode_into(buf, i, path):
        with Image.open(path) as img:
            img = img.convert("RGB")
            if img.size != (w0, h0):
                # Odd-sized image: full PIL path for this one.
                w, h = img.size
                c = min(crop, w, h)
                left, top = (w - c) // 2, (h - c) // 2
                small = img.crop((left, top, left + c, top + c)).resize(
                    (out_size, out_size), Image.BILINEAR)
                return i, np.asarray(small, np.uint8)
            buf[i] = np.asarray(img, np.uint8)
            return None

    with ThreadPoolExecutor(max_workers=num_threads) as pool:
        for start in range(0, n, chunk):
            end = min(start + chunk, n)
            raw = np.empty((end - start, h0, w0, 3), np.uint8)
            odd = list(pool.map(
                lambda t: decode_into(raw, t[0], t[1]),
                enumerate(paths[start:end])))
            out[start:end] = native.center_crop_resize(
                raw, min(crop, w0, h0), out_size, num_threads=num_threads)
            for item in odd:
                if item is not None:
                    out[start + item[0]] = item[1]
    return out
