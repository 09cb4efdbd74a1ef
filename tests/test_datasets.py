"""Dataset/pipeline tests: transforms, splits, sharding, loader parity."""

import gzip
import pickle
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_universal_tpu.datasets import (
    DATASET_REGISTRY, DeviceDataLoader, SyntheticDataset, get_dataset,
    make_augment_fn, split_indices)
from diffusion_model_universal_tpu.datasets import sources
from diffusion_model_universal_tpu.datasets.pipeline import (
    apply_static_transforms, host_center_crop, host_resize)


def test_registry_names():
    assert {"mnist", "cifar10", "celeba", "synthetic"} <= set(DATASET_REGISTRY)


def test_split_indices_disjoint_and_seeded():
    idx1 = split_indices(100, {"train": 0.8, "val": 0.1, "test": 0.1})
    idx2 = split_indices(100, {"train": 0.8, "val": 0.1, "test": 0.1})
    all_idx = np.concatenate([idx1["train"], idx1["val"], idx1["test"]])
    assert sorted(all_idx.tolist()) == list(range(100))
    assert len(idx1["train"]) == 80 and len(idx1["val"]) == 10
    np.testing.assert_array_equal(idx1["train"], idx2["train"])
    with pytest.raises(ValueError):
        split_indices(10, {"train": 0.5, "val": 0.1, "test": 0.1})


def test_host_geometry():
    img = np.arange(6 * 6 * 1, dtype=np.uint8).reshape(1, 6, 6, 1)
    crop = host_center_crop(img, 4)
    assert crop.shape == (1, 4, 4, 1)
    assert crop[0, 0, 0, 0] == img[0, 1, 1, 0]
    resized = host_resize(img, 3)
    assert resized.shape == (1, 3, 3, 1)


def test_normalize_augment():
    aug = make_augment_fn([{"name": "normalize"}], [0.5], [0.5], train=False)
    batch = jnp.full((2, 4, 4, 1), 255, jnp.uint8)
    out = aug(batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)
    batch0 = jnp.zeros((2, 4, 4, 1), jnp.uint8)
    out0 = aug(batch0, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out0), -1.0, atol=1e-6)


def test_flip_augment_train_only():
    tlist = [{"name": "random_horizontal_flip", "p": 1.0},
             {"name": "normalize"}]
    img = np.zeros((1, 2, 4, 1), np.uint8)
    img[0, :, 0, 0] = 255  # left column bright
    aug_train = make_augment_fn(tlist, [0.0], [1.0], train=True)
    aug_eval = make_augment_fn(tlist, [0.0], [1.0], train=False)
    out_t = np.asarray(aug_train(jnp.asarray(img), jax.random.PRNGKey(0)))
    out_e = np.asarray(aug_eval(jnp.asarray(img), jax.random.PRNGKey(0)))
    assert out_t[0, 0, -1, 0] == pytest.approx(1.0)  # flipped
    assert out_e[0, 0, 0, 0] == pytest.approx(1.0)   # not flipped


def test_random_crop_and_color_jitter_shapes():
    tlist = [{"name": "random_crop", "size": 4, "padding": 2},
             {"name": "color_jitter", "brightness": 0.2, "contrast": 0.2,
              "saturation": 0.2},
             {"name": "normalize"}]
    aug = make_augment_fn(tlist, [0.5] * 3, [0.5] * 3, train=True)
    batch = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (3, 4, 4, 3), dtype=np.uint8))
    out = aug(batch, jax.random.PRNGKey(0))
    assert out.shape == (3, 4, 4, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_grayscale_to_rgb_static():
    img = np.ones((2, 4, 4, 1), np.uint8)
    out = apply_static_transforms(img, [{"name": "grayscale_to_rgb"}], 4)
    assert out.shape == (2, 4, 4, 3)


def test_loader_epoch_shuffling_and_len():
    imgs = np.arange(32, dtype=np.uint8)[:, None, None, None] * np.ones(
        (1, 2, 2, 1), np.uint8)
    aug = make_augment_fn([], [0.0], [1.0], train=False)
    loader = DeviceDataLoader(imgs, batch_size=8, augment=aug, shuffle=True,
                              seed=1)
    assert len(loader) == 4
    e1 = [np.asarray(b) for b in loader]
    e2 = [np.asarray(b) for b in loader]
    assert len(e1) == 4
    # Different epochs → different order.
    assert not all(np.allclose(a, b) for a, b in zip(e1, e2))


def test_loader_sharding_disjoint():
    """The DistributedSampler analogue: shards are disjoint and cover the
    shared permutation."""
    imgs = np.arange(16, dtype=np.uint8)[:, None, None, None] * np.ones(
        (1, 1, 1, 1), np.uint8)
    aug = make_augment_fn([], [0.0], [1.0], train=False)
    seen = []
    for rank in range(2):
        loader = DeviceDataLoader(imgs, batch_size=4, augment=aug,
                                  shuffle=True, seed=7, world_size=2,
                                  rank=rank)
        loader.set_epoch(0)
        vals = np.concatenate([np.asarray(b).ravel() for b in loader])
        seen.append(set(np.round(vals * 255).astype(int).tolist()))
    assert seen[0].isdisjoint(seen[1])
    assert len(seen[0] | seen[1]) == 16


def test_synthetic_dataset_and_get_dataset():
    cfg = {"data": {"dataset": "synthetic", "data_dir": "/tmp/nope"},
           "training": {"batch_size": 16}}
    train, val, test = get_dataset(cfg)
    batch = next(iter(train))
    assert batch.shape == (16, 32, 32, 3)
    # normalize to [-1, 1]
    assert -1.01 <= float(jnp.min(batch)) and float(jnp.max(batch)) <= 1.01
    assert len(val) >= 1 and len(test) >= 1


def test_get_dataset_unknown_raises():
    with pytest.raises(ValueError):
        get_dataset({"data": {"dataset": "imagenet"}})


def test_mnist_reader_roundtrip(tmp_path):
    """Write tiny IDX files and read them back through the MNIST path."""
    def write_idx(path, arr):
        with gzip.open(path, "wb") as f:
            f.write(struct.pack(">IIII", 2051, *arr.shape))
            f.write(arr.tobytes())

    train = np.random.default_rng(0).integers(0, 255, (20, 28, 28),
                                              dtype=np.uint8)
    test = np.random.default_rng(1).integers(0, 255, (10, 28, 28),
                                             dtype=np.uint8)
    write_idx(tmp_path / "train-images-idx3-ubyte.gz", train)
    write_idx(tmp_path / "t10k-images-idx3-ubyte.gz", test)

    tr, te = sources.load_mnist(str(tmp_path))
    assert tr.shape == (20, 28, 28, 1)
    np.testing.assert_array_equal(tr[..., 0], train)
    assert te.shape == (10, 28, 28, 1)


def test_cifar_reader_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(1, 6):
        data = rng.integers(0, 255, (4, 3 * 32 * 32), dtype=np.uint8)
        with open(tmp_path / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data}, f)
    with open(tmp_path / "test_batch", "wb") as f:
        pickle.dump({b"data": rng.integers(0, 255, (4, 3072),
                                           dtype=np.uint8)}, f)
    tr, te = sources.load_cifar10(str(tmp_path))
    assert tr.shape == (20, 32, 32, 3)
    assert te.shape == (4, 32, 32, 3)


def test_missing_dataset_raises_informative():
    with pytest.raises(sources.DatasetNotFoundError):
        sources.load_mnist("/tmp/definitely_missing_dir_xyz")


def test_prefetch_loader_full_iteration_parity():
    """PrefetchLoader yields exactly the underlying loader's batches."""
    from diffusion_model_universal_tpu.datasets.pipeline import PrefetchLoader
    imgs = (np.arange(32, dtype=np.uint8)[:, None, None, None]
            * np.ones((1, 4, 4, 3), np.uint8))
    aug = make_augment_fn([], [0.0], [1.0], train=False)
    base = DeviceDataLoader(imgs, batch_size=8, augment=aug, shuffle=True,
                            seed=3)
    pre = PrefetchLoader(DeviceDataLoader(imgs, batch_size=8, augment=aug,
                                          shuffle=True, seed=3))
    base.set_epoch(0)
    pre.set_epoch(0)
    a = [np.asarray(b) for b in base]
    b = [np.asarray(x) for x in pre]
    assert len(a) == len(b) == len(pre)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_prefetch_loader_abandoned_iteration_shuts_down():
    """Abandoning iteration early (e.g. `next(iter(loader))`) must not leak
    a producer thread blocked on queue.put (round-1 VERDICT weak-7)."""
    import threading
    import time as _time
    from diffusion_model_universal_tpu.datasets.pipeline import PrefetchLoader

    imgs = np.zeros((64, 4, 4, 3), np.uint8)
    aug = make_augment_fn([], [0.0], [1.0], train=False)
    n_before = threading.active_count()
    for _ in range(4):
        loader = PrefetchLoader(
            DeviceDataLoader(imgs, batch_size=4, augment=aug), depth=1)
        it = iter(loader)
        next(it)
        it.close()  # generator close — triggers the shutdown path
    deadline = _time.time() + 10
    while threading.active_count() > n_before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= n_before, "producer threads leaked"


def test_prefetch_loader_propagates_errors():
    from diffusion_model_universal_tpu.datasets.pipeline import PrefetchLoader

    class Boom(Exception):
        pass

    class FailingLoader:
        def __len__(self):
            return 3

        def __iter__(self):
            yield np.zeros((2, 4, 4, 3), np.float32)
            raise Boom()

    loader = PrefetchLoader(FailingLoader())
    with pytest.raises(Boom):
        list(loader)


def _write_fake_celeba(root, n=24):
    """Synthetic 178×218 JPEGs + official-format partition file."""
    from PIL import Image
    img_dir = root / "img_align_celeba"
    img_dir.mkdir(parents=True)
    lines = []
    yy, xx = np.mgrid[0:218, 0:178].astype(np.float32)
    for i in range(n):
        # Smooth gradients (PIL's antialiased downsample and the native
        # 2-tap bilinear agree closely only on low-frequency content).
        arr = np.stack([
            127 + 100 * np.sin(xx / 40.0 + i),
            127 + 100 * np.cos(yy / 50.0 - i * 0.3),
            127 + 60 * np.sin((xx + yy) / 70.0),
        ], axis=-1).clip(0, 255).astype(np.uint8)
        name = f"{i:06d}.jpg"
        Image.fromarray(arr).save(img_dir / name, quality=95)
        lines.append(f"{name} {0 if i < n - 8 else (1 if i < n - 4 else 2)}")
    (root / "list_eval_partition.txt").write_text("\n".join(lines) + "\n")


def test_celeba_jpeg_ingest_threaded(tmp_path):
    """The threaded decode + native crop/resize path must reproduce the
    per-image PIL reference within JPEG/bilinear tolerance and honor the
    official split file."""
    pytest.importorskip("PIL")
    from PIL import Image
    from diffusion_model_universal_tpu.datasets import sources
    from diffusion_model_universal_tpu.datasets.registry import CelebADataset

    _write_fake_celeba(tmp_path, n=24)
    ds = CelebADataset(data_dir=str(tmp_path), image_size=64,
                       transforms={"train": [], "eval": []},
                       crop_size=178)
    assert ds.train_dataset.shape == (16, 64, 64, 3)
    assert ds.val_dataset.shape == (4, 64, 64, 3)
    assert ds.test_dataset.shape == (4, 64, 64, 3)

    # Numerics vs the serial PIL reference for the first train image.
    p = tmp_path / "img_align_celeba" / "000000.jpg"
    img = Image.open(p)
    w, h = img.size
    left, top = (w - 178) // 2, (h - 178) // 2
    ref = np.asarray(img.crop((left, top, left + 178, top + 178)).resize(
        (64, 64), Image.BILINEAR), np.float32)
    got = ds.train_dataset[0].astype(np.float32)
    assert np.mean(np.abs(got - ref)) < 3.0  # bilinear impls differ slightly


def test_celeba_cache_builder_script(tmp_path):
    pytest.importorskip("PIL")
    import subprocess
    import sys
    import os
    _write_fake_celeba(tmp_path, n=12)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "scripts",
                                      "build_celeba_cache.py"),
         str(tmp_path), "--size", "32"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    assert "images/sec" in r.stdout
    with np.load(tmp_path / "celeba_32.npz") as z:
        assert z["images"].shape == (12, 32, 32, 3)
        assert z["splits"].shape == (12,)
    # load_celeba now prefers the cache (array fast-path), both at the
    # exact size and via the any-size fallback (resized downstream).
    from diffusion_model_universal_tpu.datasets import sources
    data, splits = sources.load_celeba(str(tmp_path), image_size=32)
    assert isinstance(data, np.ndarray) and data.shape[1:] == (32, 32, 3)
    # A larger request must NOT upscale the 32px cache — JPEG path again.
    data64, _ = sources.load_celeba(str(tmp_path), image_size=64)
    assert isinstance(data64, list)


def test_celeba_larger_cache_downscales_chunked(tmp_path):
    """A larger cache (celeba_128) serves a 64px request via the CHUNKED
    host resize (no one-shot f32 blow-up), preferring exact size when
    both exist."""
    from diffusion_model_universal_tpu.datasets import sources
    from diffusion_model_universal_tpu.datasets.registry import CelebADataset
    rng = np.random.default_rng(1)
    imgs128 = rng.integers(0, 255, (12, 128, 128, 3), np.uint8)
    splits = np.array([0] * 8 + [1, 1, 2, 2], np.int32)
    np.savez(tmp_path / "celeba_128.npz", images=imgs128, splits=splits)

    data, s = sources.load_celeba(str(tmp_path), image_size=64)
    assert data.shape == (12, 128, 128, 3)  # fallback hit
    ds = CelebADataset(data_dir=str(tmp_path), image_size=64,
                       transforms={"train": [], "eval": []})
    assert ds.train_dataset.shape == (8, 64, 64, 3)

    # Exact-size cache wins over the larger one.
    imgs64 = rng.integers(0, 255, (12, 64, 64, 3), np.uint8)
    np.savez(tmp_path / "celeba_64.npz", images=imgs64, splits=splits)
    data2, _ = sources.load_celeba(str(tmp_path), image_size=64)
    np.testing.assert_array_equal(data2, imgs64)


def test_host_resize_chunked_matches_oneshot():
    from diffusion_model_universal_tpu.datasets.pipeline import host_resize
    imgs = np.random.default_rng(2).integers(0, 255, (10, 16, 16, 3),
                                             np.uint8)
    a = host_resize(imgs, 8, chunk=3)   # forces 4 chunks
    b = host_resize(imgs, 8, chunk=64)  # one chunk
    np.testing.assert_array_equal(a, b)
    assert a.shape == (10, 8, 8, 3)
