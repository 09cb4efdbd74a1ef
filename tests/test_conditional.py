"""Class-conditional training + classifier-free guidance (capability
superset — the reference discards dataset labels entirely and its models
are unconditional)."""

import gzip
import pickle
import struct
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_model_universal_tpu.datasets import (DeviceDataLoader,
                                                    get_dataset,
                                                    make_augment_fn)
from diffusion_model_universal_tpu.datasets import sources
from diffusion_model_universal_tpu.models import DDPM
from diffusion_model_universal_tpu.trainers import DDPMTrainer

COND = {"num_timesteps": 8, "image_size": 32, "in_channels": 3,
        "model_channels": 8, "compute_dtype": "float32", "num_classes": 10,
        "loss_config": {"use_time_weighting": False}}


def test_loader_labels_stay_aligned_under_shuffle():
    """Images whose pixel value encodes their index must arrive with the
    matching label after shuffling + augmentation."""
    n = 64
    images = np.zeros((n, 8, 8, 3), np.uint8)
    for i in range(n):
        images[i] = i
    labels = np.arange(n, dtype=np.int64)
    aug = make_augment_fn([{"name": "normalize"}], [0.5] * 3, [0.5] * 3,
                          train=True)
    loader = DeviceDataLoader(images, batch_size=16, augment=aug,
                              shuffle=True, labels=labels)
    seen = []
    for batch in loader:
        assert set(batch) == {"image", "label"}
        # invert normalize: v = (px/255 - .5)/.5  →  px = (v·.5+.5)·255
        px = np.round((np.asarray(batch["image"][:, 0, 0, 0]) * 0.5 + 0.5)
                      * 255).astype(np.int64)
        np.testing.assert_array_equal(px, np.asarray(batch["label"]))
        seen.extend(np.asarray(batch["label"]).tolist())
    assert sorted(seen) == list(range(n))  # a full permuted epoch


def test_mnist_and_cifar_label_readers(tmp_path):
    # MNIST IDX1 labels.
    labels = np.arange(20, dtype=np.uint8) % 10
    with gzip.open(tmp_path / "train-labels-idx1-ubyte.gz", "wb") as f:
        f.write(struct.pack(">II", 2049, len(labels)) + labels.tobytes())
    with gzip.open(tmp_path / "t10k-labels-idx1-ubyte.gz", "wb") as f:
        f.write(struct.pack(">II", 2049, 10) + labels[:10].tobytes())
    tr, te = sources.load_mnist_labels(str(tmp_path))
    np.testing.assert_array_equal(tr, labels)
    assert te.shape == (10,) and tr.dtype == np.int64

    # CIFAR pickle labels.
    rng = np.random.default_rng(0)
    for i in range(1, 6):
        with open(tmp_path / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": rng.integers(0, 255, (4, 3072),
                                               dtype=np.uint8),
                         b"labels": [i] * 4}, f)
    with open(tmp_path / "test_batch", "wb") as f:
        pickle.dump({b"data": rng.integers(0, 255, (4, 3072),
                                           dtype=np.uint8),
                     b"labels": [9] * 4}, f)
    trl, tel = sources.load_cifar10_labels(str(tmp_path))
    np.testing.assert_array_equal(trl, np.repeat(np.arange(1, 6), 4))
    np.testing.assert_array_equal(tel, [9] * 4)


def test_conditional_training_end_to_end(tmp_path):
    """Conditional DDPM trains through every dispatch path (single step,
    K-step scan, sharded eval) on dict batches, and CFG sampling runs."""
    cfg = {
        "model_name": "DDPM", "model_config": COND,
        "training": {"num_epochs": 1, "batch_size": 16,
                     "learning_rate": 1e-3, "ema_decay": 0.99,
                     "scheduler": {"type": "constant"}, "val_interval": 0,
                     "sample_interval": 0, "checkpoint_interval": 0,
                     "scan_steps": 2},
        "data": {"dataset": "synthetic", "data_dir": "unused",
                 "num_samples": 256},
        "logging": {"use_wandb": False, "use_tensorboard": False},
        "output": {"output_dir": str(tmp_path / "out")},
    }
    train, val, test = get_dataset(cfg)   # num_classes>0 → labeled batches
    batch = next(iter(train))
    assert isinstance(batch, dict) and batch["label"].shape == (16,)

    model = DDPM(COND)
    tr = DDPMTrainer(model, train, val, test, cfg)
    try:
        m = tr.step(batch)
        assert np.isfinite(float(m["loss"]))
        hist = tr.train(1)                # scan path (scan_steps=2)
        assert np.isfinite(hist["train_loss"])
        assert np.isfinite(tr.validate())

        y = jnp.arange(4) % 10
        s = model.generate_samples_cfg(tr.state.params,
                                       jax.random.PRNGKey(0), 4, y,
                                       guidance_scale=2.0)
        assert s.shape == model.sample_shape(4)
        assert np.isfinite(np.asarray(s)).all()
    finally:
        tr.cleanup()


def test_cfg_scale_one_equals_unconditional_at_init():
    """Zero-init label embedding ⇒ conditional sampling at scale 1.0 is
    bitwise the unconditional sampler (the conditioning pathway starts
    as a no-op, like the reference's zero-init time pathway)."""
    m = DDPM(COND)
    params = m.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(5)
    su = m.generate_samples(params, key, 4)
    sc = m.generate_samples_cfg(params, key, 4, jnp.arange(4),
                                guidance_scale=1.0)
    np.testing.assert_array_equal(np.asarray(su), np.asarray(sc))
    # DPM solver accepts labels+guidance too.
    sd = m.generate_samples_dpm(params, key, 4, num_steps=5,
                                labels=jnp.arange(4), guidance_scale=2.0)
    assert np.isfinite(np.asarray(sd)).all()


def test_make_class_labels_validation():
    """Shared label builder (generate CLI + HTTP server): valid ids give
    a full [B] array; unconditional models and out-of-range ids raise
    (XLA would clamp OOB gathers onto the NULL slot silently)."""
    import pytest

    m = DDPM(COND)
    lab = m.make_class_labels(3, 5)
    assert lab.shape == (5,) and int(lab[0]) == 3
    with pytest.raises(ValueError, match=r"\[0, 10\)"):
        m.make_class_labels(10, 5)
    with pytest.raises(ValueError, match=r"\[0, 10\)"):
        m.make_class_labels(-1, 5)
    uncond = DDPM({**COND, "num_classes": 0})
    with pytest.raises(ValueError, match="unconditional"):
        uncond.make_class_labels(0, 5)


def test_eps_fn_misuse_raises():
    """eps_fn refuses wrong-mode sampling instead of silently returning
    unconditional samples."""
    import pytest

    m = DDPM(COND)
    params = m.init_params(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="guidance_scale requires labels"):
        m.eps_fn(params, None, guidance_scale=2.0)
    uncond = DDPM({**COND, "num_classes": 0})
    pu = uncond.init_params(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="unconditional"):
        uncond.eps_fn(pu, jnp.arange(4))
