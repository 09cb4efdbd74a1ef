"""Pure-JAX VGG16 feature stack for the perceptual loss.

The reference's PerceptualLoss uses ImageNet VGG16 features at
relu1_2 / relu2_2 / relu3_3 (`/root/reference/utils/losses.py:183-216`).
This is the jit-friendly equivalent: the first 7 conv layers of
torchvision's ``vgg16().features`` as pure functions over a params list.

Offline weight provisioning (zero-egress env):
    python scripts/convert_weights.py vgg16 <vgg16-*.pth> <out.npz>
then ``DMU_VGG16_WEIGHTS=/path/to/vgg16.npz`` (or pass ``weights_path``).
Without weights, `utils.losses.PerceptualLoss` falls back to seeded
random features (a standard proxy that preserves ordering).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# (torchvision features index, cin, cout); maxpool after conv1_2, conv2_2.
_CONVS = [
    (0, 3, 64), (2, 64, 64),          # conv1_1, conv1_2   → relu1_2
    (5, 64, 128), (7, 128, 128),      # conv2_1, conv2_2   → relu2_2
    (10, 128, 256), (12, 256, 256), (14, 256, 256),  # conv3_* → relu3_3
]
# Feature taps after these conv positions (0-indexed into _CONVS).
_TAPS = (1, 3, 6)
# Maxpool BEFORE these conv positions.
_POOL_BEFORE = (2, 4)


def init_vgg16_params(key: Array) -> List[Tuple[Array, Array]]:
    """He-init [(w HWIO, b)] with exact torchvision shapes."""
    out = []
    for i, (_, cin, cout) in enumerate(_CONVS):
        k = jax.random.fold_in(key, i)
        w = jax.random.normal(k, (3, 3, cin, cout)) * (2.0 / (9 * cin)) ** 0.5
        out.append((w, jnp.zeros((cout,))))
    return out


def convert_torch_vgg16(state_dict) -> List[Tuple[Array, Array]]:
    """torchvision ``vgg16`` state_dict → params list (OIHW → HWIO)."""
    def arr(v):
        return np.asarray(getattr(v, "numpy", lambda: v)())

    out = []
    for idx, _, _ in _CONVS:
        w = arr(state_dict[f"features.{idx}.weight"]).transpose(2, 3, 1, 0)
        b = arr(state_dict[f"features.{idx}.bias"])
        out.append((jnp.asarray(w), jnp.asarray(b)))
    return out


def save_vgg16_npz(params, path: str) -> None:
    flat = {}
    for i, (w, b) in enumerate(params):
        flat[f"conv{i}/w"] = np.asarray(w)
        flat[f"conv{i}/b"] = np.asarray(b)
    np.savez(path, **flat)


def load_vgg16_params(path: str) -> List[Tuple[Array, Array]]:
    if path.endswith(".npz"):
        flat = np.load(path)
        return [(jnp.asarray(flat[f"conv{i}/w"]),
                 jnp.asarray(flat[f"conv{i}/b"]))
                for i in range(len(_CONVS))]
    import torch
    return convert_torch_vgg16(
        torch.load(path, map_location="cpu", weights_only=True))


def vgg16_features(params, x: Array) -> List[Array]:
    """ImageNet-normalized NHWC input → [relu1_2, relu2_2, relu3_3]."""
    feats = []
    h = x
    for i, (w, b) in enumerate(params):
        if i in _POOL_BEFORE:
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        h = jax.lax.conv_general_dilated(
            h, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        h = jax.nn.relu(h)
        if i in _TAPS:
            feats.append(h)
    return feats
