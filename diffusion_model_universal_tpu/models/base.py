"""Base diffusion-model contract.

TPU-native equivalent of the reference's ``BaseDiffusion`` ABC
(`models/base_model.py:19-150`), re-shaped for JAX's functional style: the
model object holds STATIC configuration (architecture, schedules, loss
config) and exposes pure methods that take parameters and PRNG keys
explicitly. Every method is jit-safe; trainers close over the model object
and jit the resulting pure functions.

Contract (mirrors the reference's surface):
    ``init_params(rng)``                      create the parameter pytree
    ``apply(params, x, t)``                   network forward (ε / score / energy)
    ``loss_function(params, x, rng)``         scalar training loss
    ``generate_samples(params, rng, n)``      full sampler, on-device scan
    ``generate_samples_with_intermediates``   sampler + intermediate frames
    ``save(path, params)`` / ``load(path)``   model-only checkpoint
    {model_state_dict, config} schema parity with `base_model.py:119-150`.

The reference declares ``generate_samples`` abstract but its score/energy
subclasses implement ``sample`` instead, making them uninstantiable
(defect D1, SURVEY.md §2.7). Here every family implements BOTH names:
``sample`` is an alias of ``generate_samples``.
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import canonicalize_model_config

Array = jnp.ndarray
Params = Any


class BaseDiffusionModel:
    """Static model description + pure compute methods."""

    def __init__(self, config: Optional[Dict] = None):
        self.config: Dict = canonicalize_model_config(config)
        self.image_size: int = self.config.get("image_size", 32)
        self.image_channels: int = self.config.get(
            "in_channels", self.config.get("image_channels", 3))
        # Compute dtype: bf16 by default on TPU, fp32 elsewhere/tests.
        dtype_name = self.config.get("compute_dtype")
        if dtype_name is None:
            dtype_name = ("bfloat16" if jax.default_backend() == "tpu"
                          else "float32")
        self.compute_dtype = jnp.dtype(dtype_name)
        # Pallas kernels are opt-in: measured on v5e (round 2), even the
        # fully-fused GN fwd+bwd kernels lose to XLA for this UNet
        # (fwd+bwd 32.2 vs 22.0 ms at B=256/C=128) because a custom call
        # is a fusion BARRIER — XLA folds the GN statistics pass into the
        # producing conv's epilogue, which a standalone kernel cannot
        # match. See BENCH_NOTES.md "Pallas kernel status".
        self.use_pallas: bool = self.config.get("use_pallas", False)

    # -- abstract surface -------------------------------------------------
    def init_params(self, rng: Array) -> Params:
        raise NotImplementedError

    def apply(self, params: Params, x: Array, t: Array,
              train: bool = False, rng: Optional[Array] = None) -> Array:
        raise NotImplementedError

    def loss_function(self, params: Params, x: Array, rng: Array) -> Array:
        raise NotImplementedError

    def generate_samples(self, params: Params, rng: Array,
                         batch_size: int) -> Array:
        raise NotImplementedError

    def generate_samples_with_intermediates(
            self, params: Params, rng: Array, batch_size: int,
            save_interval: int = 100) -> List[Array]:
        raise NotImplementedError

    # Alias — reference's score/energy families expose `sample`
    # (`models/score_based.py:209`, `models/energy_based.py:213`).
    def sample(self, params: Params, rng: Array, batch_size: int) -> Array:
        return self.generate_samples(params, rng, batch_size)

    # -- checkpointing ----------------------------------------------------
    def save(self, path: str, params: Params) -> None:
        """Model-only checkpoint: {model_state_dict, config}
        (schema parity with reference `base_model.py:119-133`)."""
        host_params = jax.tree_util.tree_map(np.asarray, params)
        payload = {"model_state_dict": host_params, "config": self.config}
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        with open(p, "wb") as f:
            pickle.dump(payload, f)

    def load(self, path: str) -> Params:
        """Load params saved by :meth:`save` (reference `base_model.py:135-150`)."""
        with open(path, "rb") as f:
            payload = pickle.load(f)
        return jax.tree_util.tree_map(jnp.asarray, payload["model_state_dict"])

    @classmethod
    def load_with_config(cls, path: str) -> Tuple["BaseDiffusionModel", Params]:
        """Rebuild the model from the checkpoint's own config, then load."""
        with open(path, "rb") as f:
            payload = pickle.load(f)
        model = cls(payload["config"])
        params = jax.tree_util.tree_map(jnp.asarray,
                                        payload["model_state_dict"])
        return model, params

    # -- misc -------------------------------------------------------------
    def sample_shape(self, batch_size: int) -> Tuple[int, int, int, int]:
        """NHWC sample shape (the reference reads image_channels/image_size
        at sampling time, `models/ddpm.py:247-248`)."""
        return (batch_size, self.image_size, self.image_size,
                self.image_channels)

    def param_count(self, params: Params) -> int:
        return sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))

    def describe(self) -> str:
        return json.dumps({k: v for k, v in self.config.items()
                           if not isinstance(v, dict)}, indent=2)
