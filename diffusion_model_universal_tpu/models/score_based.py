"""Score-based generative model (NCSN-style, Song & Ermon).

TPU-native re-design of the reference (`models/score_based.py:25-250`),
implementing the INTENDED design (SURVEY.md defects D1/D3/D5 resolved):

* ScoreNet = the shared UNet conditioned on log σ through a small MLP
  (``continuous_sigma=True`` on :class:`..models.unet.UNet`) — the
  reference's ScoreNet.forward referenced attributes that don't exist
  (`score_based.py:84-99`, defect D3); here it is simply the UNet with a
  different embedding.
* Training: σ = σ_min·(σ_max/σ_min)^u with u~U[0,1], perturb, predict score,
  DSM loss against −ε/σ for the SAME ε (fixing defect D5)
  (reference `score_based.py:180-207`).
* Sampling: annealed Langevin dynamics over a geometric σ ladder —
  ``num_scales`` outer levels × ``langevin_steps`` inner steps with step
  size (σ·β)²·2 (reference `score_based.py:209-247`) — expressed as a
  nested `lax.scan`, 10,000 network evals fully on-device.
* Implements both ``sample`` and ``generate_samples`` (fixing defect D1).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ..utils.losses import DiffusionLoss, score_matching_loss
from .base import Array, BaseDiffusionModel, Params
from .schedules import continuous_sigma, sigma_ladder
from .unet import UNet


class ScoreBasedDiffusion(BaseDiffusionModel):
    """Score-based diffusion with annealed Langevin sampling."""

    def __init__(self, config: Optional[Dict] = None):
        super().__init__(config)
        cfg = self.config
        self.sigma_min = cfg.get("sigma_min", 0.01)
        self.sigma_max = cfg.get("sigma_max", 50.0)
        self.num_scales = cfg.get("num_scales", 1000)
        self.beta = cfg.get("beta", 1.0)  # sampling temperature
        self.langevin_steps = cfg.get("langevin_steps", 10)
        # Optional Tweedie denoising step after the ladder
        # (x += σ_min²·score — "Technique 5" of Song & Ermon 2020,
        # arXiv:2006.09011): removes the σ_min-scale residual noise from
        # the final Langevin iterate. Off by default (reference parity —
        # its sampler stops at the last noisy iterate,
        # `score_based.py:235-247`).
        self.final_denoise = bool(cfg.get("final_denoise", False))

        in_ch = cfg.get("in_channels", 3)
        self.net = UNet(
            in_channels=in_ch,
            model_channels=cfg.get("model_channels", 64),
            out_channels=in_ch,
            dropout=cfg.get("dropout", 0.0),
            dtype=self.compute_dtype,
            use_pallas=self.use_pallas,
            continuous_sigma=True,
            remat=cfg.get("remat", True),
            remat_policy=cfg.get("remat_policy", None),
        )
        # DSM weighting: "none" = reference parity; "sigma2" = the
        # NCSN λ(σ)=σ² objective (see utils.losses.score_matching_loss).
        self.dsm_weighting = cfg.get("dsm_weighting", "none")
        # Score parameterization: "raw" (reference parity — the UNet
        # output IS the score, `score_based.py:165-177`) or "sigma"
        # (NCSNv2 Technique 3, arXiv:2006.09011: s_θ(x,σ) = f_θ(x)/σ).
        # With a geometric σ ladder spanning σ_max/σ_min ≈ 10³-10⁴ the
        # true score magnitude ~1/σ covers 3-4 decades; a raw net
        # underpredicts at small σ and annealed Langevin stalls with
        # residual noise. Dividing by σ makes the net's regression
        # target −ε (unit scale at EVERY level) under λ(σ)=σ² weighting.
        self.score_parameterization = cfg.get("score_parameterization",
                                              "raw")
        if self.score_parameterization not in ("raw", "sigma"):
            raise ValueError(
                "score_parameterization must be 'raw' or 'sigma', got "
                f"{self.score_parameterization!r}")
        loss_type = cfg.get("loss_type", "score_matching")
        if loss_type == "score_matching":
            self.loss_fn = None  # use the pure DSM function
        else:
            self.loss_fn = DiffusionLoss(loss_type,
                                         cfg.get("loss_config", {}),
                                         num_timesteps=self.num_scales)

    def init_params(self, rng: Array) -> Params:
        x = jnp.zeros(self.sample_shape(1), jnp.float32)
        sigma = jnp.ones((1,), jnp.float32)
        return self.net.init(rng, x, sigma)["params"]

    def apply(self, params: Params, x: Array, sigma: Array,
              train: bool = False, rng: Optional[Array] = None) -> Array:
        """Predict the score ∇_x log p_σ(x) (reference `score_based.py:165-177`)."""
        rngs = {"dropout": rng} if (train and rng is not None) else None
        out = self.net.apply({"params": params}, x, sigma,
                             deterministic=not train, rngs=rngs)
        if self.score_parameterization == "sigma":
            out = out / sigma[:, None, None, None].astype(out.dtype)
        return out

    def loss_function(self, params: Params, x: Array, rng: Array) -> Array:
        """DSM loss at geometric random noise levels
        (reference `score_based.py:179-207`)."""
        if isinstance(x, dict):  # labeled batch; this family is unconditional
            x = x["image"]
        ku, kn, kd = jax.random.split(rng, 3)
        b = x.shape[0]
        u = jax.random.uniform(ku, (b,))
        sigma = continuous_sigma(self.sigma_min, self.sigma_max, u)
        noise = jax.random.normal(kn, x.shape, x.dtype)
        noisy_x = x + sigma[:, None, None, None] * noise
        score = self.apply(params, noisy_x, sigma, train=True, rng=kd)
        if self.loss_fn is None:
            return score_matching_loss(score, noise, sigma,
                                       weighting=self.dsm_weighting)
        # Alternative config-driven losses operate on (score, target).
        target = -noise / sigma[:, None, None, None]
        return self.loss_fn(score, target)

    # -- sampling ---------------------------------------------------------
    def _langevin_level(self, params: Params, x: Array, sigma: Array,
                        key: Array, batch_size: int) -> Array:
        """``langevin_steps`` Langevin updates at one noise level σ.

        Step size (σ·β)²·2 as in the reference (`score_based.py:235-245`).
        """
        step_size = (sigma * self.beta) ** 2 * 2.0
        sigma_b = jnp.full((batch_size,), sigma)

        def body(carry, k):
            x = carry
            score = self.apply(params, x, sigma_b)
            noise = jax.random.normal(k, x.shape, x.dtype)
            x = x + step_size * score + jnp.sqrt(step_size * 2.0) * noise
            return x, None

        keys = jax.random.split(key, self.langevin_steps)
        x, _ = jax.lax.scan(jax.checkpoint(body), x, keys)
        return x

    @functools.partial(jax.jit, static_argnames=("self", "batch_size"))
    def generate_samples(self, params: Params, rng: Array,
                         batch_size: int) -> Array:
        """Annealed Langevin sampler (reference `score_based.py:209-247`):
        outer scan over the σ ladder, inner scan over Langevin steps."""
        k_init, k_loop = jax.random.split(rng)
        x = jax.random.normal(k_init, self.sample_shape(batch_size))
        sigmas = sigma_ladder(self.sigma_min, self.sigma_max, self.num_scales)

        def outer(carry, inp):
            x, = carry
            sigma, key = inp
            x = self._langevin_level(params, x, sigma, key, batch_size)
            return (x,), None

        keys = jax.random.split(k_loop, self.num_scales)
        (x,), _ = jax.lax.scan(outer, (x,), (sigmas, keys))
        return self._maybe_final_denoise(params, x, batch_size)

    def _maybe_final_denoise(self, params: Params, x: Array,
                             batch_size: int) -> Array:
        if not self.final_denoise:
            return x
        sigma_b = jnp.full((batch_size,), self.sigma_min)
        return x + self.sigma_min ** 2 * self.apply(params, x, sigma_b)

    def generate_samples_with_intermediates(
            self, params: Params, rng: Array, batch_size: int,
            save_interval: int = 100) -> List[Array]:
        """Frames after every ``save_interval`` σ-levels."""
        k_init, k_loop = jax.random.split(rng)
        x = jax.random.normal(k_init, self.sample_shape(batch_size))
        sigmas = sigma_ladder(self.sigma_min, self.sigma_max, self.num_scales)
        frames = [x]
        keys = jax.random.split(k_loop, self.num_scales)
        for start in range(0, self.num_scales, save_interval):
            end = min(start + save_interval, self.num_scales)
            x = self._run_levels(params, x, sigmas[start:end],
                                 keys[start:end], batch_size)
            frames.append(x)
        return frames

    @functools.partial(jax.jit, static_argnames=("self", "batch_size"))
    def _run_levels(self, params: Params, x: Array, sigmas: Array,
                    keys: Array, batch_size: int) -> Array:
        def outer(carry, inp):
            x, = carry
            sigma, key = inp
            x = self._langevin_level(params, x, sigma, key, batch_size)
            return (x,), None

        (x,), _ = jax.lax.scan(outer, (x,), (sigmas, keys))
        return x
