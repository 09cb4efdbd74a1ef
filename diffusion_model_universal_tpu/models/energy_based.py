"""Energy-based diffusion model.

TPU-native re-design of the reference (`models/energy_based.py:23-295`),
implementing the INTENDED design (defects D1/D6 resolved):

* EnergyNet: 3 convs (C, 2C, 4C) with GroupNorm(8) on the first two, SiLU
  activations, global average pool, Dense→scalar energy
  (reference `energy_based.py:42-85`).
* Time conditioning: the reference inflates ``in_channels`` by
  ``model_channels`` when ``use_time_conditioning`` (`energy_based.py:136-138`)
  but provides no concat path and EnergyNet.forward takes no ``t``
  (defect D6). Here a sinusoidal time embedding is broadcast over H×W and
  concatenated as extra input channels — the design the inflated channel
  count implies.
* Training: DDPM-style q-sample → Langevin MCMC negatives →
  contrastive-divergence + gradient-penalty loss
  (reference `energy_based.py:179-211`). The reference's
  ``torch.autograd.grad``-in-the-loop becomes `jax.grad` of the pure energy
  inside a `lax.scan` (rematerialized to bound memory); the reference's
  no_grad-at-sampling pitfall (trainer sampled under ``torch.no_grad()``
  while Langevin needs autograd, `trainers/energy_based_trainer.py:81`)
  cannot occur in JAX.
* Sampling: reverse sweep over T noise levels with per-level Langevin and
  inter-level noise re-injection (reference `energy_based.py:213-248`),
  one nested scan on-device.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.losses import DiffusionLoss, energy_based_loss
from .base import Array, BaseDiffusionModel, Params
from .layers.embeddings import sinusoidal_embedding
from .schedules import ddpm_posterior_step, make_noise_schedule, q_sample

from ..ops.group_norm import group_norm_silu


class EnergyNet(nn.Module):
    """Scalar-energy CNN (reference `energy_based.py:42-85`), NHWC.

    Lower energy ⇒ higher model probability.
    """

    model_channels: int = 64
    time_conditioning: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, t: Optional[Array] = None) -> Array:
        b, h, w, _ = x.shape
        if self.time_conditioning and t is not None:
            # Broadcast a sinusoidal t-embedding over space as extra
            # channels (the intended use of the reference's inflated
            # in_channels, `energy_based.py:136-138`).
            t_emb = sinusoidal_embedding(t, self.model_channels)
            t_map = jnp.broadcast_to(t_emb[:, None, None, :],
                                     (b, h, w, self.model_channels))
            x = jnp.concatenate([x, t_map.astype(x.dtype)], axis=-1)

        c = self.model_channels
        conv = lambda ch, name: nn.Conv(ch, (3, 3), padding="SAME",
                                        dtype=self.dtype, name=name)
        gn = lambda ch, name: (
            lambda z: group_norm_silu(
                z,
                self.param(f"{name}_scale", nn.initializers.ones, (ch,)),
                self.param(f"{name}_bias", nn.initializers.zeros, (ch,)),
                num_groups=8, apply_silu=True))

        h1 = gn(c, "norm1")(conv(c, "conv1")(x.astype(self.dtype)))
        h2 = gn(c * 2, "norm2")(conv(c * 2, "conv2")(h1))
        h3 = nn.silu(conv(c * 4, "conv3")(h2))
        pooled = jnp.mean(h3, axis=(1, 2))
        energy = nn.Dense(1, dtype=self.dtype, name="dense")(pooled)
        return jnp.squeeze(energy, -1).astype(jnp.float32)


class EnergyBasedDiffusion(BaseDiffusionModel):
    """Energy-based diffusion with Langevin MCMC training and sampling."""

    def __init__(self, config: Optional[Dict] = None):
        super().__init__(config)
        cfg = self.config
        noise_cfg = cfg.get("noise_schedule", {}) or {}
        self.num_timesteps = cfg.get(
            "num_timesteps", noise_cfg.get("timesteps", 1000))
        self.beta_start = cfg.get("beta_start",
                                  noise_cfg.get("beta_start", 1e-4))
        self.beta_end = cfg.get("beta_end", noise_cfg.get("beta_end", 2e-2))
        self.schedule = make_noise_schedule(
            self.beta_start, self.beta_end, self.num_timesteps,
            noise_cfg.get("type", cfg.get("schedule_type", "linear")))

        self.use_time_conditioning = cfg.get("use_time_conditioning", True)
        self.net = EnergyNet(
            model_channels=cfg.get("model_channels", 64),
            time_conditioning=self.use_time_conditioning,
            dtype=self.compute_dtype)

        loss_type = cfg.get("loss_type", "energy_based")
        self.energy_scale = cfg.get("energy_scale", 1.0)
        self.regularization_weight = cfg.get("regularization_weight", 0.1)
        if loss_type == "energy_based":
            self.loss_fn = None  # use the pure CD+GP function
        else:
            self.loss_fn = DiffusionLoss(
                loss_type, cfg.get("loss_config", {}),
                num_timesteps=self.num_timesteps,
                alphas_cumprod=self.schedule.alphas_cumprod)

        self.langevin_steps = cfg.get("langevin_steps", 10)
        self.langevin_step_size = cfg.get("langevin_step_size", 0.01)
        # Training objective: "cd" (reference parity — contrastive
        # divergence with Langevin negatives + gradient penalty,
        # `energy_based.py:179-211`) or "dsm" (energy-parameterized
        # denoising score matching: train −∇ₓE(x_t,t) to match the
        # Gaussian-perturbation score, i.e. √(1−ᾱ_t)·∇ₓE regresses onto
        # ε — the unit-scale ε-prediction objective with the score
        # realized as an energy gradient; see e.g. Salimans & Ho 2021,
        # arXiv:2101.03288 "How to Train Your Energy-Based Models" §3).
        # The GP term's 1-Lipschitz pressure makes CD energies unable to
        # represent the ~1/σ score magnitudes sampling needs at small σ,
        # so CD grids stay noisy; DSM is the principled route to sample
        # quality while keeping E(x,t) a genuine scalar energy.
        self.training_objective = cfg.get("training_objective", "cd")
        if self.training_objective not in ("cd", "dsm"):
            raise ValueError(
                "training_objective must be 'cd' or 'dsm', got "
                f"{self.training_objective!r}")

    def init_params(self, rng: Array) -> Params:
        x = jnp.zeros(self.sample_shape(1), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        return self.net.init(rng, x, t)["params"]

    def apply(self, params: Params, x: Array,
              t: Optional[Array] = None, train: bool = False,
              rng: Optional[Array] = None) -> Array:
        """Energy E(x[, t]) of shape [B] (reference `energy_based.py:162-177`)."""
        return self.net.apply({"params": params}, x, t)

    def _langevin(self, params: Params, x: Array, t: Array,
                  rng: Array) -> Array:
        """Langevin MCMC: x ← x − λ·∇E + √(2λ)·z, ``langevin_steps`` times
        (reference `energy_based.py:250-277`). The chain carries no
        gradient to the parameters (reference detaches each step)."""
        step = self.langevin_step_size

        def energy_sum(z):
            return jnp.sum(self.apply(params, z, t))

        def body(x, k):
            grad = jax.grad(energy_sum)(x)
            noise = jax.random.normal(k, x.shape, x.dtype)
            x = x - step * grad + jnp.sqrt(2.0 * step) * noise
            return x, None

        keys = jax.random.split(rng, self.langevin_steps)
        x, _ = jax.lax.scan(jax.checkpoint(body), x, keys)
        return jax.lax.stop_gradient(x)

    def loss_function(self, params: Params, x: Array, rng: Array) -> Array:
        """CD + gradient-penalty loss with Langevin negatives
        (reference `energy_based.py:179-211`)."""
        if isinstance(x, dict):  # labeled batch; this family is unconditional
            x = x["image"]
        kt, kn, kl, kg = jax.random.split(rng, 4)
        b = x.shape[0]
        t = jax.random.randint(kt, (b,), 0, self.num_timesteps)
        noise = jax.random.normal(kn, x.shape, x.dtype)
        x_noisy = q_sample(self.schedule, x, t, noise)
        if self.training_objective == "dsm":
            eps_pred = self._eps_from_energy(params, x_noisy, t)
            return jnp.mean((eps_pred - noise) ** 2)
        x_fake = self._langevin(params, x_noisy, t, kl)

        energy_fn = lambda z: self.energy_scale * self.apply(params, z, t)
        if self.loss_fn is None:
            return energy_based_loss(energy_fn, x, x_fake, kg,
                                     self.regularization_weight)
        # Diffusion-style losses compare real/fake energies, weighted
        # per-sample (reference `energy_based.py:205-211`).
        return self.loss_fn(energy_fn(x), energy_fn(x_fake), t)  # [B] inputs

    def _eps_from_energy(self, params: Params, x: Array, t: Array) -> Array:
        """ε̂ = √(1−ᾱ_t)·∇ₓE(x,t).

        The Gaussian-perturbation score is −ε/√(1−ᾱ_t); with the model
        score defined as −∇ₓE, matching them gives ∇ₓE = ε/√(1−ᾱ_t).
        Scaling by √(1−ᾱ_t) turns the energy gradient into a unit-scale
        ε-prediction usable by both the DSM loss and ancestral sampling.
        """
        def energy_sum(z):
            return jnp.sum(self.apply(params, z, t))

        sigma = jnp.sqrt(1.0 - self.schedule.alphas_cumprod[t])
        return sigma[:, None, None, None] * jax.grad(energy_sum)(x)

    # -- sampling ---------------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("self", "batch_size"))
    def generate_samples(self, params: Params, rng: Array,
                         batch_size: int) -> Array:
        """Reverse sweep over the noise schedule: annealed Langevin for
        CD models (reference `energy_based.py:213-248`); the DDPM
        ancestral chain on ε̂ = √(1−ᾱ)·∇ₓE for DSM-trained energies."""
        if self.training_objective == "dsm":
            k_init, k_loop = jax.random.split(rng)
            x = jax.random.normal(k_init, self.sample_shape(batch_size))
            return self._ancestral_range(params, x, k_loop,
                                         self.num_timesteps, 0, batch_size)
        k_init, k_loop = jax.random.split(rng)
        x = jax.random.normal(k_init, self.sample_shape(batch_size))
        ac = self.schedule.alphas_cumprod

        def body(carry, inp):
            x, = carry
            t_scalar, key = inp
            k_lang, k_noise = jax.random.split(key)
            t_b = jnp.full((batch_size,), t_scalar, jnp.int32)
            x = self._langevin(params, x, t_b, k_lang)
            # Inter-level noise re-injection for t > 0.
            alpha = ac[t_scalar]
            alpha_next = ac[jnp.maximum(t_scalar - 1, 0)]
            sigma = jnp.sqrt((1 - alpha_next) / (1 - alpha)) * jnp.sqrt(
                jnp.maximum(1 - alpha / alpha_next, 0.0))
            noise = jax.random.normal(k_noise, x.shape, x.dtype)
            x_next = jnp.sqrt(alpha_next / alpha) * x + sigma * noise
            x = jnp.where(t_scalar > 0, x_next, x)
            return (x,), None

        ts = jnp.arange(self.num_timesteps - 1, -1, -1, dtype=jnp.int32)
        keys = jax.random.split(k_loop, self.num_timesteps)
        (x,), _ = jax.lax.scan(body, (x,), (ts, keys))
        return x

    def generate_samples_with_intermediates(
            self, params: Params, rng: Array, batch_size: int,
            save_interval: int = 100) -> List[Array]:
        """Frames every ``save_interval`` noise levels."""
        k_init, k_loop = jax.random.split(rng)
        x = jax.random.normal(k_init, self.sample_shape(batch_size))
        frames = [x]
        T = self.num_timesteps
        save_ts = sorted({v for v in range(0, T, save_interval)} | {0},
                         reverse=True)
        t_hi = T
        keys = jax.random.split(k_loop, len(save_ts))
        sweep = (self._ancestral_range
                 if self.training_objective == "dsm" else self._sweep_range)
        for key, t_save in zip(keys, save_ts):
            x = sweep(params, x, key, t_hi, t_save, batch_size)
            frames.append(x)
            t_hi = t_save
        return frames

    @functools.partial(jax.jit,
                       static_argnames=("self", "t_hi", "t_lo", "batch_size"))
    def _ancestral_range(self, params: Params, x: Array, rng: Array,
                         t_hi: int, t_lo: int, batch_size: int) -> Array:
        """DDPM Algorithm-2 steps t_hi−1 … t_lo on the energy's ε̂."""
        def body(carry, inp):
            x, = carry
            t_scalar, key = inp
            t_b = jnp.full((batch_size,), t_scalar, jnp.int32)
            eps = self._eps_from_energy(params, x, t_b)
            noise = jax.random.normal(key, x.shape, x.dtype)
            x = ddpm_posterior_step(self.schedule, x, t_b, eps, noise)
            return (x,), None

        ts = jnp.arange(t_hi - 1, t_lo - 1, -1, dtype=jnp.int32)
        keys = jax.random.split(rng, t_hi - t_lo)
        (x,), _ = jax.lax.scan(body, (x,), (ts, keys))
        return x

    @functools.partial(jax.jit,
                       static_argnames=("self", "t_hi", "t_lo", "batch_size"))
    def _sweep_range(self, params: Params, x: Array, rng: Array,
                     t_hi: int, t_lo: int, batch_size: int) -> Array:
        ac = self.schedule.alphas_cumprod

        def body(carry, inp):
            x, = carry
            t_scalar, key = inp
            k_lang, k_noise = jax.random.split(key)
            t_b = jnp.full((batch_size,), t_scalar, jnp.int32)
            x = self._langevin(params, x, t_b, k_lang)
            alpha = ac[t_scalar]
            alpha_next = ac[jnp.maximum(t_scalar - 1, 0)]
            sigma = jnp.sqrt((1 - alpha_next) / (1 - alpha)) * jnp.sqrt(
                jnp.maximum(1 - alpha / alpha_next, 0.0))
            noise = jax.random.normal(k_noise, x.shape, x.dtype)
            x_next = jnp.sqrt(alpha_next / alpha) * x + sigma * noise
            x = jnp.where(t_scalar > 0, x_next, x)
            return (x,), None

        ts = jnp.arange(t_hi - 1, t_lo - 1, -1, dtype=jnp.int32)
        keys = jax.random.split(rng, t_hi - t_lo)
        (x,), _ = jax.lax.scan(body, (x,), (ts, keys))
        return x
