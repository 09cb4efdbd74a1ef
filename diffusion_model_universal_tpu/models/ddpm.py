"""DDPM — Denoising Diffusion Probabilistic Model (Ho et al. 2020).

TPU-native re-design of the reference DDPM (`models/ddpm.py:137-328`).
Capability parity:

* Linear β schedule with ``betas``/``alphas``/``alphas_cumprod``
  (reference `ddpm.py:176-178`) — precomputed arrays in
  :class:`..models.schedules.NoiseSchedule`.
* Training: t ~ U[0,T), ε ~ N(0,I), x_t = √ᾱ_t·x + √(1−ᾱ_t)·ε, predict ε,
  flexible config-driven loss (reference `ddpm.py:207-235`).
* Ancestral sampling over all T steps with posterior variance β̃
  (reference `ddpm.py:237-255`) — here ONE `jax.lax.scan` compiled
  on-device, instead of T sequential Python-level UNet calls
  (`ddpm.py:251-253`), which is the reference's #1 sampling bottleneck.
* Intermediates variant saving every ``save_interval`` steps
  (reference `ddpm.py:257-284`) — chunked scans with static boundaries.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ..utils.losses import DiffusionLoss
from .base import Array, BaseDiffusionModel, Params
from .schedules import (ddpm_posterior_step, make_dpm_solver_params,
                        make_noise_schedule, q_sample)
from .unet import UNet


class DDPM(BaseDiffusionModel):
    """DDPM model family.

    Config keys (canonical, with reference-YAML aliases accepted):
        beta_start, beta_end, num_timesteps (alias time_steps),
        in_channels (alias image_channels), model_channels (alias
        hidden_channels), image_size, dropout, loss_type, loss_config.
    """

    def __init__(self, config: Optional[Dict] = None):
        super().__init__(config)
        cfg = self.config
        self.beta_start = cfg.get("beta_start", 1e-4)
        self.beta_end = cfg.get("beta_end", 2e-2)
        self.num_timesteps = cfg.get("num_timesteps", 1000)
        self.schedule = make_noise_schedule(
            self.beta_start, self.beta_end, self.num_timesteps,
            cfg.get("schedule_type", "linear"))

        in_ch = cfg.get("in_channels", 3)
        self.net = UNet(
            in_channels=in_ch,
            model_channels=cfg.get("model_channels", 64),
            out_channels=in_ch,
            dropout=cfg.get("dropout", 0.0),
            dtype=self.compute_dtype,
            use_pallas=self.use_pallas,
            remat=cfg.get("remat", True),
        )
        self.loss_fn = DiffusionLoss(
            loss_type=cfg.get("loss_type", "mse"),
            loss_config=cfg.get("loss_config", {}),
            num_timesteps=self.num_timesteps,
            alphas_cumprod=self.schedule.alphas_cumprod)

    # -- core pure functions ---------------------------------------------
    def init_params(self, rng: Array) -> Params:
        x = jnp.zeros(self.sample_shape(1), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        return self.net.init(rng, x, t)["params"]

    def apply(self, params: Params, x: Array, t: Array,
              train: bool = False, rng: Optional[Array] = None) -> Array:
        """Predict ε for noisy input x_t (reference `ddpm.py:193-205`)."""
        rngs = {"dropout": rng} if (train and rng is not None) else None
        return self.net.apply({"params": params}, x, t,
                              deterministic=not train, rngs=rngs)

    def loss_function(self, params: Params, x: Array, rng: Array) -> Array:
        """ε-prediction training loss (reference `ddpm.py:207-235`)."""
        kt, kn, kd = jax.random.split(rng, 3)
        b = x.shape[0]
        t = jax.random.randint(kt, (b,), 0, self.num_timesteps)
        noise = jax.random.normal(kn, x.shape, x.dtype)
        noisy_x = q_sample(self.schedule, x, t, noise)
        pred = self.apply(params, noisy_x, t, train=True, rng=kd)
        return self.loss_fn(pred, noise, t)

    # -- sampling ---------------------------------------------------------
    def _denoise_range(self, params: Params, x: Array, rng: Array,
                       t_hi: int, t_lo: int) -> Array:
        """Run reverse diffusion from t_hi−1 down to t_lo as one scan."""
        steps = t_hi - t_lo
        b = x.shape[0]

        def body(carry, inp):
            x, key = carry
            t_scalar = inp
            key, k_eps = jax.random.split(key)
            t_b = jnp.full((b,), t_scalar, jnp.int32)
            eps_pred = self.apply(params, x, t_b)
            noise = jax.random.normal(k_eps, x.shape, x.dtype)
            x = ddpm_posterior_step(self.schedule, x, t_b, eps_pred, noise)
            return (x, key), None

        ts = jnp.arange(t_hi - 1, t_lo - 1, -1, dtype=jnp.int32)
        (x, _), _ = jax.lax.scan(body, (x, rng), ts, length=steps)
        return x

    @functools.partial(jax.jit, static_argnames=("self", "batch_size"))
    def generate_samples(self, params: Params, rng: Array,
                         batch_size: int) -> Array:
        """Full T-step ancestral sampler (reference `ddpm.py:237-255`),
        one fused on-device scan, NHWC output in [-1, 1]-ish range."""
        k_init, k_loop = jax.random.split(rng)
        x = jax.random.normal(k_init, self.sample_shape(batch_size))
        return self._denoise_range(params, x, k_loop, self.num_timesteps, 0)

    @functools.partial(jax.jit,
                       static_argnames=("self", "batch_size", "num_steps"))
    def generate_samples_dpm(self, params: Params, rng: Array,
                             batch_size: int, num_steps: int = 20) -> Array:
        """DPM-Solver++(2M) fast deterministic sampler (Lu et al. 2022,
        arXiv:2211.01095) — capability superset of the reference, whose
        fastest path is DDIM-50 (`models/ddim.py:128-188`).

        Second-order multistep ODE solver in x₀-parameterization on the
        model's own discrete schedule: one ε-prediction per step, S−1
        updates over a λ (half-log-SNR) grid, all inside one `lax.scan`.
        For models whose x₀-prediction is smooth in λ (any trained
        denoiser), the 2M correction tracks the reverse ODE far closer
        than a first-order (DDIM) grid of the same size — solver order
        is pinned against an analytic Gaussian-posterior model in
        `tests/test_models.py::test_dpm_solver_second_order_convergence`.
        """
        p = make_dpm_solver_params(self.schedule, num_steps)
        b = batch_size
        # Same key convention as the other samplers: initial noise from
        # the first split — the deterministic solver needs no loop keys,
        # but sharing the convention makes cross-sampler comparisons
        # (same rng → same x_T) possible.
        k_init, _ = jax.random.split(rng)
        x = jax.random.normal(k_init, self.sample_shape(b))

        def x0_of(x, j):
            t_b = jnp.full((b,), p.timesteps[j], jnp.int32)
            eps = self.apply(params, x, t_b)
            x0 = (x - p.sigma[j] * eps) / p.alpha[j]
            return jnp.clip(x0, -1.0, 1.0)  # same thresholding as DDIM

        def body(carry, j):
            x, x0_prev, h_prev = carry
            x0 = x0_of(x, j - 1)            # model eval at the PREV time
            h = p.lam[j] - p.lam[j - 1]
            # 2M correction: linear extrapolation of x0(λ) through the
            # last two evals ⇒ D = (1+c)·x0 − c·x0_prev with
            # c = h/(2·h_prev). The first step (h_prev == 0) degenerates
            # to the 1st-order (DDIM-like) update D = x0.
            c = jnp.where(h_prev > 0.0, h / (2.0 * h_prev), 0.0)
            D = (1.0 + c) * x0 - c * x0_prev
            x = (p.sigma[j] / p.sigma[j - 1]) * x \
                - p.alpha[j] * jnp.expm1(-h) * D
            return (x, x0, h), None

        (x, _, _), _ = jax.lax.scan(
            body, (x, jnp.zeros_like(x), jnp.asarray(0.0)),
            jnp.arange(1, num_steps))
        return x

    def generate_samples_with_intermediates(
            self, params: Params, rng: Array, batch_size: int,
            save_interval: int = 100) -> List[Array]:
        """Sampler that also returns intermediate frames.

        Reference `ddpm.py:257-284`: frames at the initial noise and after
        each step with t % save_interval == 0 (t=0 always included). The
        chunk boundaries are static Python ints, so each chunk is one scan
        and jit caching works across calls.
        """
        k_init, k_loop = jax.random.split(rng)
        x = jax.random.normal(k_init, self.sample_shape(batch_size))
        frames = [x]
        T = self.num_timesteps
        # Save points: after processing t for t in {k·save_interval} ∪ {0}.
        save_ts = sorted({t for t in range(0, T, save_interval)} | {0},
                         reverse=True)
        t_hi = T
        keys = jax.random.split(k_loop, len(save_ts))
        for key, t_save in zip(keys, save_ts):
            x = self._denoise_range(params, x, key, t_hi, t_save)
            frames.append(x)
            t_hi = t_save
        return frames
