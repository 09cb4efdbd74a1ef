"""DDIM — Denoising Diffusion Implicit Models (Song et al. 2021).

TPU-native re-design of the reference DDIM (`models/ddim.py:20-188`):
trains exactly like DDPM (same loss) but samples in ``ddim_sampling_steps``
(default 50) deterministic (η=0) or stochastic (η>0) steps.

Capability parity with fixes:
* Timestep selection by 'uniform' (stride T//S) or 'quad' spacing
  (reference `ddim.py:49-65`).
* Precomputed ᾱ/ᾱ_prev/σ/√(1−ᾱ) buffers with η-controlled σ
  (reference `ddim.py:67-81`).
* One-step update: ε̂ → clamped x₀-estimate → direction term → optional
  clamped noise (reference `ddim.py:83-126`).
* Buffers are indexed by step POSITION, fixing defect D4 (the reference
  indexed length-S buffers with raw timesteps t∈[0,T), `ddim.py:97-100`).
* The whole S-step sampler is one `jax.lax.scan` on-device.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from .base import Array, Params
from .ddpm import DDPM
from .schedules import ddim_step, make_ddim_params


class DDIM(DDPM):
    """DDIM model family (training inherited from DDPM)."""

    def __init__(self, config: Optional[Dict] = None):
        super().__init__(config)
        cfg = self.config
        # Clamp S ≤ T so the 'uniform' stride T//S is ≥ 1 (the reference
        # divides by zero when configured with S > T, `ddim.py:57`).
        self.ddim_sampling_steps = min(
            cfg.get("ddim_sampling_steps", 50), self.num_timesteps)
        self.ddim_discretize = cfg.get("ddim_discretize_method", "uniform")
        self.eta = cfg.get("eta", 0.0)
        self.ddim_params = make_ddim_params(
            self.schedule, self.ddim_sampling_steps, self.ddim_discretize,
            self.eta)

    def _ddim_scan(self, params: Params, x: Array, rng: Array,
                   i_hi: int, i_lo: int, eps_fn=None) -> Array:
        """Run DDIM steps for positions i_hi−1 down to i_lo as one scan."""
        b = x.shape[0]
        eps_fn = eps_fn if eps_fn is not None else self.eps_fn(params)

        def body(carry, i):
            x, key = carry
            key, k_eps = jax.random.split(key)
            t_b = jnp.full((b,), self.ddim_params.timesteps[i], jnp.int32)
            eps_pred = eps_fn(x, t_b)
            noise = jax.random.normal(k_eps, x.shape, x.dtype)
            x = ddim_step(self.ddim_params, x, i, eps_pred, noise, self.eta)
            return (x, key), None

        idx = jnp.arange(i_hi - 1, i_lo - 1, -1, dtype=jnp.int32)
        (x, _), _ = jax.lax.scan(body, (x, rng), idx)
        return x

    @functools.partial(jax.jit, static_argnames=("self", "batch_size",
                                                 "guidance_scale"))
    def generate_samples_cfg(self, params: Params, rng: Array,
                             batch_size: int, labels: Array,
                             guidance_scale: float = 3.0) -> Array:
        """S-step DDIM sampling with classifier-free guidance (superset)."""
        k_loop, x = self._init_noise(rng, batch_size)
        fn = self.eps_fn(params, labels, guidance_scale)
        return self._ddim_scan(params, x, k_loop,
                               self.ddim_sampling_steps, 0, fn)

    @functools.partial(jax.jit, static_argnames=("self", "batch_size"))
    def generate_samples(self, params: Params, rng: Array,
                         batch_size: int) -> Array:
        """S-step DDIM sampler (reference `ddim.py:128-152`)."""
        k_loop, x = self._init_noise(rng, batch_size)
        return self._ddim_scan(params, x, k_loop, self.ddim_sampling_steps, 0)

    def generate_samples_with_intermediates(
            self, params: Params, rng: Array, batch_size: int,
            save_interval: int = 2) -> List[Array]:
        """DDIM sampler with frames every ``save_interval`` positions
        (reference `ddim.py:154-188`; its default save_interval is 2)."""
        k_loop, x = self._init_noise(rng, batch_size)
        frames = [x]
        S = self.ddim_sampling_steps
        save_is = sorted({i for i in range(0, S, save_interval)} | {0},
                         reverse=True)
        i_hi = S
        keys = jax.random.split(k_loop, len(save_is))
        for key, i_save in zip(keys, save_is):
            x = self._ddim_scan(params, x, key, i_hi, i_save)
            frames.append(x)
            i_hi = i_save
        return frames
