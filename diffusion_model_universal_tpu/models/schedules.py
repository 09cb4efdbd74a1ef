"""Noise schedules and core diffusion math as pure JAX functions.

This is the TPU-native equivalent of the schedule buffers the reference
registers on its nn.Modules (`models/ddpm.py:176-178`: ``betas``, ``alphas``,
``alphas_cumprod``) plus the closed-form forward/reverse process steps
(`models/ddpm.py:286-296` q-sample, `models/ddpm.py:298-328` ancestral step,
`models/ddim.py:67-126` DDIM parameters/step).

Everything here is shape-static and jit/scan-friendly: schedules are
precomputed arrays closed over by jitted functions; per-step math indexes
them with traced integer timesteps (`jnp.take`), which lowers to cheap
dynamic-slice gathers on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """Precomputed DDPM-style discrete noise schedule.

    Attributes mirror the reference buffers (`models/ddpm.py:176-178`) with
    the extra square-root / posterior terms precomputed once so the scan body
    does no transcendental work beyond the UNet itself.
    """

    betas: jnp.ndarray                 # [T]
    alphas: jnp.ndarray                # [T] = 1 - betas
    alphas_cumprod: jnp.ndarray        # [T] = cumprod(alphas)
    alphas_cumprod_prev: jnp.ndarray   # [T] = cumprod shifted; ᾱ_{-1} := 1
    sqrt_alphas_cumprod: jnp.ndarray   # [T]
    sqrt_one_minus_alphas_cumprod: jnp.ndarray  # [T]
    posterior_variance: jnp.ndarray    # [T] β̃_t = (1-ᾱ_{t-1})/(1-ᾱ_t)·β_t

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def linear_beta_schedule(beta_start: float, beta_end: float, num_timesteps: int,
                         dtype=jnp.float32) -> jnp.ndarray:
    """Linear β schedule (reference `models/ddpm.py:176`)."""
    return jnp.linspace(beta_start, beta_end, num_timesteps, dtype=dtype)


def cosine_beta_schedule(num_timesteps: int, s: float = 0.008,
                         dtype=jnp.float32) -> jnp.ndarray:
    """Cosine schedule from Nichol & Dhariwal (2021).

    The reference's energy config declares ``noise_schedule.type`` with
    options linear/cosine/quadratic (`configs/energy_based_config.yaml:18-22`)
    but only ever builds linear; we support all three.

    Built host-side in true float64 (JAX silently downgrades f64 without
    x64 mode); only the final β table is materialized at ``dtype``.
    """
    import numpy as np
    steps = np.arange(num_timesteps + 1, dtype=np.float64)
    f = np.cos(((steps / num_timesteps) + s) / (1 + s) * np.pi / 2) ** 2
    alphas_cumprod = f / f[0]
    betas = 1.0 - alphas_cumprod[1:] / alphas_cumprod[:-1]
    return jnp.asarray(np.clip(betas, 0.0, 0.999), dtype)


def quadratic_beta_schedule(beta_start: float, beta_end: float,
                            num_timesteps: int, dtype=jnp.float32) -> jnp.ndarray:
    """Quadratic schedule: linspace in sqrt-beta space."""
    return (jnp.linspace(beta_start ** 0.5, beta_end ** 0.5, num_timesteps,
                         dtype=dtype) ** 2)


def make_noise_schedule(beta_start: float = 1e-4, beta_end: float = 2e-2,
                        num_timesteps: int = 1000,
                        schedule_type: str = "linear") -> NoiseSchedule:
    """Build the full precomputed :class:`NoiseSchedule`."""
    if schedule_type == "linear":
        betas = linear_beta_schedule(beta_start, beta_end, num_timesteps)
    elif schedule_type == "cosine":
        betas = cosine_beta_schedule(num_timesteps)
    elif schedule_type == "quadratic":
        betas = quadratic_beta_schedule(beta_start, beta_end, num_timesteps)
    else:
        raise ValueError(f"Unknown schedule type: {schedule_type}")
    return schedule_from_betas(betas)


def schedule_from_betas(betas: jnp.ndarray) -> NoiseSchedule:
    """Precompute every derived buffer from a β table (shared by the
    named schedules and by :func:`respaced_schedule`)."""
    alphas = 1.0 - betas
    alphas_cumprod = jnp.cumprod(alphas)
    alphas_cumprod_prev = jnp.concatenate(
        [jnp.ones((1,), betas.dtype), alphas_cumprod[:-1]])
    posterior_variance = (
        (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod) * betas)
    return NoiseSchedule(
        betas=betas,
        alphas=alphas,
        alphas_cumprod=alphas_cumprod,
        alphas_cumprod_prev=alphas_cumprod_prev,
        sqrt_alphas_cumprod=jnp.sqrt(alphas_cumprod),
        sqrt_one_minus_alphas_cumprod=jnp.sqrt(1.0 - alphas_cumprod),
        posterior_variance=posterior_variance,
    )


def _bcast(coef: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Gather per-timestep coefficients and broadcast to NHWC image rank."""
    return jnp.take(coef, t)[:, None, None, None]


def q_sample(schedule: NoiseSchedule, x0: jnp.ndarray, t: jnp.ndarray,
             noise: jnp.ndarray) -> jnp.ndarray:
    """Forward diffusion: x_t = √ᾱ_t·x₀ + √(1-ᾱ_t)·ε.

    Reference `models/ddpm.py:286-296` (`_add_noise`).
    """
    return (_bcast(schedule.sqrt_alphas_cumprod, t) * x0
            + _bcast(schedule.sqrt_one_minus_alphas_cumprod, t) * noise)


_PREDICTION_TYPES = ("epsilon", "v", "x0")


def prediction_to_eps(schedule: NoiseSchedule, pred: jnp.ndarray,
                      x_t: jnp.ndarray, t: jnp.ndarray,
                      prediction_type: str) -> jnp.ndarray:
    """Convert a network output in any supported parameterization to ε̂.

    The reference trains ε-prediction only (`models/ddpm.py:207-235`);
    ``v`` (Salimans & Ho 2022, arXiv:2202.00512) and ``x0`` are superset
    parameterizations. All relations follow from x_t = √ᾱ·x₀ + √(1−ᾱ)·ε
    and v = √ᾱ·ε − √(1−ᾱ)·x₀:

    * epsilon: ε̂ = out
    * v:       ε̂ = √ᾱ_t·out + √(1−ᾱ_t)·x_t
    * x0:      ε̂ = (x_t − √ᾱ_t·out) / √(1−ᾱ_t)

    Every conversion is affine in ``out`` with an x_t-dependent offset
    that cancels in CFG differences, so guiding raw outputs and then
    converting once equals ε-space classifier-free guidance exactly.
    """
    if prediction_type == "epsilon":
        return pred
    a = _bcast(schedule.sqrt_alphas_cumprod, t)
    s = _bcast(schedule.sqrt_one_minus_alphas_cumprod, t)
    if prediction_type == "v":
        return a * pred + s * x_t
    if prediction_type == "x0":
        return (x_t - a * pred) / s
    raise ValueError(f"prediction_type must be one of {_PREDICTION_TYPES}, "
                     f"got {prediction_type!r}")


def prediction_target(schedule: NoiseSchedule, x0: jnp.ndarray,
                      noise: jnp.ndarray, t: jnp.ndarray,
                      prediction_type: str) -> jnp.ndarray:
    """Training target for a given parameterization at q-sampled (x₀, ε, t).

    Inverse of :func:`prediction_to_eps` at x_t = q_sample(x₀, t, ε):
    feeding the returned target back through ``prediction_to_eps``
    reconstructs ε exactly (pinned in ``tests/test_schedules.py``).
    """
    if prediction_type == "epsilon":
        return noise
    if prediction_type == "x0":
        return x0
    if prediction_type == "v":
        a = _bcast(schedule.sqrt_alphas_cumprod, t)
        s = _bcast(schedule.sqrt_one_minus_alphas_cumprod, t)
        return a * noise - s * x0
    raise ValueError(f"prediction_type must be one of {_PREDICTION_TYPES}, "
                     f"got {prediction_type!r}")


def ddpm_posterior_step(schedule: NoiseSchedule, x: jnp.ndarray,
                        t: jnp.ndarray, eps_pred: jnp.ndarray,
                        noise: jnp.ndarray) -> jnp.ndarray:
    """One ancestral reverse-diffusion step (Algorithm 2 of Ho et al.).

    Reference `models/ddpm.py:298-328` (`_reverse_diffusion_step`):
    μ = α_t^{-1/2}·(x − β_t/√(1-ᾱ_t)·ε̂), then add √β̃_t·z for t>0.

    ``t`` is a [B] traced integer array; the t>0 gate is a `jnp.where` on the
    broadcast mask so the function is scan-compatible (no Python branching —
    the reference's ``if t[0] > 0`` forces a host sync per step).
    """
    beta_t = _bcast(schedule.betas, t)
    inv_sqrt_alpha_t = jax.lax.rsqrt(_bcast(schedule.alphas, t))
    sqrt_one_minus_ac = _bcast(schedule.sqrt_one_minus_alphas_cumprod, t)
    mean = inv_sqrt_alpha_t * (x - beta_t / sqrt_one_minus_ac * eps_pred)
    sigma = jnp.sqrt(_bcast(schedule.posterior_variance, t))
    nonzero = (t > 0).astype(x.dtype)[:, None, None, None]
    return mean + nonzero * sigma * noise


def respace_timesteps(num_timesteps: int, num_sampling_steps: int
                      ) -> jnp.ndarray:
    """Evenly respaced timestep subsequence for strided ancestral
    sampling (iDDPM §4, arXiv:2102.09672): S indices from 0 to T−1
    inclusive, strictly increasing. Static (host-side) — the result is
    baked into the compiled sampler."""
    import numpy as np
    if not 2 <= num_sampling_steps <= num_timesteps:
        raise ValueError(
            f"num_steps must be in [2, {num_timesteps}] "
            f"(got {num_sampling_steps})")
    ts = np.round(np.linspace(0, num_timesteps - 1,
                              num_sampling_steps)).astype(np.int32)
    assert (np.diff(ts) > 0).all()  # spacing ≥ 1 ⇒ no duplicates
    return jnp.asarray(ts)


def respaced_schedule(schedule: NoiseSchedule,
                      timesteps: jnp.ndarray) -> NoiseSchedule:
    """Re-derive a coarse NoiseSchedule over a timestep subsequence.

    iDDPM §4: keeping the marginals ᾱ_new[i] = ᾱ[ts[i]] fixed, the
    implied per-step β_new[i] = 1 − ᾱ_new[i]/ᾱ_new[i−1] (with
    ᾱ_new[−1] := 1) defines a valid shorter diffusion whose ancestral
    reverse process can be run with the SAME trained model (evaluated at
    the original timesteps ts[i]). All derived buffers — posterior
    variance, the learned-range interpolation extremes — follow from
    the new β table via :func:`schedule_from_betas`.
    """
    abar = schedule.alphas_cumprod[timesteps]
    abar_prev = jnp.concatenate([jnp.ones((1,), abar.dtype), abar[:-1]])
    return schedule_from_betas(1.0 - abar / abar_prev)


def posterior_log_variance_clipped(schedule: NoiseSchedule) -> jnp.ndarray:
    """log β̃_t with β̃_0 (which is exactly 0) replaced by β̃_1.

    Nichol & Dhariwal 2021 (arXiv:2102.09672 §3.1): the clipped table is
    the lower end of the learned-range interpolation and the true-
    posterior log-variance used by the VLB's KL terms.
    """
    pv = schedule.posterior_variance
    return jnp.log(jnp.concatenate([pv[1:2], pv[1:]]))


def learned_range_log_variance(schedule: NoiseSchedule, v: jnp.ndarray,
                               t: jnp.ndarray) -> jnp.ndarray:
    """iDDPM 'learned_range' variance (arXiv:2102.09672 eq. 15).

    The network's variance head emits a raw per-pixel ``v``; the model
    log-variance interpolates between the two analytic extremes of the
    reverse-process variance: log σ²_t = f·log β_t + (1−f)·log β̃_t with
    f = (v+1)/2. ``v`` is unconstrained (not clamped) as in the paper —
    the VLB pulls it into [−1, 1] where the optimum lives.
    """
    min_log = _bcast(posterior_log_variance_clipped(schedule), t)
    max_log = _bcast(jnp.log(schedule.betas), t)
    frac = (v.astype(jnp.float32) + 1.0) * 0.5
    return frac * max_log + (1.0 - frac) * min_log


def q_posterior_mean(schedule: NoiseSchedule, x0: jnp.ndarray,
                     x_t: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Mean of the true posterior q(x_{t−1} | x_t, x₀) (Ho et al. eq. 7):
    μ̃ = √ᾱ_{t−1}·β_t/(1−ᾱ_t)·x₀ + √α_t·(1−ᾱ_{t−1})/(1−ᾱ_t)·x_t."""
    c0 = (jnp.sqrt(schedule.alphas_cumprod_prev) * schedule.betas
          / (1.0 - schedule.alphas_cumprod))
    ct = (jnp.sqrt(schedule.alphas) * (1.0 - schedule.alphas_cumprod_prev)
          / (1.0 - schedule.alphas_cumprod))
    return _bcast(c0, t) * x0 + _bcast(ct, t) * x_t


def normal_kl(mean1: jnp.ndarray, logvar1: jnp.ndarray, mean2: jnp.ndarray,
              logvar2: jnp.ndarray) -> jnp.ndarray:
    """KL(N(mean1, e^{logvar1}) ‖ N(mean2, e^{logvar2})), elementwise nats."""
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + (mean1 - mean2) ** 2 * jnp.exp(-logvar2))


def discretized_gaussian_log_likelihood(x: jnp.ndarray, means: jnp.ndarray,
                                        log_scales: jnp.ndarray
                                        ) -> jnp.ndarray:
    """log p(x) for images in [−1, 1] quantized to 256 levels under
    N(means, e^{2·log_scales}) — the VLB's t=0 decoder term (Ho et al.
    §3.3): probability mass of the 1/127.5-wide bin around x, via the
    tanh-approximated standard-normal CDF; open-ended edge bins.
    """
    def cdf(z):
        return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi)
                                     * (z + 0.044715 * z ** 3)))

    inv_std = jnp.exp(-log_scales)
    plus = cdf((x - means + 1.0 / 255.0) * inv_std)
    minus = cdf((x - means - 1.0 / 255.0) * inv_std)
    log_plus = jnp.log(jnp.clip(plus, 1e-12))
    log_one_minus = jnp.log(jnp.clip(1.0 - minus, 1e-12))
    log_delta = jnp.log(jnp.clip(plus - minus, 1e-12))
    return jnp.where(x < -0.999, log_plus,
                     jnp.where(x > 0.999, log_one_minus, log_delta))


def vlb_term_bits(schedule: NoiseSchedule, x0: jnp.ndarray,
                  x_t: jnp.ndarray, t: jnp.ndarray, eps_pred: jnp.ndarray,
                  log_var: jnp.ndarray) -> jnp.ndarray:
    """Per-sample VLB term L_{t−1} in bits/dim (arXiv:2102.09672 eq. 16):
    KL(q(x_{t−1}|x_t,x₀) ‖ p_θ(x_{t−1}|x_t)) for t>0, −log p(x₀|x₁) for
    t=0. ``eps_pred`` parameterizes the model mean (the caller applies
    stop_gradient for the hybrid objective so this term trains only the
    variance head); x̂₀ is clipped to [−1, 1] as in the paper's code.
    """
    true_mean = q_posterior_mean(schedule, x0, x_t, t)
    true_logvar = _bcast(posterior_log_variance_clipped(schedule), t)
    a = _bcast(schedule.sqrt_alphas_cumprod, t)
    s = _bcast(schedule.sqrt_one_minus_alphas_cumprod, t)
    model_x0 = jnp.clip((x_t - s * eps_pred) / a, -1.0, 1.0)
    model_mean = q_posterior_mean(schedule, model_x0, x_t, t)
    kl = normal_kl(true_mean, true_logvar, model_mean, log_var)
    kl = kl.reshape(kl.shape[0], -1).mean(axis=1) / jnp.log(2.0)
    nll = -discretized_gaussian_log_likelihood(x0, model_mean, 0.5 * log_var)
    nll = nll.reshape(nll.shape[0], -1).mean(axis=1) / jnp.log(2.0)
    return jnp.where(t == 0, nll, kl)


def ddpm_posterior_step_learned(schedule: NoiseSchedule, x: jnp.ndarray,
                                t: jnp.ndarray, eps_pred: jnp.ndarray,
                                log_var: jnp.ndarray,
                                noise: jnp.ndarray) -> jnp.ndarray:
    """Ancestral reverse step with the model's LEARNED log-variance
    (arXiv:2102.09672 §3.1) — same posterior mean as
    :func:`ddpm_posterior_step`, σ = e^{log_var/2} instead of √β̃_t."""
    beta_t = _bcast(schedule.betas, t)
    inv_sqrt_alpha_t = jax.lax.rsqrt(_bcast(schedule.alphas, t))
    sqrt_one_minus_ac = _bcast(schedule.sqrt_one_minus_alphas_cumprod, t)
    mean = inv_sqrt_alpha_t * (x - beta_t / sqrt_one_minus_ac * eps_pred)
    sigma = jnp.exp(0.5 * log_var).astype(x.dtype)
    nonzero = (t > 0).astype(x.dtype)[:, None, None, None]
    return mean + nonzero * sigma * noise


def ddim_timesteps(num_timesteps: int, num_sampling_steps: int,
                   method: str = "uniform") -> jnp.ndarray:
    """Select the DDIM sampling timestep subsequence.

    Reference `models/ddim.py:49-65`: 'uniform' = arange with stride
    T//S; 'quad' = squared linspace up to sqrt(0.8·T).
    """
    if method == "uniform":
        c = num_timesteps // num_sampling_steps
        return jnp.arange(0, num_timesteps, c, dtype=jnp.int32)
    if method == "quad":
        ts = jnp.linspace(0, (num_timesteps * 0.8) ** 0.5,
                          num_sampling_steps) ** 2
        return ts.astype(jnp.int32)
    raise NotImplementedError(f"Unknown discretization method: {method}")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DDIMParams:
    """Precomputed DDIM sampling buffers (reference `models/ddim.py:67-81`).

    All arrays are length S (the sampling subsequence length) and are indexed
    by step POSITION i ∈ [0, S) — fixing reference defect D4, which indexed
    these length-S buffers with raw timestep values t ∈ [0, T)
    (`models/ddim.py:97-100`).
    """

    timesteps: jnp.ndarray            # [S] original timestep values
    alphas: jnp.ndarray               # [S] ᾱ at the selected steps
    alphas_prev: jnp.ndarray          # [S] ᾱ at the previous selected steps
    sigmas: jnp.ndarray               # [S] η-scaled noise std
    sqrt_one_minus_alphas: jnp.ndarray  # [S]


def make_ddim_params(schedule: NoiseSchedule, num_sampling_steps: int = 50,
                     method: str = "uniform", eta: float = 0.0) -> DDIMParams:
    """Precompute DDIM buffers with η-controlled σ (`models/ddim.py:67-81`)."""
    ts = ddim_timesteps(schedule.num_timesteps, num_sampling_steps, method)
    alphas = schedule.alphas_cumprod[ts]
    alphas_prev = jnp.concatenate(
        [schedule.alphas_cumprod[0:1], schedule.alphas_cumprod[ts[:-1]]])
    sigmas = eta * jnp.sqrt(
        (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    return DDIMParams(
        timesteps=ts,
        alphas=alphas,
        alphas_prev=alphas_prev,
        sigmas=sigmas,
        sqrt_one_minus_alphas=jnp.sqrt(1.0 - alphas),
    )


def ddim_step(params: DDIMParams, x: jnp.ndarray, i: jnp.ndarray,
              eps_pred: jnp.ndarray, noise: jnp.ndarray,
              eta: float) -> jnp.ndarray:
    """One DDIM update at step position ``i`` (reference `models/ddim.py:83-126`).

    x₀-estimate clamped to [-1, 1]; direction term √(1-ᾱ_prev-σ²)·ε̂;
    optional clamped stochastic noise when η>0 (the reference clamps the
    injected noise to [-3, 3] for stability, `models/ddim.py:117-120`).
    """
    alpha = params.alphas[i]
    alpha_prev = params.alphas_prev[i]
    sigma = params.sigmas[i]
    sqrt_one_minus_alpha = params.sqrt_one_minus_alphas[i]

    pred_x0 = (x - sqrt_one_minus_alpha * eps_pred) * jax.lax.rsqrt(alpha)
    pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - alpha_prev - sigma ** 2, 0.0)) * eps_pred
    if eta > 0:
        noise = jnp.clip(noise, -3.0, 3.0)
        return jnp.sqrt(alpha_prev) * pred_x0 + dir_xt + sigma * noise
    return jnp.sqrt(alpha_prev) * pred_x0 + dir_xt


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DPMSolverParams:
    """Precomputed buffers for DPM-Solver++(2M) (Lu et al. 2022,
    arXiv:2211.01095) on a discrete DDPM schedule.

    A capability superset of the reference (whose fastest sampler is
    DDIM-50, `models/ddim.py:128-188`): a second-order multistep ODE
    solver in x₀-parameterization — noticeably better sample quality at
    5–20 steps for ONE model eval per step, the modern default for fast
    diffusion sampling.

    Sequence convention: index j = 0..S−1 walks times t_0 > … > t_{S−1}
    (t_0 = T−1, t_{S−1} = 0). α = √ᾱ, σ = √(1−ᾱ), λ = log(α/σ)
    (increases as noise decreases).
    """

    timesteps: jnp.ndarray   # [S] int32, decreasing
    alpha: jnp.ndarray       # [S] √ᾱ at the selected steps
    sigma: jnp.ndarray       # [S] √(1−ᾱ)
    lam: jnp.ndarray         # [S] log(α/σ)


def make_dpm_solver_params(schedule: NoiseSchedule,
                           num_sampling_steps: int = 20) -> DPMSolverParams:
    """Select S timesteps (uniform in t, T−1 → 0 inclusive) and
    precompute the half-log-SNR grid."""
    T = schedule.num_timesteps
    ts = jnp.linspace(T - 1, 0, num_sampling_steps).round().astype(jnp.int32)
    abar = schedule.alphas_cumprod[ts]
    alpha = jnp.sqrt(abar)
    sigma = jnp.sqrt(1.0 - abar)
    return DPMSolverParams(timesteps=ts, alpha=alpha, sigma=sigma,
                           lam=jnp.log(alpha / sigma))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KarrasHeunParams:
    """Precomputed buffers for the Karras-spaced Heun (EDM) sampler
    (Karras et al. 2022, arXiv:2206.00364, Alg. 1) on a discrete DDPM
    schedule — a capability superset of the reference, alongside
    DPM-Solver++(2M).

    The VP process x_t = α·x₀ + σ·ε is rewritten in the paper's scaled
    coordinates x̂ = x/α, σ̂ = σ/α, where the probability-flow ODE is
    exactly dx̂/dσ̂ = ε̂(x, t) (their eq. 1 with s(t) ≡ 1). The σ̂ grid
    uses the paper's ρ-spacing, then every grid point is SNAPPED to the
    nearest discrete timestep (in log σ̂) so the model is always
    evaluated at a time it was trained on, with the exact σ̂ of that
    time — the standard discrete-model adaptation (k-diffusion does the
    same).
    """

    timesteps: jnp.ndarray   # [S] int32, decreasing (snapped grid)
    alpha: jnp.ndarray       # [S] √ᾱ at the snapped steps
    sigma_hat: jnp.ndarray   # [S] σ̂ = √(1−ᾱ)/√ᾱ, decreasing


def make_karras_heun_params(schedule: NoiseSchedule,
                            num_sampling_steps: int = 18,
                            rho: float = 7.0) -> KarrasHeunParams:
    """Karras ρ-spaced σ̂ grid (arXiv:2206.00364 eq. 5), snapped to the
    discrete schedule: σ̂ᵢ = (σ̂_max^{1/ρ} + i/(S−1)·(σ̂_min^{1/ρ} −
    σ̂_max^{1/ρ}))^ρ, then tᵢ = argmin_t |log σ̂(t) − log σ̂ᵢ|. Endpoints
    land exactly on t = T−1 and t = 0. Snapping can duplicate timesteps
    when S approaches T; duplicates are zero-length steps (harmless)."""
    abar = schedule.alphas_cumprod
    sig_hat_all = jnp.sqrt((1.0 - abar) / abar)          # [T], increasing
    s_min, s_max = sig_hat_all[0], sig_hat_all[-1]
    i = jnp.linspace(0.0, 1.0, num_sampling_steps)
    inv = 1.0 / rho
    grid = (s_max ** inv + i * (s_min ** inv - s_max ** inv)) ** rho  # dec.
    ts = jnp.argmin(
        jnp.abs(jnp.log(sig_hat_all)[None, :] - jnp.log(grid)[:, None]),
        axis=1).astype(jnp.int32)                        # [S], decreasing
    abar_s = abar[ts]
    return KarrasHeunParams(timesteps=ts, alpha=jnp.sqrt(abar_s),
                            sigma_hat=jnp.sqrt((1.0 - abar_s) / abar_s))


def sigma_ladder(sigma_min: float, sigma_max: float,
                 num_scales: int) -> jnp.ndarray:
    """Geometric σ ladder from σ_max down to σ_min.

    Reference `models/score_based.py:229-232`:
    exp(linspace(ln σ_max, ln σ_min, num_scales)).
    """
    return jnp.exp(jnp.linspace(jnp.log(sigma_max), jnp.log(sigma_min),
                                num_scales))


def continuous_sigma(sigma_min: float, sigma_max: float,
                     u: jnp.ndarray) -> jnp.ndarray:
    """Map u∈[0,1] to σ via the geometric interpolation
    σ = σ_min·(σ_max/σ_min)^u (reference `models/score_based.py:202-204`)."""
    return sigma_min * (sigma_max / sigma_min) ** u
