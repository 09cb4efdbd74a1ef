"""Loss functions as pure JAX callables.

TPU-native re-design of the reference's YAML-configured loss system
(`utils/losses.py:8-287`). The factory :class:`DiffusionLoss` preserves the
reference's config surface exactly — loss types mse/l1/huber/hybrid with
per-type weights, huber_delta, hybrid_weights, SNR/linear/inverse time
weighting affinely rescaled to [min_weight, max_weight], and an optional
perceptual add-on — but every loss is a jit-safe pure function of
``(pred, target, timesteps)``, trivially differentiable with `jax.grad`.

Intended-behavior fixes over the reference (SURVEY.md §2.7):
* D5 — :func:`score_matching_loss` targets −ε/σ for the SAME ε used in the
  perturbation (the reference re-perturbed with fresh noise,
  `utils/losses.py:238-242`).
* The SNR weighting uses the model's static T rather than the batch-max
  timestep (the reference built a linspace of length ``timesteps.max()+1``,
  `utils/losses.py:152-155`, making weights depend on batch composition).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def mse(pred: Array, target: Array) -> Array:
    return (pred - target) ** 2


def l1(pred: Array, target: Array) -> Array:
    return jnp.abs(pred - target)


def huber(pred: Array, target: Array, delta: float = 1.0) -> Array:
    """Smooth-L1 with threshold ``delta`` (torch's ``smooth_l1_loss`` beta
    semantics: quadratic/(2δ) inside |d|<δ, |d|−δ/2 outside)."""
    d = jnp.abs(pred - target)
    return jnp.where(d < delta, 0.5 * d ** 2 / delta, d - 0.5 * delta)


def _snr_weights(t: Array, num_timesteps: int,
                 alphas_cumprod: Optional[Array] = None,
                 beta_start: float = 1e-4, beta_end: float = 2e-2) -> Array:
    """SNR-based per-sample loss weights (reference `utils/losses.py:144-164`).

    Computes SNR_t = ᾱ_t/(1-ᾱ_t) from the model's ACTUAL cumulative-ᾱ
    schedule when given (the reference hardcodes a linear β(1e-4, 2e-2)
    rebuild regardless of the configured schedule — wrong under
    cosine/quadratic), normalizes by the schedule max (= SNR at t=0), and
    clamps ≥ 1e-5. Falls back to the linear rebuild when no schedule is
    provided.
    """
    if alphas_cumprod is None:
        betas = jnp.linspace(beta_start, beta_end, num_timesteps)
        alphas_cumprod = jnp.cumprod(1.0 - betas)
    snr = alphas_cumprod / (1.0 - alphas_cumprod)
    weights = jnp.take(snr, t) / jnp.max(snr)
    return jnp.clip(weights, 1e-5, None)


def _min_snr_weights(t: Array, num_timesteps: int,
                     alphas_cumprod: Optional[Array],
                     gamma: float, prediction_type: str,
                     beta_start: float = 1e-4,
                     beta_end: float = 2e-2) -> Array:
    """Min-SNR-γ weights (Hang et al. 2023, arXiv:2303.09556) — superset
    of the reference's weighting options.

    The paper defines the weight min(SNR_t, γ) on the x₀-MSE; because
    ‖ε̂−ε‖² = SNR·‖x̂₀−x₀‖² and ‖v̂−v‖² = (SNR+1)·‖x̂₀−x₀‖², the weight is
    divided by SNR (ε-prediction) or SNR+1 (v-prediction) so the EFFECTIVE
    x₀-space weighting matches the paper regardless of parameterization.
    These are absolute weights — no affine [min,max] rescale (that rescale
    is a reference quirk of the snr/linear/inverse types).
    """
    if alphas_cumprod is None:
        betas = jnp.linspace(beta_start, beta_end, num_timesteps)
        alphas_cumprod = jnp.cumprod(1.0 - betas)
    snr_t = jnp.take(alphas_cumprod / (1.0 - alphas_cumprod), t)
    w_x0 = jnp.minimum(snr_t, gamma)
    if prediction_type == "epsilon":
        return w_x0 / snr_t            # = min(1, γ/SNR)
    if prediction_type == "v":
        return w_x0 / (snr_t + 1.0)
    return w_x0                        # x0-prediction: the paper's form


class DiffusionLoss:
    """Config-driven diffusion training loss (reference `utils/losses.py:8-181`).

    Construct once from ``(loss_type, loss_config)``; calling the instance
    with ``(pred, target, timesteps)`` returns a scalar. Instances are
    stateless w.r.t. arrays so they are safe to close over in jitted code.

    Args:
        loss_type: 'mse' | 'l1' | 'huber' | 'hybrid'.
        loss_config: same keys as the reference YAML ``loss_config`` block
            (`configs/ddpm_config.yaml:15-42`).
        num_timesteps: static diffusion horizon used for SNR weighting.
        alphas_cumprod: the model's actual ᾱ schedule ([T]); when given,
            SNR weights are derived from it instead of a hardcoded linear
            β rebuild.
    """

    LOSS_TYPES = ("mse", "l1", "huber", "hybrid")

    def __init__(self, loss_type: str = "mse",
                 loss_config: Optional[Dict] = None,
                 num_timesteps: int = 1000,
                 alphas_cumprod: Optional[Array] = None,
                 prediction_type: str = "epsilon"):
        self.loss_type = loss_type.lower()
        cfg = loss_config or {}
        if self.loss_type not in self.LOSS_TYPES:
            raise ValueError(f"Unsupported loss type: {loss_type}")

        # Single-type weights. The reference defaults l1/huber weights to 0.0
        # even when that loss type is selected (`utils/losses.py:44-45`,
        # defect D11's zero-loss trap); we default the weight of the SELECTED
        # type to 1.0 instead, preserving explicit configs.
        self.mse_weight = cfg.get("mse_weight", 1.0)
        self.l1_weight = cfg.get(
            "l1_weight", 1.0 if self.loss_type == "l1" else 0.0)
        self.huber_weight = cfg.get(
            "huber_weight", 1.0 if self.loss_type == "huber" else 0.0)
        self.huber_delta = cfg.get("huber_delta", 1.0)

        self.use_hybrid = cfg.get("use_hybrid", self.loss_type == "hybrid")
        hw = cfg.get("hybrid_weights", {}) or {}
        self.hybrid_weights = {
            "mse": hw.get("mse", 1.0),
            "l1": hw.get("l1", 0.0),
            "huber": hw.get("huber", 0.0),
        }

        self.use_time_weighting = cfg.get("use_time_weighting", True)
        self.time_weight_type = cfg.get("time_weight_type", "snr")
        twp = cfg.get("time_weight_params", {}) or {}
        self.min_weight = twp.get("min_weight", 0.1)
        self.max_weight = twp.get("max_weight", 1.0)
        self.min_snr_gamma = twp.get("gamma", 5.0)
        self.num_timesteps = num_timesteps
        self.alphas_cumprod = alphas_cumprod
        self.prediction_type = prediction_type

        self.perceptual_weight = cfg.get("perceptual_weight", 0.0)
        self._perceptual: Optional[Callable] = None
        if self.perceptual_weight > 0:
            self._perceptual = PerceptualLoss()

    def _base_loss(self, pred: Array, target: Array) -> Array:
        if self.use_hybrid:
            total = jnp.zeros_like(pred)
            if self.hybrid_weights["mse"] > 0:
                total = total + self.hybrid_weights["mse"] * mse(pred, target)
            if self.hybrid_weights["l1"] > 0:
                total = total + self.hybrid_weights["l1"] * l1(pred, target)
            if self.hybrid_weights["huber"] > 0:
                total = total + self.hybrid_weights["huber"] * huber(
                    pred, target, self.huber_delta)
            return total
        if self.loss_type == "mse":
            return self.mse_weight * mse(pred, target)
        if self.loss_type == "l1":
            return self.l1_weight * l1(pred, target)
        if self.loss_type == "huber":
            return self.huber_weight * huber(pred, target, self.huber_delta)
        raise ValueError(f"Unsupported single loss type: {self.loss_type}")

    def time_weights(self, t: Array) -> Array:
        """Per-sample weights rescaled to [min_weight, max_weight]
        (reference `utils/losses.py:133-181`), shaped [B, 1, 1, 1]."""
        tf = t.astype(jnp.float32)
        if self.time_weight_type == "min_snr":
            # Absolute weights (see _min_snr_weights) — the affine
            # [min_weight, max_weight] rescale below does not apply.
            w = _min_snr_weights(t, self.num_timesteps, self.alphas_cumprod,
                                 self.min_snr_gamma, self.prediction_type)
            return w[:, None, None, None]
        if self.time_weight_type == "snr":
            w = _snr_weights(t, self.num_timesteps, self.alphas_cumprod)
        elif self.time_weight_type == "linear":
            w = 1.0 - tf / float(self.num_timesteps - 1)
        elif self.time_weight_type == "inverse":
            w = 1.0 / (tf + 1.0)
        else:
            w = jnp.ones_like(tf)
        # Affine rescale over the batch, as in the reference (:176-179).
        w = self.min_weight + (self.max_weight - self.min_weight) * (
            (w - jnp.min(w)) / (jnp.max(w) - jnp.min(w) + 1e-5))
        return w[:, None, None, None]

    def __call__(self, pred: Array, target: Array,
                 timesteps: Optional[Array] = None) -> Array:
        loss = self._base_loss(pred, target)
        if self.use_time_weighting and timesteps is not None:
            # Reshape [B,1,1,1] weights to the loss rank so rank-1 inputs
            # (e.g. per-sample energies) weight per-sample instead of
            # broadcasting [B]×[B,1,1,1] → [B,1,1,B].
            w = self.time_weights(timesteps)
            w = w.reshape(w.shape[:1] + (1,) * (loss.ndim - 1))
            loss = loss * w
        if self._perceptual is not None:
            loss = loss + self.perceptual_weight * self._perceptual(pred, target)
        return jnp.mean(loss)


class PerceptualLoss:
    """VGG16-feature perceptual loss (reference `utils/losses.py:183-216`).

    With converted ImageNet VGG16 weights (``weights_path`` or
    ``$DMU_VGG16_WEIGHTS``; see `utils/vgg.py` — this env has zero
    egress, so weights are provisioned offline), this matches the
    reference's relu1_2/relu2_2/relu3_3 feature distance. Without
    weights it uses a fixed seeded random conv stack with the same
    receptive-field structure — a standard ordering-preserving proxy.
    """

    def __init__(self, seed: int = 0, weights_path: Optional[str] = None):
        import os
        from .vgg import init_vgg16_params, load_vgg16_params
        path = weights_path or os.environ.get("DMU_VGG16_WEIGHTS", "")
        if path and os.path.exists(path):
            self.params = load_vgg16_params(path)
            self.pretrained = True
        else:
            self.params = init_vgg16_params(jax.random.PRNGKey(seed))
            self.pretrained = False
        self.mean = jnp.array([0.485, 0.456, 0.406])
        self.std = jnp.array([0.229, 0.224, 0.225])

    def _features(self, x: Array):
        from .vgg import vgg16_features
        # [-1, 1] diffusion range → [0, 1] → ImageNet-normalize. The
        # reference normalizes the [-1, 1] tensor directly
        # (`utils/losses.py:203-205`), i.e. feeds VGG data shifted ~2σ
        # off its training distribution — intended-behavior fix, same
        # spirit as the D-series defects (SURVEY §2.7).
        h = ((x + 1.0) * 0.5 - self.mean) / self.std
        return vgg16_features(self.params, h)

    def __call__(self, pred: Array, target: Array) -> Array:
        loss = 0.0
        for fp, ft in zip(self._features(pred), self._features(target)):
            loss = loss + jnp.mean((fp - ft) ** 2)
        return loss


def score_matching_loss(score: Array, noise: Array, sigma: Array,
                        weighting: str = "none") -> Array:
    """Denoising score matching loss.

    Reference `utils/losses.py:218-242` — as *intended* (fixing defect D5):
    the DSM target is −ε/σ for the ε that actually produced the perturbation,
    which the caller passes in (reference `models/score_based.py:200-207`
    already passes ``(score, noise, sigma)``).

    ``weighting``:
    * ``"none"`` (default, reference parity): plain MSE against −ε/σ.
      Target magnitude ∼1/σ, so small-σ levels dominate the objective by
      (σ_max/σ_min)² and the large-σ score — which the annealed sampler
      depends on first — barely trains.
    * ``"sigma2"``: λ(σ)=σ² weighting, i.e. ‖σ·s + ε‖² — unit-scale
      targets at every level (the NCSN/NCSNv2 objective, Song & Ermon
      2019 eq. 5-6). Use for models meant to SAMPLE well.
    """
    if weighting == "sigma2":
        return jnp.mean((sigma[:, None, None, None] * score + noise) ** 2)
    if weighting != "none":
        raise ValueError(f"unknown DSM weighting: {weighting!r}")
    target = -noise / sigma[:, None, None, None]
    return jnp.mean((score - target) ** 2)


def energy_based_loss(energy_fn: Callable[[Array], Array], x_real: Array,
                      x_fake: Array, key: Array,
                      regularization_weight: float = 0.1) -> Array:
    """Contrastive divergence + gradient penalty.

    Reference `utils/losses.py:244-287`: CD = E[real] − E[fake]; GP is the
    WGAN-GP-style (‖∇E‖₂−1)² at uniform α-interpolates. The reference's
    autograd.grad/create_graph machinery becomes a plain `jax.grad` of the
    pure energy function — second-order differentiation through the GP term
    is handled automatically when the caller differentiates this loss.
    """
    energy_real = energy_fn(x_real)
    energy_fake = energy_fn(x_fake)
    cd_loss = jnp.mean(energy_real) - jnp.mean(energy_fake)

    alpha = jax.random.uniform(key, (x_real.shape[0], 1, 1, 1),
                               dtype=x_real.dtype)
    interpolated = alpha * x_real + (1 - alpha) * x_fake
    grads = jax.grad(lambda z: jnp.sum(energy_fn(z)))(interpolated)
    # The reference takes the 2-norm over dim=1 only (channels, NCHW); the
    # standard WGAN-GP norm is over all non-batch dims — we use the latter.
    grad_norm = jnp.sqrt(
        jnp.sum(grads ** 2, axis=(1, 2, 3)) + 1e-12)
    gradient_penalty = jnp.mean((grad_norm - 1.0) ** 2)
    return cd_loss + regularization_weight * gradient_penalty
