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
from .schedules import (_PREDICTION_TYPES, ddpm_posterior_step,
                        ddpm_posterior_step_learned,
                        learned_range_log_variance, make_dpm_solver_params,
                        make_karras_heun_params, make_noise_schedule,
                        normal_kl, posterior_log_variance_clipped,
                        prediction_target, prediction_to_eps, q_sample,
                        respace_timesteps, respaced_schedule, vlb_term_bits)
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
        # Output parameterization (superset — the reference is ε-only,
        # `models/ddpm.py:207-235`): what the UNet's raw output means.
        # All samplers consume ε̂ via eps_fn, which converts; the loss
        # targets the matching quantity (schedules.prediction_target).
        self.prediction_type = cfg.get("prediction_type", "epsilon")
        if self.prediction_type not in _PREDICTION_TYPES:
            raise ValueError(
                f"model_config.prediction_type must be one of "
                f"{_PREDICTION_TYPES}, got {self.prediction_type!r}")

        in_ch = cfg.get("in_channels", 3)
        # iDDPM learned variance (superset — the reference's reverse
        # process is fixed-β̃ only, `models/ddpm.py:298-328`): the UNet
        # emits 2C channels; the extra C parameterize the per-pixel
        # reverse variance via the learned-range interpolation
        # (schedules.learned_range_log_variance) and are trained by the
        # VLB half of the hybrid objective (arXiv:2102.09672 §3.1-3.2).
        self.learn_sigma = bool(cfg.get("learn_sigma", False))
        self.vlb_weight = float(cfg.get("vlb_weight", 1e-3))
        # Class-conditional + classifier-free guidance (superset — the
        # reference is unconditional): num_classes > 0 adds a label
        # embedding; cfg_drop_prob of training labels are replaced by
        # the NULL token so the same params serve conditional AND
        # unconditional predictions at sampling time.
        self.num_classes = int(cfg.get("num_classes", 0))
        self.cfg_drop_prob = float(cfg.get("cfg_drop_prob", 0.1))
        self.net = UNet(
            in_channels=in_ch,
            model_channels=cfg.get("model_channels", 64),
            out_channels=in_ch * (2 if self.learn_sigma else 1),
            dropout=cfg.get("dropout", 0.0),
            dtype=self.compute_dtype,
            use_pallas=self.use_pallas,
            remat=cfg.get("remat", True),
            remat_policy=cfg.get("remat_policy", None),
            num_classes=self.num_classes,
            # conv_bias=True restores the reference parameterization for
            # imported reference checkpoints (scripts/convert_weights.py).
            conv_bias=cfg.get("conv_bias", False),
            split_skip_convs=cfg.get("split_skip_convs", True),
        )
        self.loss_fn = DiffusionLoss(
            loss_type=cfg.get("loss_type", "mse"),
            loss_config=cfg.get("loss_config", {}),
            num_timesteps=self.num_timesteps,
            alphas_cumprod=self.schedule.alphas_cumprod,
            # min_snr weighting adapts its divisor to the parameterization
            prediction_type=self.prediction_type)

    # -- core pure functions ---------------------------------------------
    def init_params(self, rng: Array) -> Params:
        x = jnp.zeros(self.sample_shape(1), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        return self.net.init(rng, x, t)["params"]

    def apply(self, params: Params, x: Array, t: Array,
              train: bool = False, rng: Optional[Array] = None,
              y: Optional[Array] = None) -> Array:
        """Predict ε for noisy input x_t (reference `ddpm.py:193-205`);
        ``y`` = optional [B] class labels (conditional models)."""
        rngs = {"dropout": rng} if (train and rng is not None) else None
        return self.net.apply({"params": params}, x, t, y=y,
                              deterministic=not train, rngs=rngs)

    def loss_function(self, params: Params, x, rng: Array) -> Array:
        """ε-prediction training loss (reference `ddpm.py:207-235`).

        ``x`` is either an image batch [B,H,W,C] or, for conditional
        models, a dict ``{"image": [B,H,W,C], "label": [B]}``; a
        ``cfg_drop_prob`` fraction of labels is replaced by the NULL
        token (classifier-free-guidance training, Ho & Salimans 2022).
        """
        y = None
        if isinstance(x, dict):
            x, y = x["image"], x.get("label")
        kt, kn, kd = jax.random.split(rng, 3)
        b = x.shape[0]
        t = jax.random.randint(kt, (b,), 0, self.num_timesteps)
        noise = jax.random.normal(kn, x.shape, x.dtype)
        noisy_x = q_sample(self.schedule, x, t, noise)
        if y is not None and self.num_classes > 0:
            # fold_in (not a 4-way split) so the unconditional (t, noise,
            # dropout) stream for a given seed is unchanged from
            # unconditional-only builds — keeps old runs reproducible.
            ky = jax.random.fold_in(rng, 7)
            drop = jax.random.bernoulli(ky, self.cfg_drop_prob, (b,))
            y = jnp.where(drop, self.num_classes, y)
        pred = self.apply(params, noisy_x, t, train=True, rng=kd, y=y)
        # Target matches the configured parameterization (ε by default;
        # v / x₀ are supersets). The optional SNR time-weighting in
        # DiffusionLoss is defined on the ε-MSE and is applied unchanged
        # to other targets — use loss_config.weighting accordingly.
        target = prediction_target(self.schedule, x, noise, t,
                                   self.prediction_type)
        if not self.learn_sigma:
            return self.loss_fn(pred, target, t)
        # iDDPM hybrid objective (arXiv:2102.09672 eq. 16): L_simple on
        # the prediction half + λ·L_vlb on the variance half. The mean
        # entering L_vlb is stop-gradiented, so L_vlb trains ONLY the
        # variance channels (pinned in tests/test_models.py).
        mean_out, v_out = self._split_output(pred)
        l_simple = self.loss_fn(mean_out, target, t)
        eps_hat = prediction_to_eps(
            self.schedule, jax.lax.stop_gradient(mean_out), noisy_x, t,
            self.prediction_type)
        log_var = learned_range_log_variance(self.schedule, v_out, t)
        l_vlb = jnp.mean(vlb_term_bits(self.schedule, x, noisy_x, t,
                                       eps_hat, log_var))
        return l_simple + self.vlb_weight * l_vlb

    def _split_output(self, out: Array):
        """Split a raw network output into (prediction, variance-head)
        halves; (out, None) for fixed-variance models."""
        if not self.learn_sigma:
            return out, None
        c = self.image_channels
        return out[..., :c], out[..., c:]

    def make_class_labels(self, class_id: int, batch_size: int) -> Array:
        """Validate ``class_id`` and build a [batch_size] label array.

        Raises ValueError on unconditional models or out-of-range ids
        (XLA would otherwise clamp OOB indices onto the NULL embedding
        slot and silently sample unconditionally). Shared by the
        generate CLI and the HTTP server."""
        if self.num_classes <= 0:
            raise ValueError("model is unconditional "
                             "(model_config.num_classes == 0)")
        if not 0 <= int(class_id) < self.num_classes:
            raise ValueError(f"class_id must be in [0, {self.num_classes}) "
                             f"(0-based), got {class_id}")
        return jnp.full((batch_size,), int(class_id), jnp.int32)

    # -- ε-prediction closures (shared by all samplers) -------------------
    def eps_fn(self, params: Params, y: Optional[Array] = None,
               guidance_scale: float = 1.0):
        """Build ``eps(x, t_b)`` — plain, conditional, or CFG-guided
        (ε_u + s·(ε_c − ε_u), Ho & Salimans 2022). Misuse raises rather
        than silently returning wrong-mode samples.

        Non-ε parameterizations are converted here (prediction_to_eps),
        so every sampler sees ε̂ regardless of prediction_type. For CFG
        the guidance is applied to raw outputs and converted once — the
        conversions are affine in the output with a shared x-dependent
        offset, so this equals ε-space guidance exactly."""
        if y is not None and self.num_classes <= 0:
            raise ValueError(
                "labels passed to an unconditional model "
                "(model_config.num_classes == 0)")

        def to_eps(out, x, t_b):
            # learn_sigma models carry the variance head in the last C
            # channels; every ε-consumer (deterministic samplers, CFG,
            # benchmark reconstruction) uses the prediction half only.
            # Slicing is linear, so slicing AFTER the CFG combination
            # below equals guiding the sliced halves.
            out = self._split_output(out)[0]
            return prediction_to_eps(self.schedule, out, x, t_b,
                                     self.prediction_type)

        if y is None:
            if guidance_scale != 1.0:
                raise ValueError(
                    "guidance_scale requires labels (CFG needs a class "
                    "to guide towards)")
            return lambda x, t_b: to_eps(self.apply(params, x, t_b), x, t_b)
        if guidance_scale == 1.0:
            return lambda x, t_b: to_eps(self.apply(params, x, t_b, y=y),
                                         x, t_b)

        def guided(x, t_b):
            y_null = jnp.full_like(y, self.num_classes)
            o_c = self.apply(params, x, t_b, y=y)
            o_u = self.apply(params, x, t_b, y=y_null)
            return to_eps(o_u + guidance_scale * (o_c - o_u), x, t_b)

        return guided

    def mean_var_fn(self, params: Params, y: Optional[Array] = None,
                    guidance_scale: float = 1.0):
        """Build ``(x, t_b) -> (ε̂, log σ²)`` for learned-variance models.

        The prediction half follows the same CFG/conversion rules as
        :meth:`eps_fn`; the variance comes from the CONDITIONAL output's
        head (guided-diffusion's convention — guidance shifts the mean,
        not the uncertainty).
        """
        if not self.learn_sigma:
            raise ValueError("mean_var_fn requires learn_sigma=true")
        if y is not None and self.num_classes <= 0:
            raise ValueError(
                "labels passed to an unconditional model "
                "(model_config.num_classes == 0)")
        if y is None and guidance_scale != 1.0:
            raise ValueError(
                "guidance_scale requires labels (CFG needs a class "
                "to guide towards)")

        def fn(x, t_b):
            o_c = self.apply(params, x, t_b, y=y)
            pred, v = self._split_output(o_c)
            log_var = learned_range_log_variance(self.schedule, v, t_b)
            if y is not None and guidance_scale != 1.0:
                y_null = jnp.full_like(y, self.num_classes)
                pred_u, _ = self._split_output(
                    self.apply(params, x, t_b, y=y_null))
                pred = pred_u + guidance_scale * (pred - pred_u)
            e = prediction_to_eps(self.schedule, pred, x, t_b,
                                  self.prediction_type)
            return e, log_var

        return fn

    def posterior_step_fn(self, params: Params, y: Optional[Array] = None,
                          guidance_scale: float = 1.0):
        """One ancestral reverse step ``(x, t_b, noise) -> x_{t−1}``,
        dispatching on learn_sigma so every ancestral consumer (plain,
        CFG, inpainting, intermediates) gets the right variance."""
        if self.learn_sigma:
            mv = self.mean_var_fn(params, y, guidance_scale)

            def step(x, t_b, noise):
                e, log_var = mv(x, t_b)
                return ddpm_posterior_step_learned(self.schedule, x, t_b,
                                                   e, log_var, noise)
            return step
        eps = self.eps_fn(params, y, guidance_scale)
        return lambda x, t_b, noise: ddpm_posterior_step(
            self.schedule, x, t_b, eps(x, t_b), noise)

    # -- sampling ---------------------------------------------------------
    def _init_noise(self, rng: Array, batch_size: int):
        """Shared sampler preamble: (loop_key, x_T). Every sampler splits
        the rng ONCE for the initial noise, so a given rng yields the same
        x_T across the ancestral/DDIM/CFG/DPM entry points (cross-sampler
        comparisons depend on this single convention)."""
        k_init, k_loop = jax.random.split(rng)
        return k_loop, jax.random.normal(k_init,
                                         self.sample_shape(batch_size))

    def _denoise_range(self, params: Params, x: Array, rng: Array,
                       t_hi: int, t_lo: int, y: Optional[Array] = None,
                       guidance_scale: float = 1.0) -> Array:
        """Run reverse diffusion from t_hi−1 down to t_lo as one scan.
        ``y``/``guidance_scale`` select plain, conditional, or CFG-guided
        prediction; learn_sigma models use their learned variance
        (both via :meth:`posterior_step_fn`)."""
        steps = t_hi - t_lo
        b = x.shape[0]
        step_fn = self.posterior_step_fn(params, y, guidance_scale)

        def body(carry, inp):
            x, key = carry
            t_scalar = inp
            key, k_eps = jax.random.split(key)
            t_b = jnp.full((b,), t_scalar, jnp.int32)
            noise = jax.random.normal(k_eps, x.shape, x.dtype)
            x = step_fn(x, t_b, noise)
            return (x, key), None

        ts = jnp.arange(t_hi - 1, t_lo - 1, -1, dtype=jnp.int32)
        (x, _), _ = jax.lax.scan(body, (x, rng), ts, length=steps)
        return x

    @functools.partial(jax.jit, static_argnames=("self", "batch_size",
                                                 "guidance_scale"))
    def generate_samples_cfg(self, params: Params, rng: Array,
                             batch_size: int, labels: Array,
                             guidance_scale: float = 3.0) -> Array:
        """Class-conditional sampling with classifier-free guidance
        (superset — the reference is unconditional). ``labels`` is a
        [batch_size] int array; scale 1.0 = plain conditional."""
        k_loop, x = self._init_noise(rng, batch_size)
        return self._denoise_range(params, x, k_loop, self.num_timesteps,
                                   0, labels, guidance_scale)

    @functools.partial(jax.jit, static_argnames=("self", "batch_size"))
    def generate_samples(self, params: Params, rng: Array,
                         batch_size: int) -> Array:
        """Full T-step ancestral sampler (reference `ddpm.py:237-255`),
        one fused on-device scan, NHWC output in [-1, 1]-ish range."""
        k_loop, x = self._init_noise(rng, batch_size)
        return self._denoise_range(params, x, k_loop, self.num_timesteps, 0)

    @functools.partial(jax.jit,
                       static_argnames=("self", "batch_size", "num_steps",
                                        "guidance_scale"))
    def generate_samples_dpm(self, params: Params, rng: Array,
                             batch_size: int, num_steps: int = 20,
                             labels: Optional[Array] = None,
                             guidance_scale: float = 1.0) -> Array:
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
        if not 2 <= num_steps <= self.num_timesteps:
            raise ValueError(
                f"num_steps must be in [2, {self.num_timesteps}] (got "
                f"{num_steps}): 1 step runs no updates (returns raw "
                "noise); more steps than T duplicates grid points")
        p = make_dpm_solver_params(self.schedule, num_steps)
        b = batch_size
        _, x = self._init_noise(rng, b)

        eps_fn = self.eps_fn(params, labels, guidance_scale)

        def x0_of(x, j):
            t_b = jnp.full((b,), p.timesteps[j], jnp.int32)
            eps = eps_fn(x, t_b)
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

    @functools.partial(jax.jit,
                       static_argnames=("self", "batch_size", "num_steps",
                                        "rho", "guidance_scale"))
    def generate_samples_heun(self, params: Params, rng: Array,
                              batch_size: int, num_steps: int = 18,
                              rho: float = 7.0,
                              labels: Optional[Array] = None,
                              guidance_scale: float = 1.0) -> Array:
        """Karras-spaced Heun (EDM) deterministic sampler (Karras et al.
        2022, arXiv:2206.00364, Alg. 1) — capability superset of the
        reference, complementing DPM-Solver++(2M): a second-order
        single-step (predictor-corrector) ODE solver, the reference
        sampler of the EDM paper. TWO model evals per update
        (2·(num_steps−1) total) vs DPM++'s one, in exchange for the
        classic Heun error constant; with Karras ρ-spacing it
        concentrates steps at low noise where the trajectory curves.

        Math (see schedules.KarrasHeunParams): in x̂ = x/α, σ̂ = σ/α
        coordinates the probability-flow ODE is dx̂/dσ̂ = ε̂(x, t), so the
        update is plain Heun on that ODE; ε̂ comes from eps_fn, making
        the sampler parameterization-agnostic and CFG-capable. No x₀
        thresholding (EDM convention), unlike the DDIM/DPM++ paths.
        One `lax.scan`, solver order pinned in
        tests/test_models.py::test_heun_second_order_convergence.
        """
        if not 2 <= num_steps <= self.num_timesteps:
            raise ValueError(
                f"num_steps must be in [2, {self.num_timesteps}] (got "
                f"{num_steps}): 1 step runs no updates (returns raw "
                "noise); more steps than T duplicates grid points")
        p = make_karras_heun_params(self.schedule, num_steps, rho)
        b = batch_size
        _, x = self._init_noise(rng, b)

        eps_fn = self.eps_fn(params, labels, guidance_scale)

        def body(x, j):
            t_cur = jnp.full((b,), p.timesteps[j - 1], jnp.int32)
            t_nxt = jnp.full((b,), p.timesteps[j], jnp.int32)
            dsig = p.sigma_hat[j] - p.sigma_hat[j - 1]      # < 0
            d_cur = eps_fn(x, t_cur)
            x_hat = x / p.alpha[j - 1]
            x_eul = p.alpha[j] * (x_hat + dsig * d_cur)      # predictor
            d_nxt = eps_fn(x_eul, t_nxt)
            x = p.alpha[j] * (x_hat + dsig * 0.5 * (d_cur + d_nxt))
            return x, None

        x, _ = jax.lax.scan(body, x, jnp.arange(1, num_steps))
        return x

    @functools.partial(jax.jit,
                       static_argnames=("self", "batch_size", "num_steps",
                                        "guidance_scale"))
    def generate_samples_strided(self, params: Params, rng: Array,
                                 batch_size: int, num_steps: int = 100,
                                 labels: Optional[Array] = None,
                                 guidance_scale: float = 1.0) -> Array:
        """Respaced (strided) ancestral sampler — iDDPM §4
        (arXiv:2102.09672): run the STOCHASTIC reverse process over an
        evenly-spaced S-step subsequence using the re-derived coarse
        schedule (schedules.respaced_schedule), evaluating the trained
        model at the original timesteps. The fast sampler that keeps
        DDPM's noise injection (unlike the deterministic DDIM/DPM++/
        Heun paths) and the intended way to sample learned-variance
        models quickly — the learned-range interpolation is re-anchored
        to the coarse schedule's [β̃_new, β_new] extremes, exactly the
        paper's recipe. At S = T this reduces to :meth:`generate_samples`
        (pinned in tests). One `lax.scan`; CFG-capable.
        """
        ts = respace_timesteps(self.num_timesteps, num_steps)  # validates
        sub = respaced_schedule(self.schedule, ts)
        b = batch_size
        k_loop, x = self._init_noise(rng, b)
        eps_fn = self.eps_fn(params, labels, guidance_scale)
        raw_fn = None
        if self.learn_sigma:
            # variance head comes from the CONDITIONAL output (same
            # convention as mean_var_fn); ε̂ still goes through eps_fn so
            # CFG/parameterization handling is shared. The apply() here
            # duplicates one of eps_fn's — identical pure calls on the
            # same operands, so XLA CSEs them to ONE UNet eval per step.
            def raw_fn(x, t_b):
                return self._split_output(
                    self.apply(params, x, t_b, y=labels))[1]

        def body(carry, j):
            x, key = carry
            key, k_eps = jax.random.split(key)
            t_b = jnp.full((b,), ts[j], jnp.int32)     # model's clock
            j_b = jnp.full((b,), j, jnp.int32)         # coarse clock
            eps = eps_fn(x, t_b)
            noise = jax.random.normal(k_eps, x.shape, x.dtype)
            if self.learn_sigma:
                log_var = learned_range_log_variance(sub, raw_fn(x, t_b),
                                                     j_b)
                x = ddpm_posterior_step_learned(sub, x, j_b, eps, log_var,
                                                noise)
            else:
                x = ddpm_posterior_step(sub, x, j_b, eps, noise)
            return (x, key), None

        js = jnp.arange(num_steps - 1, -1, -1, dtype=jnp.int32)
        (x, _), _ = jax.lax.scan(body, (x, k_loop), js)
        return x

    @functools.partial(jax.jit, static_argnames=("self", "guidance_scale"))
    def generate_samples_inpaint(self, params: Params, rng: Array,
                                 image: Array, mask: Array,
                                 labels: Optional[Array] = None,
                                 guidance_scale: float = 1.0) -> Array:
        """Inpainting: regenerate the masked-out region of ``image``
        conditioned on the known pixels (superset — the reference has no
        conditional generation at all).

        RePaint's replacement method (Lugmayr et al. 2022, arXiv:2201.09865
        §3, without the resampling schedule): at every reverse step the
        known region is overwritten with the forward-diffused conditioning
        image at the new noise level, so the denoiser always sees known
        pixels at the correct noise scale and harmonizes the unknown
        region against them. One `lax.scan`, same cost as the ancestral
        sampler.

        Args:
            image: [B,H,W,C] conditioning images in the model's data range.
            mask: broadcastable to image; 1.0 = known (kept), 0.0 = to
                generate. Soft values blend.
            labels / guidance_scale: optional CFG conditioning, as in
                :meth:`generate_samples_cfg`.
        """
        b = image.shape[0]
        k_loop, x = self._init_noise(rng, b)
        step_fn = self.posterior_step_fn(params, labels, guidance_scale)
        mask = jnp.broadcast_to(mask, image.shape).astype(image.dtype)

        def body(carry, t_scalar):
            x, key = carry
            key, k_eps, k_q = jax.random.split(key, 3)
            t_b = jnp.full((b,), t_scalar, jnp.int32)
            noise = jax.random.normal(k_eps, x.shape, x.dtype)
            x = step_fn(x, t_b, noise)
            # Known region at the level the chain has just reached (t−1;
            # q_sample at t=0 is ≈ the clean image, √ᾱ₀ ≈ 1).
            t_prev = jnp.maximum(t_b - 1, 0)
            known = q_sample(self.schedule, image, t_prev,
                             jax.random.normal(k_q, x.shape, x.dtype))
            x = mask * known + (1.0 - mask) * x
            return (x, key), None

        ts = jnp.arange(self.num_timesteps - 1, -1, -1, dtype=jnp.int32)
        (x, _), _ = jax.lax.scan(body, (x, k_loop), ts)
        # Exact known pixels in the output (the last projection used t=0's
        # still-slightly-noised q-sample).
        return mask * image + (1.0 - mask) * x

    @functools.partial(jax.jit, static_argnames=("self",))
    def nll_bits_per_dim(self, params: Params, x: Array,
                         rng: Array) -> Array:
        """Per-image negative log-likelihood bound in bits/dim — the
        full variational bound L_vlb = Σ_t L_t + L_T (Ho et al. eq. 5;
        the iDDPM paper's headline NLL metric, arXiv:2102.09672 Table 2).

        Each L_{t−1} term (KL for t>0, discretized decoder NLL at t=0,
        schedules.vlb_term_bits) is estimated with ONE q-sample of x_t;
        L_T = KL(q(x_T|x₀) ‖ N(0, I)) is closed-form. Fixed-variance
        models are scored with the variance their sampler actually uses
        (clipped β̃, i.e. 'fixed_small'); learn_sigma models use their
        learned log-variance — this is exactly the quantity the hybrid
        objective's VLB half optimizes, so a trained learn_sigma model
        scores strictly better here. One `lax.scan` over all T terms.

        Args:
            x: [B,H,W,C] images in [−1, 1] (the discretized decoder
                assumes 256-level quantization of that range).
        Returns:
            [B] total bits/dim (lower is better).
        """
        b = x.shape[0]
        sched = self.schedule
        T = self.num_timesteps

        def term(carry, inp):
            total, key = carry
            t_scalar = inp
            key, k_q = jax.random.split(key)
            t_b = jnp.full((b,), t_scalar, jnp.int32)
            noise = jax.random.normal(k_q, x.shape, x.dtype)
            x_t = q_sample(sched, x, t_b, noise)
            out = self.apply(params, x_t, t_b)
            pred, v = self._split_output(out)
            eps = prediction_to_eps(sched, pred, x_t, t_b,
                                    self.prediction_type)
            if self.learn_sigma:
                log_var = learned_range_log_variance(sched, v, t_b)
            else:
                log_var = jnp.broadcast_to(
                    jnp.take(posterior_log_variance_clipped(sched),
                             t_b)[:, None, None, None], x.shape)
            total = total + vlb_term_bits(sched, x, x_t, t_b, eps, log_var)
            return (total, key), None

        (total, _), _ = jax.lax.scan(
            term, (jnp.zeros((b,), jnp.float32), rng),
            jnp.arange(T, dtype=jnp.int32))

        # Prior term L_T: KL(q(x_T|x₀) ‖ N(0, I)) in bits/dim.
        a_T = sched.sqrt_alphas_cumprod[-1]
        lv_T = jnp.log(1.0 - sched.alphas_cumprod[-1])
        kl_T = normal_kl(a_T * x, lv_T, jnp.zeros_like(x),
                         jnp.zeros_like(x))
        kl_T = kl_T.reshape(b, -1).mean(axis=1) / jnp.log(2.0)
        return total + kl_T

    def generate_samples_with_intermediates(
            self, params: Params, rng: Array, batch_size: int,
            save_interval: int = 100) -> List[Array]:
        """Sampler that also returns intermediate frames.

        Reference `ddpm.py:257-284`: frames at the initial noise and after
        each step with t % save_interval == 0 (t=0 always included). The
        chunk boundaries are static Python ints, so each chunk is one scan
        and jit caching works across calls.
        """
        k_loop, x = self._init_noise(rng, batch_size)
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
