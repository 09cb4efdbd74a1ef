"""Model-family tests: shapes, losses, samplers, checkpoints (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_universal_tpu.models import (DDIM, DDPM, MODEL_REGISTRY,
                                                  EnergyBasedDiffusion,
                                                  ScoreBasedDiffusion)

# Tiny configs so CPU tests stay fast.
TINY = {
    "num_timesteps": 8,
    "image_size": 32,
    "in_channels": 3,
    "model_channels": 8,
    "compute_dtype": "float32",
    "use_pallas": False,
    "remat": False,
    "loss_config": {"use_time_weighting": False},
}


@pytest.fixture(scope="module")
def ddpm_and_params():
    model = DDPM(TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_registry_contains_all_families():
    assert set(MODEL_REGISTRY) == {"ddpm", "ddim", "score_based",
                                   "energy_based"}


def test_all_families_instantiable():
    """Defect D1 fix: every family constructs and exposes BOTH
    generate_samples and sample."""
    for name, cls in MODEL_REGISTRY.items():
        m = cls(dict(TINY))
        assert callable(m.generate_samples)
        assert callable(m.sample)


def test_ddpm_forward_shape(ddpm_and_params):
    model, params = ddpm_and_params
    x = jnp.zeros((2, 32, 32, 3))
    t = jnp.array([0, 3])
    out = model.apply(params, x, t)
    assert out.shape == (2, 32, 32, 3)


def test_ddpm_loss_finite_and_differentiable(ddpm_and_params):
    model, params = ddpm_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    loss, grads = jax.value_and_grad(model.loss_function)(
        params, x, jax.random.PRNGKey(2))
    assert jnp.isfinite(loss)
    gnorm = sum(float(jnp.sum(g ** 2))
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_ddpm_sampler_shape_and_determinism(ddpm_and_params):
    model, params = ddpm_and_params
    key = jax.random.PRNGKey(3)
    s1 = model.generate_samples(params, key, 2)
    s2 = model.generate_samples(params, key, 2)
    assert s1.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))
    s3 = model.generate_samples(params, jax.random.PRNGKey(4), 2)
    assert not np.allclose(np.asarray(s1), np.asarray(s3))


def test_ddpm_intermediates(ddpm_and_params):
    model, params = ddpm_and_params
    frames = model.generate_samples_with_intermediates(
        params, jax.random.PRNGKey(0), 1, save_interval=4)
    # T=8, saves after t∈{4, 0} → initial + 2 frames.
    assert len(frames) == 3
    assert all(f.shape == (1, 32, 32, 3) for f in frames)
    # Final frame must equal straight sampling path over same chunks
    assert np.all(np.isfinite(np.asarray(frames[-1])))


def test_ddpm_model_checkpoint_roundtrip(tmp_path, ddpm_and_params):
    model, params = ddpm_and_params
    path = str(tmp_path / "model.ckpt")
    model.save(path, params)
    loaded = model.load(path)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    model2, params2 = DDPM.load_with_config(path)
    assert model2.num_timesteps == model.num_timesteps


def test_ddim_sampler_deterministic_at_eta0():
    cfg = dict(TINY, ddim_sampling_steps=4, eta=0.0)
    model = DDIM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(5)
    s1 = model.generate_samples(params, key, 2)
    assert s1.shape == (2, 32, 32, 3)
    s2 = model.generate_samples(params, key, 2)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))


def test_ddim_buffers_indexed_by_position():
    """Defect D4 fix: DDIM buffers have length S and the sampler indexes
    them with positions, so S≪T cannot go out of range."""
    cfg = dict(TINY, num_timesteps=8, ddim_sampling_steps=4)
    model = DDIM(cfg)
    assert model.ddim_params.alphas.shape == (4,)
    params = model.init_params(jax.random.PRNGKey(0))
    out = model.generate_samples(params, jax.random.PRNGKey(0), 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ddim_training_matches_ddpm():
    """DDIM trains exactly like DDPM (same loss path)."""
    cfg = dict(TINY, ddim_sampling_steps=4)
    ddim = DDIM(cfg)
    ddpm = DDPM(TINY)
    p = ddpm.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    l1 = ddpm.loss_function(p, x, jax.random.PRNGKey(2))
    l2 = ddim.loss_function(p, x, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_score_based_loss_and_sampler():
    cfg = dict(TINY, num_scales=4, langevin_steps=2, sigma_min=0.1,
               sigma_max=1.0)
    model = ScoreBasedDiffusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    loss, grads = jax.value_and_grad(model.loss_function)(
        params, x, jax.random.PRNGKey(2))
    assert jnp.isfinite(loss)
    out = model.sample(params, jax.random.PRNGKey(3), 2)
    assert out.shape == (2, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_energy_based_loss_and_sampler():
    cfg = dict(TINY, langevin_steps=2, langevin_step_size=0.01)
    model = EnergyBasedDiffusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    loss, grads = jax.value_and_grad(model.loss_function)(
        params, x, jax.random.PRNGKey(2))
    assert jnp.isfinite(loss)
    gnorm = sum(float(jnp.sum(g ** 2))
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
    out = model.sample(params, jax.random.PRNGKey(3), 1)
    assert out.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_energy_net_scalar_output():
    model = EnergyBasedDiffusion(dict(TINY))
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.ones((4, 32, 32, 3))
    t = jnp.array([0, 1, 2, 3])
    e = model.apply(params, x, t)
    assert e.shape == (4,)


def test_yaml_spelling_reaches_model():
    """Defect D9 fix end-to-end: reference YAML keys configure the model."""
    model = DDPM({"time_steps": 16, "hidden_channels": 8,
                  "image_channels": 1, "image_size": 32,
                  "compute_dtype": "float32", "remat": False})
    assert model.num_timesteps == 16
    assert model.net.model_channels == 8
    assert model.net.in_channels == 1
    assert model.image_channels == 1


def test_ddpm_ancestral_sampler_recovers_unit_gaussian():
    """End-to-end sampler DISTRIBUTION check: for x₀ ~ N(0, I) the optimal
    ε-predictor is ε̂(x_t, t) = √(1−ᾱ_t)·x_t; running the full ancestral
    chain with it must produce samples with mean≈0, var≈1. Catches any
    scale/σ bug in the reverse-process math that shape tests cannot."""
    class AnalyticDDPM(DDPM):
        def apply(self, params, x, t, train=False, rng=None):
            coef = jnp.take(self.schedule.sqrt_one_minus_alphas_cumprod, t)
            return coef[:, None, None, None] * x

    model = AnalyticDDPM({"num_timesteps": 200, "image_size": 32,
                          "in_channels": 1, "model_channels": 8,
                          "compute_dtype": "float32", "use_pallas": False,
                          "remat": False})
    samples = model.generate_samples({}, jax.random.PRNGKey(0), 64)
    vals = np.asarray(samples).ravel()
    assert abs(vals.mean()) < 0.05, vals.mean()
    assert 0.9 < vals.var() < 1.1, vals.var()


class _AnalyticDDPM(DDPM):
    """Exact ε-posterior for Gaussian data x₀ ~ N(0, 0.1²):
    ε*(x,t) = σ_t·x/(σ_t² + 0.01·α_t²) — closed-form, smooth in λ, so
    solver order is observable without a trained network."""

    DATA_VAR = 0.01

    def apply(self, params, x, t, train=False, rng=None):
        abar = jnp.take(self.schedule.alphas_cumprod, t)[:, None, None, None]
        return jnp.sqrt(1 - abar) * x / ((1 - abar) + self.DATA_VAR * abar)


def test_dpm_solver_second_order_convergence():
    """DPM-Solver++(2M) must (a) reduce to the DDIM-equivalent
    first-order update on its first step and (b) converge to the fine-
    grid ODE solution much faster than first order: on the analytic
    model its S=20 error vs a 400-step reference is ~100× below a
    first-order solver on the same grid."""
    cfg = {"num_timesteps": 1000, "image_size": 32, "in_channels": 3,
           "model_channels": 8, "compute_dtype": "float32"}
    m = _AnalyticDDPM(cfg)
    params = m.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(3)

    from diffusion_model_universal_tpu.models.schedules import \
        make_dpm_solver_params

    def first_order(S, b=4):
        p = make_dpm_solver_params(m.schedule, S)
        k_init, _ = jax.random.split(key)
        x = jax.random.normal(k_init, m.sample_shape(b))
        for j in range(1, S):
            t_b = jnp.full((b,), p.timesteps[j - 1], jnp.int32)
            eps = m.apply(params, x, t_b)
            x0 = jnp.clip((x - p.sigma[j - 1] * eps) / p.alpha[j - 1], -1, 1)
            h = p.lam[j] - p.lam[j - 1]
            x = (p.sigma[j] / p.sigma[j - 1]) * x \
                - p.alpha[j] * jnp.expm1(-h) * x0
        return np.asarray(x)

    ref = first_order(400)
    e1 = np.abs(first_order(20) - ref).mean()
    e2 = np.abs(np.asarray(
        m.generate_samples_dpm(params, key, 4, num_steps=20)) - ref).mean()
    assert e2 < e1 / 20, (e1, e2)   # measured ~100× on this model


def test_dpm_sampler_shape_and_determinism(ddpm_and_params):
    model, params = ddpm_and_params
    key = jax.random.PRNGKey(11)
    a = model.generate_samples_dpm(params, key, 2, num_steps=6)
    b = model.generate_samples_dpm(params, key, 2, num_steps=6)
    assert a.shape == model.sample_shape(2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(a)).all()


def test_heun_second_order_convergence():
    """Karras-spaced Heun must be a genuine 2nd-order solver: on the
    analytic model, doubling the grid cuts its error ~4× (vs ~2× for
    the 1st-order Euler update on the SAME snapped grid), and at S=40
    it beats Euler by a wide margin (measured: 0.0075 vs 0.0014 at
    S=40, 0.0039 vs 0.00033 at S=80)."""
    cfg = {"num_timesteps": 1000, "image_size": 32, "in_channels": 3,
           "model_channels": 8, "compute_dtype": "float32"}
    m = _AnalyticDDPM(cfg)
    key = jax.random.PRNGKey(3)

    from diffusion_model_universal_tpu.models.schedules import \
        make_karras_heun_params

    def euler(S, b=4):
        p = make_karras_heun_params(m.schedule, S)
        k_init, _ = jax.random.split(key)
        x = jax.random.normal(k_init, m.sample_shape(b))
        for j in range(1, S):
            t_b = jnp.full((b,), p.timesteps[j - 1], jnp.int32)
            d = m.apply({}, x, t_b)
            x = p.alpha[j] * (x / p.alpha[j - 1]
                              + (p.sigma_hat[j] - p.sigma_hat[j - 1]) * d)
        return np.asarray(x)

    def heun(S):
        return np.asarray(m.generate_samples_heun({}, key, 4, num_steps=S))

    ref = heun(400)
    eh20, eh40 = (np.abs(heun(S) - ref).mean() for S in (20, 40))
    ee20, ee40 = (np.abs(euler(S) - ref).mean() for S in (20, 40))
    assert eh40 < eh20 / 3, (eh20, eh40)        # order 2: ~4× per doubling
    assert ee40 > ee20 / 3, (ee20, ee40)        # order 1: ~2× per doubling
    assert eh40 < ee40 / 4, (ee40, eh40)


def test_heun_sampler_shape_and_determinism(ddpm_and_params):
    model, params = ddpm_and_params
    key = jax.random.PRNGKey(11)
    a = model.generate_samples_heun(params, key, 2, num_steps=5)
    b = model.generate_samples_heun(params, key, 2, num_steps=5)
    assert a.shape == model.sample_shape(2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(a)).all()
    with pytest.raises(ValueError, match="num_steps"):
        model.generate_samples_heun(params, key, 2, num_steps=1)


def test_score_final_denoise_option():
    """`final_denoise: true` applies the Tweedie step x += σ_min²·score
    after the Langevin ladder (Song & Ermon 2020 Technique 5); default
    off for reference parity."""
    from diffusion_model_universal_tpu.models import ScoreBasedDiffusion
    base = {"image_size": 32, "in_channels": 3, "model_channels": 8,
            "num_scales": 3, "langevin_steps": 2, "sigma_min": 0.5,
            "sigma_max": 2.0, "compute_dtype": "float32",
            "use_pallas": False, "remat": False}
    m0 = ScoreBasedDiffusion(base)
    m1 = ScoreBasedDiffusion(dict(base, final_denoise=True))
    params = m0.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    x0 = m0.generate_samples(params, key, 2)
    x1 = m1.generate_samples(params, key, 2)
    assert x0.shape == x1.shape == (2, 32, 32, 3)
    # Same chain, then one extra σ_min²·score step.
    sig = jnp.full((2,), 0.5)
    expect = x0 + 0.5 ** 2 * m0.apply(params, x0, sig)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(expect),
                               rtol=1e-5, atol=1e-6)


def test_energy_dsm_objective():
    """`training_objective: dsm` trains −∇ₓE as the score — the loss is
    the unit-scale ε-regression ‖√(1−ᾱ)∇E − ε‖², gradients flow through
    the second-order ∇_θ∇ₓE, and sampling runs the DDPM ancestral chain
    on ε̂ = √(1−ᾱ)·∇ₓE. Default 'cd' keeps reference parity."""
    cfg = dict(TINY, training_objective="dsm")
    model = EnergyBasedDiffusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    loss, grads = jax.value_and_grad(model.loss_function)(
        params, x, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(g ** 2))
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0

    # ε̂ identity: √(1−ᾱ_t)·∇ₓ(ΣE) at the requested t.
    t = jnp.array([1, 5])
    eps = model._eps_from_energy(params, x, t)
    manual = jax.grad(
        lambda z: jnp.sum(model.apply(params, z, t)))(x)
    sigma = jnp.sqrt(1.0 - model.schedule.alphas_cumprod[t])
    np.testing.assert_allclose(np.asarray(eps),
                               np.asarray(sigma[:, None, None, None]
                                          * manual), rtol=1e-5)

    out = model.generate_samples(params, jax.random.PRNGKey(3), 2)
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
    frames = model.generate_samples_with_intermediates(
        params, jax.random.PRNGKey(4), 1, save_interval=4)
    assert len(frames) >= 2
    assert all(f.shape == (1, 32, 32, 3) for f in frames)

    with pytest.raises(ValueError, match="training_objective"):
        EnergyBasedDiffusion(dict(TINY, training_objective="wgan"))


def test_score_sigma_parameterization():
    """`score_parameterization: sigma` (NCSNv2 Technique 3) divides the
    net output by σ — same params, score == raw/σ — and makes the
    σ²-weighted DSM target unit-scale; default "raw" is reference
    parity (`/root/reference/models/score_based.py:165-177`)."""
    import pytest

    from diffusion_model_universal_tpu.models import ScoreBasedDiffusion
    base = {"image_size": 32, "in_channels": 3, "model_channels": 8,
            "num_scales": 3, "langevin_steps": 2, "sigma_min": 0.5,
            "sigma_max": 2.0, "compute_dtype": "float32",
            "use_pallas": False, "remat": False}
    raw = ScoreBasedDiffusion(base)
    scaled = ScoreBasedDiffusion(dict(base,
                                      score_parameterization="sigma"))
    params = raw.init_params(jax.random.PRNGKey(0))  # same net/params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    sig = jnp.array([0.5, 2.0])
    np.testing.assert_allclose(
        np.asarray(scaled.apply(params, x, sig)),
        np.asarray(raw.apply(params, x, sig)) / sig[:, None, None, None],
        rtol=1e-6)
    loss = scaled.loss_function(params, x, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    with pytest.raises(ValueError, match="score_parameterization"):
        ScoreBasedDiffusion(dict(base, score_parameterization="bogus"))


# -- prediction_type parameterizations (superset: ε / v / x0) -------------

class _PTypeAnalyticDDPM(DDPM):
    """DDPM whose 'network' is the SAME analytic ε-model expressed in the
    configured parameterization — if eps_fn's conversions are right, every
    sampler must produce bit-identical trajectories across types."""

    def apply(self, params, x, t, train=False, rng=None, y=None):
        tb = t.astype(x.dtype)[:, None, None, None]
        eps = 0.3 * x + 0.01 * (tb + 1.0)
        if y is not None:
            eps = eps + 0.02 * y.astype(x.dtype)[:, None, None, None]
        if self.prediction_type == "epsilon":
            return eps
        ac = jnp.take(self.schedule.alphas_cumprod, t)[:, None, None, None]
        a, s = jnp.sqrt(ac), jnp.sqrt(1.0 - ac)
        if self.prediction_type == "v":
            return (eps - s * x) / a
        return (x - s * eps) / a  # x0


@pytest.mark.parametrize("sampler", ["ancestral", "ddim", "dpm", "heun",
                                     "cfg"])
def test_samplers_invariant_to_prediction_type(sampler):
    rng = jax.random.PRNGKey(3)
    outs = {}
    for ptype in ("epsilon", "v", "x0"):
        cfg = dict(TINY, prediction_type=ptype, num_classes=4,
                   ddim_sampling_steps=4)
        model = (_PTypeAnalyticDDPM(cfg) if sampler != "ddim"
                 else type("A", (_PTypeAnalyticDDPM, DDIM), {})(cfg))
        if sampler == "ancestral":
            out = model.generate_samples(params={}, rng=rng, batch_size=2)
        elif sampler == "ddim":
            out = DDIM.generate_samples(model, params={}, rng=rng,
                                        batch_size=2)
        elif sampler == "dpm":
            out = model.generate_samples_dpm(params={}, rng=rng,
                                             batch_size=2, num_steps=4)
        elif sampler == "heun":
            out = model.generate_samples_heun(params={}, rng=rng,
                                              batch_size=2, num_steps=4)
        else:  # cfg-guided ancestral
            labels = jnp.array([1, 2])
            out = model.generate_samples_cfg(params={}, rng=rng,
                                             batch_size=2, labels=labels,
                                             guidance_scale=2.0)
        outs[ptype] = np.asarray(out)
    np.testing.assert_allclose(outs["v"], outs["epsilon"], atol=2e-4)
    np.testing.assert_allclose(outs["x0"], outs["epsilon"], atol=2e-4)


@pytest.mark.parametrize("ptype", ["v", "x0"])
def test_prediction_type_loss_trains(ptype):
    model = DDPM(dict(TINY, prediction_type=ptype))
    params = model.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    loss, grads = jax.value_and_grad(model.loss_function)(
        params, x, jax.random.PRNGKey(2))
    assert jnp.isfinite(loss)
    gnorm = sum(float(jnp.sum(g ** 2))
                for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0.0


def test_prediction_type_rejected_on_bad_value():
    with pytest.raises(ValueError, match="prediction_type"):
        DDPM(dict(TINY, prediction_type="velocity"))


def test_inpaint_keeps_known_region_and_fills_rest():
    model = _PTypeAnalyticDDPM(dict(TINY))
    rng = jax.random.PRNGKey(5)
    image = jnp.tile(jnp.linspace(-0.5, 0.5, 32)[None, :, None, None],
                     (2, 1, 32, 3))
    mask = jnp.zeros((1, 32, 32, 1)).at[:, :16].set(1.0)  # top half known
    out = np.asarray(model.generate_samples_inpaint(
        params={}, rng=rng, image=image, mask=mask))
    assert out.shape == image.shape and np.isfinite(out).all()
    m = np.broadcast_to(np.asarray(mask), out.shape).astype(bool)
    np.testing.assert_array_equal(out[m], np.asarray(image)[m])
    # The generated half must NOT be a copy of the conditioning image.
    assert np.abs(out[~m] - np.asarray(image)[~m]).max() > 0.05


# -- iDDPM learned variance (learn_sigma, arXiv:2102.09672) ----------------

class _LearnSigmaAnalytic(DDPM):
    """Analytic ε (same posterior as _AnalyticDDPM) plus a constant
    variance head drawn from ``params['v']`` — lets the learned-variance
    machinery be tested without a trained network."""

    DATA_VAR = 0.01

    def apply(self, params, x, t, train=False, rng=None, y=None):
        abar = jnp.take(self.schedule.alphas_cumprod, t)[:, None, None, None]
        eps = jnp.sqrt(1 - abar) * x / ((1 - abar) + self.DATA_VAR * abar)
        v = jnp.full_like(eps, params["v"] if "v" in params else -1.0)
        return jnp.concatenate([eps, v], axis=-1)


def test_learn_sigma_ancestral_matches_fixed_at_v_min():
    """With the variance head pinned at v=−1 (log σ² = clipped log β̃)
    the learned-variance ancestral chain must reproduce the fixed-β̃
    chain: same ε, same rng stream, same posterior mean, and β̃ vs
    clipped-β̃ only differ at t=0 where the noise is gated off."""
    cfg = dict(TINY, num_timesteps=16)
    fixed = _AnalyticDDPM(cfg)
    learned = _LearnSigmaAnalytic(dict(cfg, learn_sigma=True))
    key = jax.random.PRNGKey(5)
    a = np.asarray(fixed.generate_samples({}, key, 4))
    b = np.asarray(learned.generate_samples({"v": -1.0}, key, 4))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    # a wider variance (v=+1 → β_t) must change the trajectory
    c = np.asarray(learned.generate_samples({"v": 1.0}, key, 4))
    assert np.abs(c - b).max() > 1e-3


def test_learn_sigma_deterministic_samplers_use_prediction_half():
    """DPM++/Heun consume ε̂ only: on the analytic model their output
    must be identical for any value of the variance head."""
    cfg = dict(TINY, num_timesteps=1000, learn_sigma=True)
    m = _LearnSigmaAnalytic(cfg)
    key = jax.random.PRNGKey(7)
    for fn in (m.generate_samples_dpm, m.generate_samples_heun):
        lo = np.asarray(fn({"v": -1.0}, key, 2, num_steps=6))
        hi = np.asarray(fn({"v": 1.0}, key, 2, num_steps=6))
        np.testing.assert_array_equal(lo, hi)
        assert np.isfinite(lo).all()


def test_learn_sigma_vlb_trains_only_variance_head():
    """Hybrid-objective gradient separation (the paper's stop-gradient):
    the VLB weight must not change the gradient of the prediction path,
    and the variance path must receive gradient ONLY through the VLB."""

    class _ParamHeads(DDPM):
        def apply(self, params, x, t, train=False, rng=None, y=None):
            eps = params["a"] * x
            v = jnp.broadcast_to(params["b"], x.shape)
            return jnp.concatenate([eps, v], axis=-1)

    cfg = dict(TINY, num_timesteps=8, learn_sigma=True, vlb_weight=1e-2)
    m = _ParamHeads(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 32, 32, 3),
                           minval=-0.9, maxval=0.9)
    params = {"a": jnp.asarray(0.5), "b": jnp.asarray(0.0)}
    g = jax.grad(m.loss_function)(params, x, jax.random.PRNGKey(1))
    assert float(jnp.abs(g["b"])) > 0.0  # variance head DOES train

    m0 = _ParamHeads(dict(cfg, vlb_weight=0.0))
    g0 = jax.grad(m0.loss_function)(params, x, jax.random.PRNGKey(1))
    # prediction-path gradient is identical with/without the VLB term
    np.testing.assert_allclose(float(g["a"]), float(g0["a"]), rtol=1e-6)
    # ... and with weight 0 the variance head gets no gradient at all
    assert float(jnp.abs(g0["b"])) == 0.0


def test_learn_sigma_unet_end_to_end():
    """Real tiny UNet with learn_sigma: 2C-channel forward, finite
    hybrid loss/grads, C-channel samples from the learned-variance
    ancestral sampler, checkpoint roundtrip."""
    cfg = dict(TINY, learn_sigma=True)
    m = DDPM(cfg)
    params = m.init_params(jax.random.PRNGKey(0))
    out = m.apply(params, jnp.zeros((2, 32, 32, 3)), jnp.array([0, 3]))
    assert out.shape == (2, 32, 32, 6)

    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3),
                           minval=-1.0, maxval=1.0)
    loss, grads = jax.value_and_grad(m.loss_function)(
        params, x, jax.random.PRNGKey(2))
    assert jnp.isfinite(loss)
    assert all(jnp.isfinite(g).all() for g in jax.tree_util.tree_leaves(grads))

    s = m.generate_samples(params, jax.random.PRNGKey(3), 2)
    assert s.shape == m.sample_shape(2)
    assert np.isfinite(np.asarray(s)).all()

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = d + "/m.ckpt"
        m.save(path, params)
        m2, params2 = DDPM.load_with_config(path)
        assert m2.learn_sigma
        s2 = m2.generate_samples(params2, jax.random.PRNGKey(3), 2)
        np.testing.assert_array_equal(np.asarray(s), np.asarray(s2))


# -- strided (respaced) ancestral sampler (iDDPM §4) -----------------------

def test_strided_reduces_to_full_chain_at_full_resolution():
    """At S = T the respaced schedule's β table equals the original
    (up to cumprod-ratio float noise) and the rng stream is identical,
    so the strided sampler must reproduce generate_samples."""
    cfg = dict(TINY, num_timesteps=16)
    m = _AnalyticDDPM(cfg)
    key = jax.random.PRNGKey(9)
    full = np.asarray(m.generate_samples({}, key, 4))
    strided = np.asarray(m.generate_samples_strided({}, key, 4,
                                                    num_steps=16))
    np.testing.assert_allclose(strided, full, rtol=1e-4, atol=1e-5)


def test_strided_shape_determinism_and_validation(ddpm_and_params):
    model, params = ddpm_and_params
    key = jax.random.PRNGKey(12)
    a = model.generate_samples_strided(params, key, 2, num_steps=4)
    b = model.generate_samples_strided(params, key, 2, num_steps=4)
    assert a.shape == model.sample_shape(2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(a)).all()
    with pytest.raises(ValueError, match="num_steps"):
        model.generate_samples_strided(params, key, 2, num_steps=1)


def test_strided_converges_to_full_chain_statistics():
    """Fixed-β̃ striding UNDERSHOOTS the reverse variance for data with
    spread (the iDDPM §3.1 phenomenon — β̃ is the zero-data-uncertainty
    lower bound), so the coarse chain's terminal std is low but must
    converge monotonically to the full chain's as S→T (measured here:
    0.073 → 0.085 → 0.090 vs full 0.095 at S=40/100/200, T=400)."""
    cfg = dict(TINY, num_timesteps=400)
    m = _AnalyticDDPM(cfg)
    key = jax.random.PRNGKey(2)
    full = np.asarray(m.generate_samples({}, key, 8))
    err = {S: abs(np.asarray(
               m.generate_samples_strided({}, key, 8, num_steps=S)).std()
               / full.std() - 1.0) for S in (40, 200)}
    assert abs(np.asarray(m.generate_samples_strided(
        {}, key, 8, num_steps=40)).mean() - full.mean()) < 0.02
    assert err[200] < err[40]          # convergence toward the full chain
    assert err[200] < 0.10
    assert err[40] < 0.35              # coarse but sane


def test_strided_learned_variance_recovers_full_chain_statistics():
    """WHY learn_sigma exists (iDDPM §3.1): at S=40 the fixed-β̃ chain's
    terminal std is ~23% narrow, because the true coarse reverse kernel
    q(x_{tsᵢ₋₁}|x_tsᵢ) has variance β̃_new + c₀²·Var[x₀|x_t] — β̃ plus
    the data-uncertainty term. For the analytic Gaussian model that
    optimum is computable in closed form; feeding it through the
    learned-range head (as the trained v* per timestep) makes the SAME
    coarse chain exact, recovering the TRUE data spread — better even
    than the 10×-longer fixed-β̃ chain."""
    T, S = 400, 40
    gamma2 = _AnalyticDDPM.DATA_VAR
    cfg = dict(TINY, num_timesteps=T)
    fixed = _AnalyticDDPM(cfg)

    from diffusion_model_universal_tpu.models.schedules import (
        respace_timesteps, respaced_schedule)
    sched = fixed.schedule
    ts = np.asarray(respace_timesteps(T, S))
    sub = respaced_schedule(sched, jnp.asarray(ts))
    abar = np.asarray(sched.alphas_cumprod)[ts]
    abar_prev = np.concatenate([[1.0], abar[:-1]])
    beta_new = np.asarray(sub.betas)
    pv = np.asarray(sub.posterior_variance)
    pv_clip = np.concatenate([pv[1:2], pv[1:]])
    c0 = np.sqrt(abar_prev) * beta_new / (1.0 - abar)
    var_x0 = gamma2 * (1.0 - abar) / (abar * gamma2 + (1.0 - abar))
    sigma_star = pv_clip + c0 ** 2 * var_x0     # exact reverse variance
    v_star = (2.0 * (np.log(sigma_star) - np.log(pv_clip))
              / (np.log(beta_new) - np.log(pv_clip)) - 1.0)
    # j=0 is the t=0 step — its noise is gated off, so its v is inert;
    # every noise-injecting step's optimum sits inside the learnable range
    assert v_star[1:].max() <= 1.0 + 1e-6
    v_table = np.zeros(T, np.float32)
    v_table[ts] = np.clip(v_star, -1.0, 1.0)
    v_jnp = jnp.asarray(v_table)

    class _OptimalVar(DDPM):
        DATA_VAR = gamma2

        def apply(self, params, x, t, train=False, rng=None, y=None):
            ab = jnp.take(self.schedule.alphas_cumprod,
                          t)[:, None, None, None]
            eps = jnp.sqrt(1 - ab) * x / ((1 - ab) + self.DATA_VAR * ab)
            v = jnp.broadcast_to(jnp.take(v_jnp, t)[:, None, None, None],
                                 x.shape)
            return jnp.concatenate([eps, v], axis=-1)

    opt = _OptimalVar(dict(cfg, learn_sigma=True))
    key = jax.random.PRNGKey(2)
    true_std = np.sqrt(gamma2)  # terminal marginal of the EXACT chain
    full = np.asarray(fixed.generate_samples({}, key, 8))
    narrow = np.asarray(fixed.generate_samples_strided({}, key, 8,
                                                       num_steps=S))
    exact = np.asarray(opt.generate_samples_strided({}, key, 8,
                                                    num_steps=S))
    narrow_err = abs(narrow.std() / true_std - 1.0)
    full_err = abs(full.std() / true_std - 1.0)
    exact_err = abs(exact.std() / true_std - 1.0)
    assert narrow_err > 0.15                    # the problem is real
    assert exact_err < 0.03, (narrow_err, exact_err)  # ...and solved
    # the 40-step learned-variance chain even beats the 400-step
    # fixed-β̃ chain (which is itself slightly narrow)
    assert exact_err < full_err, (exact_err, full_err)


def test_strided_learned_sigma_matches_fixed_at_v_min():
    """learn_sigma + strided: with the head pinned at v=−1 the learned
    log-variance equals the COARSE schedule's clipped log β̃, so the
    chain must match the fixed-variance strided chain."""
    cfg = dict(TINY, num_timesteps=64)
    fixed = _AnalyticDDPM(cfg)
    learned = _LearnSigmaAnalytic(dict(cfg, learn_sigma=True))
    key = jax.random.PRNGKey(4)
    a = np.asarray(fixed.generate_samples_strided({}, key, 4, num_steps=8))
    b = np.asarray(learned.generate_samples_strided({"v": -1.0}, key, 4,
                                                    num_steps=8))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    c = np.asarray(learned.generate_samples_strided({"v": 1.0}, key, 4,
                                                    num_steps=8))
    assert np.abs(c - b).max() > 1e-3


# -- NLL / VLB evaluation (iDDPM's headline metric) -------------------------

def test_nll_vlb_tight_for_exact_reverse_model():
    """nll_bits_per_dim must be a TIGHT bound when the reverse model is
    exact: on quantized Gaussian data (true entropy
    0.5·log2(2πeγ²)+log2(127.5) ≈ 5.72 bits/dim at γ=0.1) the analytic
    ε + closed-form optimal learned variance scores within 0.1 bits/dim
    of the truth (measured 5.74), while the same ε with fixed β̃ scores
    ~0.9 bits/dim worse (measured 6.62) — the iDDPM Table-2 effect."""
    T = 400
    gamma2 = 0.01
    cfg = dict(TINY, num_timesteps=T)
    fixed = _AnalyticDDPM(cfg)
    sched = fixed.schedule

    abar = np.asarray(sched.alphas_cumprod)
    abar_prev = np.concatenate([[1.0], abar[:-1]])
    beta = np.asarray(sched.betas)
    pv = np.asarray(sched.posterior_variance)
    pv_clip = np.concatenate([pv[1:2], pv[1:]])
    c0 = np.sqrt(abar_prev) * beta / (1.0 - abar)
    var_x0 = gamma2 * (1.0 - abar) / (abar * gamma2 + (1.0 - abar))
    sigma_star = pv_clip + c0 ** 2 * var_x0
    v_star = (2.0 * (np.log(sigma_star) - np.log(pv_clip))
              / (np.log(beta) - np.log(pv_clip)) - 1.0)
    v_table = jnp.asarray(np.clip(v_star, -1.0, 1.0).astype(np.float32))

    class _OptimalVar(DDPM):
        def apply(self, params, x, t, train=False, rng=None, y=None):
            ab = jnp.take(self.schedule.alphas_cumprod,
                          t)[:, None, None, None]
            eps = jnp.sqrt(1 - ab) * x / ((1 - ab) + gamma2 * ab)
            v = jnp.broadcast_to(jnp.take(v_table, t)[:, None, None, None],
                                 x.shape)
            return jnp.concatenate([eps, v], axis=-1)

    opt = _OptimalVar(dict(cfg, learn_sigma=True))
    kx, kn = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (8, 16, 16, 3)) * np.sqrt(gamma2)
    x = jnp.clip(jnp.round((x + 1) * 127.5) / 127.5 - 1, -1.0, 1.0)

    true_h = 0.5 * np.log2(2 * np.pi * np.e * gamma2) + np.log2(127.5)
    nll_opt = float(np.mean(np.asarray(opt.nll_bits_per_dim({}, x, kn))))
    nll_fixed = float(np.mean(np.asarray(
        fixed.nll_bits_per_dim({}, x, kn))))
    assert abs(nll_opt - true_h) < 0.1, (nll_opt, true_h)
    assert nll_fixed > nll_opt + 0.5, (nll_fixed, nll_opt)


def test_nll_runs_on_real_unet(ddpm_and_params):
    model, params = ddpm_and_params
    x = jnp.clip(jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
                 * 0.3, -1.0, 1.0)
    nll = np.asarray(model.nll_bits_per_dim(params, x,
                                            jax.random.PRNGKey(2)))
    assert nll.shape == (2,)
    assert np.isfinite(nll).all()
    assert (nll > 0).all()
