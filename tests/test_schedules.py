"""Unit tests for noise-schedule math (SURVEY.md §4 'Unit' bullet)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_universal_tpu.models import schedules as S


def test_linear_schedule_endpoints():
    betas = S.linear_beta_schedule(1e-4, 2e-2, 1000)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 1e-4, rtol=1e-6)
    np.testing.assert_allclose(betas[-1], 2e-2, rtol=1e-6)


def test_alphas_cumprod_monotone_decreasing():
    sched = S.make_noise_schedule(1e-4, 2e-2, 1000)
    ac = np.asarray(sched.alphas_cumprod)
    assert np.all(np.diff(ac) < 0)
    assert ac[0] == pytest.approx(1 - 1e-4)
    assert 0 < ac[-1] < 1e-2  # nearly fully noised at t=T-1


def test_cosine_schedule_valid():
    betas = np.asarray(S.cosine_beta_schedule(1000))
    assert betas.shape == (1000,)
    assert np.all(betas > 0) and np.all(betas <= 0.999)


def test_q_sample_statistics():
    """q(x_t|x_0) should have mean √ᾱ_t·x₀ and variance 1-ᾱ_t."""
    sched = S.make_noise_schedule(1e-4, 2e-2, 100)
    key = jax.random.PRNGKey(0)
    x0 = jnp.ones((2048, 4, 4, 1))
    t = jnp.full((2048,), 50, dtype=jnp.int32)
    noise = jax.random.normal(key, x0.shape)
    xt = S.q_sample(sched, x0, t, noise)
    ac = float(sched.alphas_cumprod[50])
    np.testing.assert_allclose(float(jnp.mean(xt)), np.sqrt(ac), atol=0.01)
    np.testing.assert_allclose(float(jnp.var(xt)), 1 - ac, atol=0.01)


def test_posterior_step_t0_is_deterministic():
    """At t=0 no noise is added (reference `models/ddpm.py:323-327`)."""
    sched = S.make_noise_schedule(1e-4, 2e-2, 10)
    x = jnp.ones((2, 4, 4, 3))
    eps = jnp.zeros_like(x)
    big_noise = 100.0 * jnp.ones_like(x)
    t0 = jnp.zeros((2,), jnp.int32)
    out = S.ddpm_posterior_step(sched, x, t0, eps, big_noise)
    # mean only: α_0^{-1/2} · x
    expected = x / jnp.sqrt(sched.alphas[0])
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-5)


def test_posterior_step_matches_reference_formula():
    """Check against a hand-computed Ho et al. Algorithm-2 step."""
    sched = S.make_noise_schedule(1e-4, 2e-2, 10)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 2, 2, 1)), jnp.float32)
    eps = jnp.asarray(rng.normal(size=(1, 2, 2, 1)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(1, 2, 2, 1)), jnp.float32)
    t = jnp.array([5], jnp.int32)

    out = S.ddpm_posterior_step(sched, x, t, eps, z)

    beta = float(sched.betas[5])
    alpha = float(sched.alphas[5])
    ac = float(sched.alphas_cumprod[5])
    ac_prev = float(sched.alphas_cumprod[4])
    mean = alpha ** -0.5 * (np.asarray(x) - beta / np.sqrt(1 - ac) * np.asarray(eps))
    beta_tilde = (1 - ac_prev) / (1 - ac) * beta
    expected = mean + np.sqrt(beta_tilde) * np.asarray(z)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4)


def test_ddim_timesteps_uniform_and_quad():
    ts = S.ddim_timesteps(1000, 50, "uniform")
    assert ts.shape == (50,)
    assert int(ts[0]) == 0 and int(ts[1]) == 20
    tq = S.ddim_timesteps(1000, 50, "quad")
    assert tq.shape == (50,)
    assert int(tq[0]) == 0
    assert np.all(np.asarray(tq) < 1000)
    with pytest.raises(NotImplementedError):
        S.ddim_timesteps(1000, 50, "bogus")


def test_ddim_eta0_sigma_zero_and_x0_inversion():
    """At η=0, σ≡0, and a perfect ε̂ inverts q_sample to x₀ at the final step."""
    sched = S.make_noise_schedule(1e-4, 2e-2, 100)
    p = S.make_ddim_params(sched, num_sampling_steps=10, eta=0.0)
    assert np.allclose(np.asarray(p.sigmas), 0.0)

    # Take x_t at the first DDIM step (t=0, ᾱ_prev=ᾱ_0... use i=0 where
    # alphas_prev[0] = alphas_cumprod[0]); with the true ε the update gives
    # √ᾱ_prev·x₀ + √(1-ᾱ_prev)·ε — i.e. a re-noising of the clipped x₀.
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(np.clip(rng.normal(size=(1, 2, 2, 1)), -1, 1), jnp.float32)
    eps = jnp.asarray(rng.normal(size=(1, 2, 2, 1)), jnp.float32)
    i = jnp.array(3, jnp.int32)
    t = p.timesteps[3]
    xt = S.q_sample(sched, x0, t[None], eps)
    out = S.ddim_step(p, xt, i, eps, jnp.zeros_like(xt), eta=0.0)
    expected = (np.sqrt(float(p.alphas_prev[3])) * np.asarray(x0)
                + np.sqrt(1 - float(p.alphas_prev[3])) * np.asarray(eps))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_sigma_ladder_geometric():
    sig = np.asarray(S.sigma_ladder(0.01, 50.0, 10))
    assert sig[0] == pytest.approx(50.0, rel=1e-4)
    assert sig[-1] == pytest.approx(0.01, rel=1e-4)
    ratios = sig[1:] / sig[:-1]
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-4)


def test_continuous_sigma_endpoints():
    assert float(S.continuous_sigma(0.01, 50.0, jnp.array(0.0))) == pytest.approx(0.01)
    assert float(S.continuous_sigma(0.01, 50.0, jnp.array(1.0))) == pytest.approx(50.0, rel=1e-5)


def test_schedule_is_pytree():
    """NoiseSchedule must be a pytree so it can cross jit boundaries."""
    sched = S.make_noise_schedule(1e-4, 2e-2, 10)
    leaves = jax.tree_util.tree_leaves(sched)
    assert len(leaves) == 7

    @jax.jit
    def f(s, x, t, n):
        return S.q_sample(s, x, t, n)

    x = jnp.ones((1, 2, 2, 1))
    out = f(sched, x, jnp.array([3]), jnp.zeros_like(x))
    assert out.shape == x.shape


def test_prediction_target_roundtrips_to_eps():
    """prediction_to_eps(prediction_target(x0, ε, t), q_sample(x0, t, ε))
    must reconstruct ε exactly for every parameterization — the algebraic
    contract all samplers rely on (models/ddpm.py eps_fn)."""
    sched = S.make_noise_schedule(1e-4, 2e-2, 100)
    key = jax.random.PRNGKey(0)
    kx, kn = jax.random.split(key)
    x0 = jax.random.normal(kx, (4, 8, 8, 3))
    noise = jax.random.normal(kn, x0.shape)
    t = jnp.array([0, 3, 50, 99])
    xt = S.q_sample(sched, x0, t, noise)
    for ptype in S._PREDICTION_TYPES:
        target = S.prediction_target(sched, x0, noise, t, ptype)
        eps = S.prediction_to_eps(sched, target, xt, t, ptype)
        # x0's back-conversion divides by √(1−ᾱ_t) ≈ 0.01 at t=0, which
        # amplifies f32 rounding ~100×; 1e-4 absolute covers that.
        np.testing.assert_allclose(np.asarray(eps), np.asarray(noise),
                                   atol=1e-4, err_msg=ptype)


def test_prediction_type_unknown_raises():
    sched = S.make_noise_schedule(1e-4, 2e-2, 10)
    x = jnp.zeros((1, 2, 2, 1))
    t = jnp.array([0])
    with pytest.raises(ValueError, match="prediction_type"):
        S.prediction_to_eps(sched, x, x, t, "velocity")
    with pytest.raises(ValueError, match="prediction_type"):
        S.prediction_target(sched, x, x, t, "eps")
