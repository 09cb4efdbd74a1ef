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


# -- iDDPM learned-variance math (arXiv:2102.09672) -----------------------

def test_learned_range_log_variance_endpoints():
    """v=−1 must give the clipped posterior log-variance, v=+1 log β_t,
    and v=0 their midpoint (the paper's eq. 15 interpolation)."""
    sched = S.make_noise_schedule(num_timesteps=16)
    t = jnp.array([0, 1, 7, 15])
    shape = (4, 2, 2, 3)

    pv = np.asarray(sched.posterior_variance)
    min_log = np.log(np.concatenate([pv[1:2], pv[1:]]))[np.asarray(t)]
    max_log = np.log(np.asarray(sched.betas))[np.asarray(t)]

    for v_val, want in ((-1.0, min_log), (1.0, max_log),
                        (0.0, 0.5 * (min_log + max_log))):
        got = np.asarray(S.learned_range_log_variance(
            sched, jnp.full(shape, v_val), t))
        np.testing.assert_allclose(got, want[:, None, None, None]
                                   * np.ones(shape), rtol=1e-5)


def test_normal_kl_closed_form_and_zero_at_match():
    rng = np.random.RandomState(0)
    m1, lv1 = rng.randn(32), rng.randn(32)
    m2, lv2 = rng.randn(32), rng.randn(32)
    got = np.asarray(S.normal_kl(jnp.asarray(m1), jnp.asarray(lv1),
                                 jnp.asarray(m2), jnp.asarray(lv2)))
    want = 0.5 * (-1.0 + lv2 - lv1 + np.exp(lv1 - lv2)
                  + (m1 - m2) ** 2 * np.exp(-lv2))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    zero = np.asarray(S.normal_kl(jnp.asarray(m1), jnp.asarray(lv1),
                                  jnp.asarray(m1), jnp.asarray(lv1)))
    np.testing.assert_allclose(zero, 0.0, atol=1e-7)
    assert (got >= -1e-7).all()


def test_discretized_gaussian_bins_sum_to_one():
    """The 256 bin masses of the t=0 decoder must sum to ~1 for any
    (mean, scale): the open-ended edge bins absorb the tails."""
    centers = jnp.asarray(np.arange(256) / 127.5 - 1.0)
    for mean, log_scale in ((0.0, -2.0), (0.3, -1.0), (-0.9, -3.0)):
        ll = S.discretized_gaussian_log_likelihood(
            centers, jnp.full((256,), mean), jnp.full((256,), log_scale))
        total = float(jnp.sum(jnp.exp(ll)))
        assert abs(total - 1.0) < 2e-2, (mean, log_scale, total)


def test_vlb_term_zero_at_true_posterior_and_positive_otherwise():
    """With the exact ε and the true posterior log-variance the KL terms
    (t>0) are 0; any variance mismatch strictly increases them."""
    sched = S.make_noise_schedule(num_timesteps=32)
    rng = jax.random.PRNGKey(0)
    kx, kn = jax.random.split(rng)
    x0 = jax.random.uniform(kx, (4, 4, 4, 3), minval=-0.5, maxval=0.5)
    noise = jax.random.normal(kn, x0.shape)
    t = jnp.array([1, 5, 17, 31])
    x_t = S.q_sample(sched, x0, t, noise)
    true_logvar = S.learned_range_log_variance(
        sched, jnp.full_like(x0, -1.0), t)

    at_true = np.asarray(S.vlb_term_bits(sched, x0, x_t, t, noise,
                                         true_logvar))
    np.testing.assert_allclose(at_true, 0.0, atol=1e-5)
    off = np.asarray(S.vlb_term_bits(sched, x0, x_t, t, noise,
                                     true_logvar + 1.0))
    assert (off > 1e-3).all()


def test_posterior_step_learned_matches_fixed_at_min_variance():
    """At v=−1 (log-variance = clipped β̃) the learned step must equal
    the fixed-variance step for every t>0, and be deterministic at t=0."""
    sched = S.make_noise_schedule(num_timesteps=16)
    rng = jax.random.PRNGKey(1)
    kx, ke, kn = jax.random.split(rng, 3)
    x = jax.random.normal(kx, (3, 4, 4, 3))
    eps = jax.random.normal(ke, x.shape)
    noise = jax.random.normal(kn, x.shape)
    t = jnp.array([1, 7, 15])
    log_var = S.learned_range_log_variance(sched, jnp.full_like(x, -1.0), t)
    got = S.ddpm_posterior_step_learned(sched, x, t, eps, log_var, noise)
    want = S.ddpm_posterior_step(sched, x, t, eps, noise)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    t0 = jnp.array([0, 0, 0])
    lv0 = S.learned_range_log_variance(sched, jnp.full_like(x, 0.3), t0)
    a = S.ddpm_posterior_step_learned(sched, x, t0, eps, lv0, noise)
    b = S.ddpm_posterior_step_learned(sched, x, t0, eps, lv0, -noise)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
