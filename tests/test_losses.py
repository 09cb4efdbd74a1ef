"""Unit tests for the config-driven loss system (reference `utils/losses.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_universal_tpu.utils import losses as L


def _data(shape=(4, 8, 8, 3), seed=0):
    rng = np.random.default_rng(seed)
    pred = jnp.asarray(rng.normal(size=shape), jnp.float32)
    target = jnp.asarray(rng.normal(size=shape), jnp.float32)
    return pred, target


def test_mse_matches_numpy():
    pred, target = _data()
    loss = L.DiffusionLoss("mse", {"use_time_weighting": False})
    expected = np.mean((np.asarray(pred) - np.asarray(target)) ** 2)
    assert float(loss(pred, target)) == pytest.approx(float(expected), rel=1e-5)


def test_l1_nonzero_by_default():
    """Selected-type weight defaults to 1.0 (fixes D11's zero-loss trap)."""
    pred, target = _data()
    loss = L.DiffusionLoss("l1", {"use_time_weighting": False})
    assert float(loss(pred, target)) > 0


def test_huber_quadratic_and_linear_regions():
    loss = L.DiffusionLoss("huber", {"use_time_weighting": False,
                                     "huber_delta": 1.0})
    small = jnp.full((1, 1, 1, 1), 0.5)
    big = jnp.full((1, 1, 1, 1), 3.0)
    zero = jnp.zeros_like(small)
    assert float(loss(small, zero)) == pytest.approx(0.5 * 0.25, rel=1e-5)
    assert float(loss(big, zero)) == pytest.approx(3.0 - 0.5, rel=1e-5)


def test_hybrid_is_weighted_sum():
    pred, target = _data()
    cfg = {"use_hybrid": True, "use_time_weighting": False,
           "hybrid_weights": {"mse": 0.5, "l1": 0.25, "huber": 0.0}}
    loss = L.DiffusionLoss("hybrid", cfg)
    p, t = np.asarray(pred), np.asarray(target)
    expected = np.mean(0.5 * (p - t) ** 2 + 0.25 * np.abs(p - t))
    assert float(loss(pred, target)) == pytest.approx(float(expected), rel=1e-5)


def test_snr_time_weights_monotone_decreasing():
    """SNR weighting should downweight high-noise (late) timesteps."""
    loss = L.DiffusionLoss("mse", {"use_time_weighting": True,
                                   "time_weight_type": "snr"},
                           num_timesteps=1000)
    t = jnp.arange(0, 1000, 100, dtype=jnp.int32)
    w = np.asarray(loss.time_weights(t)).ravel()
    # SNR decays so fast that late-t weights saturate at min_weight: weights
    # must be monotone non-increasing, with a strict drop from t=0.
    assert np.all(np.diff(w) <= 1e-7)
    assert w[0] > w[1]
    assert w.max() == pytest.approx(1.0, abs=1e-4)
    assert w.min() == pytest.approx(0.1, abs=1e-4)


def test_linear_and_inverse_weights_rescaled_to_range():
    for wtype in ("linear", "inverse"):
        loss = L.DiffusionLoss(
            "mse", {"use_time_weighting": True, "time_weight_type": wtype,
                    "time_weight_params": {"min_weight": 0.2, "max_weight": 0.9}},
            num_timesteps=100)
        t = jnp.arange(0, 100, 10, dtype=jnp.int32)
        w = np.asarray(loss.time_weights(t)).ravel()
        assert w.min() == pytest.approx(0.2, abs=1e-3)
        assert w.max() == pytest.approx(0.9, abs=1e-3)
        assert np.all(np.diff(w) < 0)  # both downweight later timesteps


def test_time_weighting_changes_loss():
    pred, target = _data()
    t = jnp.array([0, 300, 600, 999], jnp.int32)
    weighted = L.DiffusionLoss("mse", {"use_time_weighting": True})
    unweighted = L.DiffusionLoss("mse", {"use_time_weighting": False})
    assert float(weighted(pred, target, t)) != pytest.approx(
        float(unweighted(pred, target, t)))


def test_invalid_loss_type_raises():
    with pytest.raises(ValueError):
        L.DiffusionLoss("nope")


def test_loss_is_jittable_and_differentiable():
    loss = L.DiffusionLoss("hybrid", {
        "use_hybrid": True, "hybrid_weights": {"mse": 1.0, "l1": 0.5},
        "use_time_weighting": True})
    pred, target = _data()
    t = jnp.array([1, 2, 3, 4], jnp.int32)

    val, grad = jax.jit(jax.value_and_grad(lambda p: loss(p, target, t)))(pred)
    assert jnp.isfinite(val)
    assert grad.shape == pred.shape
    assert jnp.all(jnp.isfinite(grad))


def test_score_matching_loss_uses_given_noise():
    """DSM target must be −ε/σ for the SAME ε (fix of defect D5)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 1)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=(2, 4, 4, 1)), jnp.float32)
    sigma = jnp.array([0.5, 2.0], jnp.float32)
    # A perfect score prediction gives exactly zero loss.
    perfect = -noise / sigma[:, None, None, None]
    assert float(L.score_matching_loss(perfect, noise, sigma)) == pytest.approx(0.0)
    assert float(L.score_matching_loss(jnp.zeros_like(x), noise, sigma)) > 0


def test_energy_loss_cd_and_gp():
    """CD term: quadratic energy E(x)=‖x‖² separates real (small) from fake
    (large); the GP term is minimized when ‖∇E‖=1."""
    key = jax.random.PRNGKey(0)

    def energy(x):
        return jnp.sum(x ** 2, axis=(1, 2, 3))

    x_real = jnp.zeros((4, 2, 2, 1))
    x_fake = jnp.ones((4, 2, 2, 1))
    val = L.energy_based_loss(energy, x_real, x_fake, key,
                              regularization_weight=0.0)
    # E[real]=0, E[fake]=4 → CD = -4.
    assert float(val) == pytest.approx(-4.0, rel=1e-5)

    val_gp = L.energy_based_loss(energy, x_real, x_fake, key,
                                 regularization_weight=1.0)
    assert float(val_gp) > float(val)  # GP adds a non-negative penalty


def test_energy_loss_second_order_differentiable():
    """Outer jax.grad must flow through the GP's inner jax.grad
    (the reference needed create_graph=True, `utils/losses.py:277-283`)."""
    key = jax.random.PRNGKey(1)

    def make_energy(w):
        def energy(x):
            return jnp.sum(w * x ** 2, axis=(1, 2, 3))
        return energy

    x_real = jnp.ones((2, 2, 2, 1)) * 0.1
    x_fake = jnp.ones((2, 2, 2, 1))

    def outer(w):
        return L.energy_based_loss(make_energy(w), x_real, x_fake, key, 0.5)

    g = jax.grad(outer)(jnp.array(1.0))
    assert jnp.isfinite(g)
    assert float(g) != 0.0


def test_perceptual_loss_zero_on_identical():
    pl = L.PerceptualLoss()
    x = jnp.ones((1, 16, 16, 3)) * 0.5
    assert float(pl(x, x)) == pytest.approx(0.0, abs=1e-6)
    y = jnp.zeros_like(x)
    assert float(pl(x, y)) > 0


def test_score_matching_sigma2_weighting():
    """λ(σ)=σ² DSM (NCSN objective): unit-scale targets at every level;
    equals σ²·(unweighted per-sample loss) for a single σ."""
    from diffusion_model_universal_tpu.utils.losses import \
        score_matching_loss
    key = jax.random.PRNGKey(0)
    score = jax.random.normal(key, (4, 8, 8, 3))
    noise = jax.random.normal(jax.random.fold_in(key, 1), (4, 8, 8, 3))
    sigma = jnp.full((4,), 2.0)
    unweighted = score_matching_loss(score, noise, sigma)
    weighted = score_matching_loss(score, noise, sigma, weighting="sigma2")
    np.testing.assert_allclose(float(weighted), 4.0 * float(unweighted),
                               rtol=1e-5)
    with pytest.raises(ValueError):
        score_matching_loss(score, noise, sigma, weighting="bogus")


def test_min_snr_weights_match_paper_formula():
    """Min-SNR-γ (arXiv:2303.09556): weight on the x₀-MSE is min(SNR, γ);
    the per-parameterization divisors make the EFFECTIVE x₀-space weight
    identical across ε / v / x₀ targets."""
    from diffusion_model_universal_tpu.models.schedules import \
        make_noise_schedule
    sched = make_noise_schedule(1e-4, 2e-2, 1000)
    ac = np.asarray(sched.alphas_cumprod)
    t = jnp.array([0, 100, 500, 999])
    snr_t = ac[np.asarray(t)] / (1.0 - ac[np.asarray(t)])
    gamma = 5.0
    want_x0 = np.minimum(snr_t, gamma)
    got = {
        p: np.asarray(L._min_snr_weights(t, 1000, sched.alphas_cumprod,
                                         gamma, p))
        for p in ("epsilon", "v", "x0")
    }
    np.testing.assert_allclose(got["x0"], want_x0, rtol=1e-5)
    np.testing.assert_allclose(got["epsilon"], want_x0 / snr_t, rtol=1e-5)
    np.testing.assert_allclose(got["v"], want_x0 / (snr_t + 1.0), rtol=1e-5)
    # ε-weight saturates at exactly 1 once SNR ≤ γ (high-noise steps).
    assert got["epsilon"][-1] == pytest.approx(1.0)
    assert got["epsilon"][0] < 1e-2  # t=0 has SNR ≈ 1e4 ≫ γ


def test_min_snr_loss_path_no_rescale():
    """time_weight_type=min_snr must use absolute weights (no affine
    [min_weight, max_weight] rescale) and produce a finite scalar."""
    from diffusion_model_universal_tpu.models.schedules import \
        make_noise_schedule
    sched = make_noise_schedule(1e-4, 2e-2, 100)
    loss = L.DiffusionLoss(
        "mse",
        {"time_weight_type": "min_snr",
         "time_weight_params": {"gamma": 5.0,
                                # would distort weights if (wrongly) applied
                                "min_weight": 0.0, "max_weight": 100.0}},
        num_timesteps=100, alphas_cumprod=sched.alphas_cumprod)
    t = jnp.array([0, 99])
    w = np.asarray(loss.time_weights(t)).ravel()
    snr = np.asarray(sched.alphas_cumprod) / (1 - np.asarray(sched.alphas_cumprod))
    np.testing.assert_allclose(w, np.minimum(snr[[0, 99]], 5.0) / snr[[0, 99]],
                               rtol=1e-5)
    pred = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
    val = loss(pred, jnp.zeros_like(pred), t)
    assert np.isfinite(float(val))
