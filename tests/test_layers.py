"""Layer-level tests: shapes, init semantics, numerics (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_universal_tpu.models.layers import (
    AttentionDownBlock, AttentionUpBlock, ConvDownBlock, ConvUpBlock,
    GroupNormSiLU, ResidualBlock, SelfAttentionBlock, SigmaEmbedding,
    TimeEmbedding, sinusoidal_embedding)
from diffusion_model_universal_tpu.ops import attention as attn_ops
from diffusion_model_universal_tpu.ops import group_norm as gn_ops


def test_sinusoidal_embedding_matches_formula():
    """exp(arange(half)·(−ln 10000/(half−1))), concat(sin, cos)
    (reference `embeddings.py:24-39`)."""
    t = jnp.array([0.0, 1.0, 10.0])
    dim = 8
    emb = sinusoidal_embedding(t, dim)
    assert emb.shape == (3, 8)
    half = dim // 2
    freqs = np.exp(np.arange(half) * (-np.log(10000.0) / (half - 1)))
    args = np.asarray(t)[:, None] * freqs[None, :]
    expected = np.concatenate([np.sin(args), np.cos(args)], axis=-1)
    np.testing.assert_allclose(np.asarray(emb), expected, rtol=1e-5, atol=1e-6)


def test_time_embedding_shape_and_zero_bias():
    m = TimeEmbedding(base_dim=32, output_dim=128)
    params = m.init(jax.random.PRNGKey(0), jnp.array([1, 2]))
    out = m.apply(params, jnp.array([1, 2]))
    assert out.shape == (2, 128)
    # Biases zero-init (reference `embeddings.py:63-67`).
    assert np.allclose(params["params"]["dense1"]["bias"], 0)


def test_sigma_embedding_shape():
    m = SigmaEmbedding(base_dim=32, output_dim=128)
    params = m.init(jax.random.PRNGKey(0), jnp.array([0.5, 2.0]))
    out = m.apply(params, jnp.array([0.5, 2.0]))
    assert out.shape == (2, 128)
    assert np.all(np.isfinite(np.asarray(out)))


def test_resolve_num_groups_matches_reference_shrink():
    """Auto-shrink loop parity (reference `residual.py:22-29`)."""
    assert gn_ops.resolve_num_groups(64, 32) == 32
    assert gn_ops.resolve_num_groups(48, 32) == 24
    assert gn_ops.resolve_num_groups(3, 32) == 3
    assert gn_ops.resolve_num_groups(7, 32) == 7
    assert gn_ops.resolve_num_groups(1, 32) == 1


def test_group_norm_silu_matches_manual():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    out = gn_ops.group_norm_silu_xla(x, scale, bias, num_groups=2)

    xn = np.asarray(x).reshape(2, 16, 2, 4)
    mean = xn.mean(axis=(1, 3), keepdims=True)
    var = xn.var(axis=(1, 3), keepdims=True)
    normed = ((xn - mean) / np.sqrt(var + 1e-5)).reshape(2, 4, 4, 8)
    expect = normed * np.asarray(scale) + np.asarray(bias)
    expect = expect / (1 + np.exp(-expect)) * 1.0  # silu = x*sigmoid(x)
    expect = normed * np.asarray(scale) + np.asarray(bias)
    expect = expect * (1.0 / (1.0 + np.exp(-expect)))
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5)


def test_mha_xla_matches_manual_softmax():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 2, 5, 4)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 5, 4)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 5, 4)), jnp.float32)
    out = attn_ops.mha_xla(q, k, v)
    qn, kn, vn = map(np.asarray, (q, k, v))
    logits = np.einsum("bnsd,bntd->bnst", qn, kn) * (4 ** -0.5)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    expected = np.einsum("bnst,bntd->bnsd", probs, vn)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_residual_block_identity_at_init():
    """Zero-init conv2 + matching channels ⇒ block(x) == x at init
    (reference zero-inits `residual.py:49-53`)."""
    m = ResidualBlock(out_channels=16)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 16)),
                    jnp.float32)
    t_emb = jnp.ones((2, 64))
    params = m.init(jax.random.PRNGKey(0), x, t_emb)
    out = m.apply(params, x, t_emb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_residual_block_channel_change_uses_shortcut():
    m = ResidualBlock(out_channels=32)
    x = jnp.ones((2, 8, 8, 16))
    t_emb = jnp.ones((2, 64))
    params = m.init(jax.random.PRNGKey(0), x, t_emb)
    out = m.apply(params, x, t_emb)
    assert out.shape == (2, 8, 8, 32)
    assert "shortcut" in params["params"]


def test_down_and_up_block_shapes():
    x = jnp.ones((2, 16, 16, 8))
    t_emb = jnp.ones((2, 32))
    down = ConvDownBlock(out_channels=16)
    p = down.init(jax.random.PRNGKey(0), x, t_emb)
    y = down.apply(p, x, t_emb)
    assert y.shape == (2, 8, 8, 16)

    up = ConvUpBlock(out_channels=8)
    p = up.init(jax.random.PRNGKey(0), y, t_emb)
    z = up.apply(p, y, t_emb)
    assert z.shape == (2, 16, 16, 8)


def test_attention_block_shapes_and_heads():
    x = jnp.ones((2, 4, 4, 16))
    m = SelfAttentionBlock(embedding_dim=16, num_heads=4)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == x.shape


def test_attention_updown_block_shapes():
    x = jnp.ones((2, 8, 8, 8))
    t_emb = jnp.ones((2, 32))
    m = AttentionDownBlock(out_channels=16, num_att_heads=4)
    p = m.init(jax.random.PRNGKey(0), x, t_emb)
    y = m.apply(p, x, t_emb)
    assert y.shape == (2, 4, 4, 16)

    mu = AttentionUpBlock(out_channels=8, num_att_heads=4)
    pu = mu.init(jax.random.PRNGKey(0), y, t_emb)
    z = mu.apply(pu, y, t_emb)
    assert z.shape == (2, 8, 8, 8)


def test_dropout_active_in_training_mode():
    m = ResidualBlock(out_channels=8, dropout=0.5)
    x = jnp.ones((2, 4, 4, 8))
    t_emb = jnp.ones((2, 16))
    params = m.init(jax.random.PRNGKey(0), x, t_emb)
    out_det = m.apply(params, x, t_emb, True)
    out_trn = m.apply(params, x, t_emb, False,
                      rngs={"dropout": jax.random.PRNGKey(1)})
    # At init conv2 is zero so dropout on its input is invisible; instead
    # just check the call path works and deterministic output is stable.
    out_det2 = m.apply(params, x, t_emb, True)
    np.testing.assert_allclose(np.asarray(out_det), np.asarray(out_det2))
    assert out_trn.shape == out_det.shape


def test_bf16_compute_path():
    m = ResidualBlock(out_channels=8, dtype=jnp.bfloat16)
    x = jnp.ones((1, 4, 4, 8), jnp.float32)
    t_emb = jnp.ones((1, 16), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, t_emb)
    # Params stay fp32.
    k = params["params"]["conv1"]["kernel"]
    assert k.dtype == jnp.float32
    out = m.apply(params, x, t_emb)
    assert np.all(np.isfinite(np.asarray(out, dtype=np.float32)))


# ---------------------------------------------------------------------------
# Split-skip (virtual concat) path: ResidualBlock(x, ..., skip=s) must match
# ResidualBlock(concat([x, s])) on the SAME params — the UNet's
# split_skip_convs optimization reassociates the contraction, it must not
# change math or checkpoint schema.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ch,cs,groups,exact", [
    (16, 16, 32, False),   # aligned halves → split GN/conv path
    (96, 32, 32, False),   # unequal aligned halves (gs=4)
    (6, 10, 4, True),      # 6 % gs(=4) != 0 → straddle fallback (real concat)
])
def test_residual_block_skip_matches_concat(ch, cs, groups, exact):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, ch)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(2, 8, 8, cs)), jnp.float32)
    t_emb = jnp.asarray(rng.normal(size=(2, 64)), jnp.float32)
    m = ResidualBlock(out_channels=24, num_groups=groups)
    params = m.init(jax.random.PRNGKey(0), x, t_emb, True, s)
    cat = jnp.concatenate([x, s], axis=-1)
    # Identical param tree: init via the skip path serves the concat path.
    out_skip = m.apply(params, x, t_emb, True, s)
    out_cat = m.apply(params, cat, t_emb)
    tol = 0 if exact else 1e-5
    np.testing.assert_allclose(np.asarray(out_skip), np.asarray(out_cat),
                               atol=tol, rtol=tol)


def test_unet_split_skip_convs_matches_concat():
    """Whole-UNet equivalence: split_skip_convs=True/False share one param
    tree (same init) and agree to f32 reassociation tolerance."""
    from diffusion_model_universal_tpu.models.unet import UNet

    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 32, 32, 3)),
                    jnp.float32)
    t = jnp.asarray([7], jnp.int32)
    on = UNet(model_channels=32, split_skip_convs=True)
    off = UNet(model_channels=32, split_skip_convs=False)
    p_on = on.init(jax.random.PRNGKey(0), x, t)
    p_off = off.init(jax.random.PRNGKey(0), x, t)
    flat_on = jax.tree_util.tree_leaves_with_path(p_on)
    flat_off = jax.tree_util.tree_leaves_with_path(p_off)
    assert [k for k, _ in flat_on] == [k for k, _ in flat_off]
    for (k, a), (_, b) in zip(flat_on, flat_off):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(k))
    y_on = on.apply(p_on, x, t)
    y_off = off.apply(p_on, x, t)
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                               atol=2e-5, rtol=2e-5)


# ---------------------------------------------------------------------------
# remat_policy knob (round-4): the byte-targeted checkpoint policy must be a
# pure scheduling knob — identical params, outputs, and gradients vs no remat.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("remat,policy", [
    (True, None),              # pre-round-4 full stage recompute
    (False, "save_convout"),   # policy implies remat
    (False, "full"),
])
def test_unet_remat_policy_is_numerically_transparent(remat, policy):
    from diffusion_model_universal_tpu.models.unet import UNet

    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    t = jnp.asarray([3, 9], jnp.int32)
    base = UNet(model_channels=32, remat=False)
    rem = UNet(model_channels=32, remat=remat, remat_policy=policy)
    params = base.init(jax.random.PRNGKey(0), x, t)
    p_rem = rem.init(jax.random.PRNGKey(0), x, t)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(p_rem)
    assert [k for k, _ in flat_a] == [k for k, _ in flat_b]

    def loss(m):
        def f(p):
            return jnp.sum(m.apply(p, x, t) ** 2)
        return f

    la, ga = jax.value_and_grad(loss(base))(params)
    lb, gb = jax.value_and_grad(loss(rem))(params)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    for (k, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(ga),
                              jax.tree_util.tree_leaves_with_path(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5, err_msg=str(k))


def test_unet_remat_policy_unknown_raises():
    from diffusion_model_universal_tpu.models.unet import UNet

    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    with pytest.raises(ValueError, match="remat_policy"):
        UNet(model_channels=32, remat_policy="bogus").init(
            jax.random.PRNGKey(0), x, t)
