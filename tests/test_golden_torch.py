"""Golden parity vs an independent PyTorch re-execution (SURVEY §4).

The reference's layer math (GN→SiLU→conv → +time-bias → GN→SiLU→conv
→ +shortcut, `models/layers/residual.py:11-68`) is re-implemented here in
torch FROM THE DOCUMENTED FORMULAS (not copied), loaded with the flax
module's own weights, and compared elementwise. This pins our NHWC/fused
implementation to the reference semantics on fixed weights/inputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from diffusion_model_universal_tpu.models.layers.embeddings import \
    sinusoidal_embedding  # noqa: E402
from diffusion_model_universal_tpu.models.layers.resnet import \
    ResidualBlock  # noqa: E402


def _t(x):  # NHWC jax → NCHW torch
    return torch.from_numpy(
        np.asarray(x, np.float32).transpose(0, 3, 1, 2).copy())


def _w(k):  # HWIO → OIHW
    return torch.from_numpy(
        np.asarray(k, np.float32).transpose(3, 2, 0, 1).copy())


def test_residual_block_matches_torch_reference_math():
    B, H, W, CIN, COUT, G = 2, 8, 8, 16, 32, 8
    block = ResidualBlock(out_channels=COUT, num_groups=G,
                          dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, CIN))
    t_emb = jax.random.normal(jax.random.fold_in(key, 1), (B, 64))
    params = block.init(jax.random.fold_in(key, 2), x, t_emb)["params"]
    # Zero-init conv2/time_proj make the block an identity at init; for a
    # meaningful comparison, randomize them.
    params = jax.tree_util.tree_map(
        lambda p: jax.random.normal(jax.random.fold_in(key, p.size % 97),
                                    p.shape) * 0.3, params)
    out_jax = block.apply({"params": params}, x, t_emb)

    # --- torch re-execution of the reference formulas (NCHW) -----------
    def gn_silu(z, scale, bias):
        z = torch.nn.functional.group_norm(
            z, G, torch.from_numpy(np.asarray(scale, np.float32)),
            torch.from_numpy(np.asarray(bias, np.float32)), eps=1e-5)
        return torch.nn.functional.silu(z)

    xt = _t(x)
    h = gn_silu(xt, params["norm1"]["scale"], params["norm1"]["bias"])
    h = torch.nn.functional.conv2d(h, _w(params["conv1"]["kernel"]),
                                   padding=1)
    tb = (torch.from_numpy(np.asarray(t_emb, np.float32))
          @ torch.from_numpy(np.asarray(params["time_proj"]["kernel"],
                                        np.float32))
          + torch.from_numpy(np.asarray(params["time_proj"]["bias"],
                                        np.float32)))
    h = h + tb[:, :, None, None]
    h = gn_silu(h, params["norm2"]["scale"], params["norm2"]["bias"])
    h = torch.nn.functional.conv2d(h, _w(params["conv2"]["kernel"]),
                                   padding=1)
    short = torch.nn.functional.conv2d(
        xt, _w(params["shortcut"]["kernel"]))
    out_torch = (h + short).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(out_jax), out_torch,
                               atol=2e-4, rtol=2e-4)


def _load_reference_unet():
    """Import the reference's OWN UNet from /root/reference for direct
    execution (no re-implementation, no copying). The reference module
    chain imports torchvision (for its PerceptualLoss) which this image
    lacks — stub just enough of it to resolve the import."""
    import sys
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvt = types.ModuleType("torchvision.transforms")
        tvm.vgg16 = lambda *a, **k: None
        tvt.Normalize = object
        tv.models, tv.transforms = tvm, tvt
        sys.modules.update({"torchvision": tv, "torchvision.models": tvm,
                            "torchvision.transforms": tvt})
    sys.path.insert(0, "/root/reference")
    try:
        from models.ddpm import UNet as RefUNet
    finally:
        sys.path.remove("/root/reference")
    return RefUNet


def test_full_unet_golden_parity_and_import():
    """VERDICT r1 #3: execute the reference's ASSEMBLED UNet
    (`/root/reference/models/ddpm.py:93-135` + `models/layers/*`) and pin
    our `models/unet.py` against it on SHARED weights via the
    reference-checkpoint importer (`models/convert.py`). Covers
    skip-concat ordering, attention placement (down3/mid/up1), down/up
    conv geometry (incl. the ConvTranspose kernel-flip mapping), time-MLP
    wiring, and the output head."""
    import torch as _torch

    from diffusion_model_universal_tpu.models.convert import (
        convert_ddpm_checkpoint, convert_ddpm_unet_state_dict)
    from diffusion_model_universal_tpu.models.unet import UNet

    C, B = 32, 2
    RefUNet = _load_reference_unet()
    _torch.manual_seed(0)
    ref = RefUNet(in_channels=3, model_channels=C, out_channels=3)
    ref.eval()
    with _torch.no_grad():
        # Zero-init layers (conv2/time_mlp) would hide mis-mappings;
        # perturb everything so every weight contributes.
        for p in ref.parameters():
            p.add_(_torch.randn_like(p) * 0.05)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_ddpm_unet_state_dict(sd)

    ours = UNet(in_channels=3, model_channels=C, out_channels=3,
                dtype=jnp.float32, remat=False, conv_bias=True)
    # Structure check: the converted tree must match an init tree leaf
    # for leaf (same paths, same shapes) — a missing/renamed parameter
    # would otherwise silently fall back to flax defaults.
    init_params = ours.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 3)),
                            jnp.zeros((1,), jnp.int32))["params"]
    conv_paths = jax.tree_util.tree_structure(params)
    init_paths = jax.tree_util.tree_structure(init_params)
    assert conv_paths == init_paths, (conv_paths, init_paths)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(init_params)):
        assert a.shape == b.shape

    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, 32, 32, 3)).astype(np.float32)
    ts = [0, 57]
    out_ours = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(ts, jnp.int32)))
    with _torch.no_grad():
        out_ref = ref(_t(x), _torch.tensor(ts, dtype=_torch.float32))
    out_ref = out_ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out_ours, out_ref, atol=1e-3, rtol=1e-3)

    # Checkpoint-level import: both reference schemas resolve to the same
    # tree, and the emitted config carries conv_bias for reconstruction.
    ckpt = {"model_state_dict": {f"model.{k}": v for k, v in sd.items()},
            "config": {"model_config": {"in_channels": 3,
                                        "model_channels": C}}}
    payload = convert_ddpm_checkpoint(ckpt)
    assert payload["config"]["conv_bias"] is True
    for a, b in zip(jax.tree_util.tree_leaves(payload["model_state_dict"]),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(a, b)


def test_export_ddpm_roundtrip_and_strict_torch_load():
    """Inverse converter (`models/convert.py::export_ddpm_unet_params`):
    (a) export∘import is the identity on a real reference state_dict,
    (b) a model trained HERE (default conv_bias=False) exports to a
    state_dict the reference UNet strict-loads, with zero conv biases,
    and the torch forward matches our forward on shared weights."""
    import torch as _torch

    from diffusion_model_universal_tpu.models.convert import (
        convert_ddpm_unet_state_dict, export_ddpm_checkpoint,
        export_ddpm_unet_params)
    from diffusion_model_universal_tpu.models.unet import UNet

    C, B = 32, 2
    RefUNet = _load_reference_unet()
    _torch.manual_seed(0)
    ref = RefUNet(in_channels=3, model_channels=C, out_channels=3)
    ref.eval()
    with _torch.no_grad():
        for p in ref.parameters():
            p.add_(_torch.randn_like(p) * 0.05)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    # (a) export(import(sd)) == sd, key for key, bit for bit
    sd2 = export_ddpm_unet_params(convert_ddpm_unet_state_dict(sd))
    assert set(sd2) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(sd2[k], sd[k], err_msg=k)

    # (b) bias-free flax model → strict torch load + forward parity
    ours = UNet(in_channels=3, model_channels=C, out_channels=3,
                dtype=jnp.float32, remat=False, conv_bias=False)
    params = ours.init(jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)),
                       jnp.zeros((1,), jnp.int32))["params"]
    params = jax.tree_util.tree_map(
        lambda p: np.asarray(p) + 0.05 * np.random.default_rng(0).normal(
            size=p.shape).astype(np.float32), params)
    exported = export_ddpm_unet_params(params)
    missing, unexpected = ref.load_state_dict(
        {k: _torch.from_numpy(np.ascontiguousarray(v))
         for k, v in exported.items()}, strict=True)
    assert not missing and not unexpected

    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, 32, 32, 3)).astype(np.float32)
    ts = [3, 57]
    out_ours = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(ts, jnp.int32)))
    with _torch.no_grad():
        out_ref = ref(_t(x), _torch.tensor(ts, dtype=_torch.float32))
    np.testing.assert_allclose(
        out_ours, out_ref.numpy().transpose(0, 2, 3, 1),
        atol=1e-3, rtol=1e-3)

    # Checkpoint-level export: reference schema + schedule buffers
    payload = {"model_state_dict": params,
               "config": {"num_timesteps": 16, "beta_start": 1e-4,
                          "beta_end": 2e-2, "in_channels": 3,
                          "model_channels": C, "image_size": 32}}
    out = export_ddpm_checkpoint(payload)
    esd = out["model_state_dict"]
    np.testing.assert_allclose(
        esd["betas"], np.linspace(1e-4, 2e-2, 16, dtype=np.float32),
        rtol=1e-6)
    np.testing.assert_allclose(
        esd["alphas_cumprod"], np.cumprod(1.0 - esd["betas"]), rtol=1e-5)
    assert all(k.startswith("model.") for k in esd
               if k not in ("betas", "alphas", "alphas_cumprod"))
    assert out["config"]["num_timesteps"] == 16
    assert out["config"]["model_channels"] == C


def test_sinusoidal_embedding_matches_torch_reference_math():
    """Reference formula (`models/layers/embeddings.py:24-39`):
    emb = [sin(t·ω), cos(t·ω)], ω = exp(−ln(10000)·i/(d/2 − 1))."""
    d = 64
    ts = [0, 1, 7, 99]  # moderate t: f32 sin arg-reduction differs across
    t = jnp.asarray(ts, jnp.int32)  # backends at ~1e-5 for huge phases
    ours = np.asarray(sinusoidal_embedding(t, d))
    tt = torch.tensor(ts, dtype=torch.float32)
    half = d // 2
    freqs = torch.exp(torch.arange(half, dtype=torch.float32)
                      * (-float(np.log(10000.0)) / (half - 1)))
    args = tt[:, None] * freqs[None]
    ref = torch.cat([torch.sin(args), torch.cos(args)], dim=1).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_group_norm_matches_torch_group_norm():
    """Our layout-preserving GN formulation == torch.nn.functional.group_norm."""
    from diffusion_model_universal_tpu.ops.group_norm import \
        group_norm_silu_xla
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (4, 8, 8, 32)) * 2 + 1
    scale = jax.random.uniform(jax.random.fold_in(key, 1), (32,),
                               minval=0.5, maxval=1.5)
    bias = jax.random.normal(jax.random.fold_in(key, 2), (32,)) * 0.2
    ours = np.asarray(group_norm_silu_xla(x, scale, bias, 8,
                                          apply_silu=False))
    ref = torch.nn.functional.group_norm(
        _t(x), 8, torch.from_numpy(np.asarray(scale, np.float32)),
        torch.from_numpy(np.asarray(bias, np.float32)),
        eps=1e-5).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=3e-5)


def test_ddpm_q_sample_matches_torch_reference_math():
    """q(x_t|x_0) = √ᾱ_t x₀ + √(1−ᾱ_t) ε (reference `models/ddpm.py:286-296`)."""
    from diffusion_model_universal_tpu.models.schedules import (
        make_noise_schedule, q_sample)
    sched = make_noise_schedule(1e-4, 2e-2, 100, "linear")
    key = jax.random.PRNGKey(5)
    x0 = jax.random.normal(key, (3, 4, 4, 3))
    noise = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    t = jnp.asarray([0, 50, 99], jnp.int32)
    ours = np.asarray(q_sample(sched, x0, t, noise))

    betas = torch.linspace(1e-4, 2e-2, 100, dtype=torch.float64)
    ac = torch.cumprod(1.0 - betas, dim=0)
    tt = torch.tensor([0, 50, 99])
    s1 = torch.sqrt(ac[tt]).float()[:, None, None, None]
    s2 = torch.sqrt(1 - ac[tt]).float()[:, None, None, None]
    ref = (s1 * torch.from_numpy(np.asarray(x0, np.float32))
           + s2 * torch.from_numpy(np.asarray(noise, np.float32))).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)
