"""Reference-checkpoint importer: torch NCHW state_dict → flax params.

Makes "drop-in" reach past the config/CLI surface: a user's TRAINED
reference model (`/root/reference/models/base_model.py:119-133` saves
``{model_state_dict, config}``; the trainer checkpoint additionally holds
``ema_model_state_dict``, `/root/reference/trainers/ddpm_trainer.py:869-877`)
converts losslessly into this framework's parameter tree and samples
through the TPU-native samplers.

Weight-layout contract (each pinned numerically in
`tests/test_golden_torch.py::test_full_unet_golden_parity_and_import`):

* Conv2d      ``[O, I, kh, kw]`` → flax ``[kh, kw, I, O]``
* ConvTranspose2d ``[I, O, kh, kw]`` → spatial FLIP then ``[kh, kw, I, O]``
  (torch's conv_transpose correlates with the flipped kernel relative to
  flax's ``transpose_kernel=False`` convolution form)
* Linear      ``[O, I]`` → ``[I, O]``
* GroupNorm   ``weight``/``bias`` → ``scale``/``bias``

The reference parameterization uses conv biases everywhere, so imported
models must be built with ``model_config.conv_bias: true`` (the converter
stamps it into the emitted config). Schedule buffers (betas/alphas/
alphas_cumprod, DDIM's ddim_* tables) are NOT imported — this framework
recomputes them from the config, which also repairs the reference's DDIM
buffer-misindexing defect (SURVEY.md D4) for imported models.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

Tree = Dict[str, Any]


def _conv(sd: Dict[str, np.ndarray], p: str) -> Tree:
    out = {"kernel": np.ascontiguousarray(
        sd[f"{p}.weight"].transpose(2, 3, 1, 0))}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def _conv_t(sd: Dict[str, np.ndarray], p: str) -> Tree:
    w = sd[f"{p}.weight"]  # [I, O, kh, kw]
    out = {"kernel": np.ascontiguousarray(
        w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def _linear(sd: Dict[str, np.ndarray], p: str) -> Tree:
    return {"kernel": np.ascontiguousarray(sd[f"{p}.weight"].T),
            "bias": sd[f"{p}.bias"]}


def _gn(sd: Dict[str, np.ndarray], p: str) -> Tree:
    return {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}


def _res_block(sd: Dict[str, np.ndarray], p: str) -> Tree:
    out = {
        "norm1": _gn(sd, f"{p}.norm1"),
        "conv1": _conv(sd, f"{p}.conv1"),
        "time_proj": _linear(sd, f"{p}.time_mlp"),
        "norm2": _gn(sd, f"{p}.norm2"),
        "conv2": _conv(sd, f"{p}.conv2"),
    }
    if f"{p}.shortcut.weight" in sd:  # Identity when channels match
        out["shortcut"] = _conv(sd, f"{p}.shortcut")
    return out


def _attention(sd: Dict[str, np.ndarray], p: str) -> Tree:
    return {
        "query": _linear(sd, f"{p}.query_projection"),
        "key": _linear(sd, f"{p}.key_projection"),
        "value": _linear(sd, f"{p}.value_projection"),
        "proj": _linear(sd, f"{p}.final_projection"),
        "norm_scale": sd[f"{p}.norm.weight"],
        "norm_bias": sd[f"{p}.norm.bias"],
    }


def _stage(sd: Dict[str, np.ndarray], p: str, attn: bool,
           resample_key: str, num_layers: int = 2) -> Tree:
    out: Tree = {}
    for i in range(num_layers):
        out[f"res{i}"] = _res_block(sd, f"{p}.res_blocks.{i}")
        if attn:
            out[f"attn{i}"] = _attention(sd, f"{p}.attention_blocks.{i}")
    src = "downsample" if resample_key == "down" else "upsample"
    conv = _conv if resample_key == "down" else _conv_t
    out[resample_key] = {"conv": conv(sd, f"{p}.{src}")}
    return out


def convert_ddpm_unet_state_dict(sd: Dict[str, Any]) -> Tree:
    """Reference UNet state_dict → flax params for
    ``models.unet.UNet(conv_bias=True)``.

    Accepts either bare UNet keys (``initial_conv.weight …``) or a full
    reference DDPM/DDIM state_dict (keys under ``model.``; schedule
    buffers and loss-module entries are ignored).
    """
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    if "initial_conv.weight" not in sd:
        prefixed = {k[len("model."):]: v for k, v in sd.items()
                    if k.startswith("model.")}
        if "initial_conv.weight" not in prefixed:
            raise ValueError(
                "not a reference DDPM/DDIM state_dict: no "
                "'initial_conv.weight' or 'model.initial_conv.weight' key")
        sd = prefixed

    params: Tree = {
        "initial_conv": _conv(sd, "initial_conv"),
        "time_embedding": {
            # Sequential indices: [0]=sinusoid (no params), [1]/[3]=Linear
            # (`/root/reference/models/layers/embeddings.py:55-60`).
            "dense1": _linear(sd, "time_embedding.positional_encoding.1"),
            "dense2": _linear(sd, "time_embedding.positional_encoding.3"),
        },
        "mid_res1": _res_block(sd, "bottleneck.0"),
        "mid_attn": _attention(sd, "bottleneck.1"),
        "mid_res2": _res_block(sd, "bottleneck.2"),
        "out_norm": _gn(sd, "output_conv.0"),
        "output_conv": _conv(sd, "output_conv.2"),
    }
    for i in range(5):
        params[f"down{i}"] = _stage(sd, f"down_blocks.{i}", attn=(i == 3),
                                    resample_key="down")
        params[f"up{i}"] = _stage(sd, f"up_blocks.{i}", attn=(i == 1),
                                  resample_key="up")
    return params


# --------------------------------------------------------------------------
# Export: flax params → reference torch state_dict (the exact inverse)
# --------------------------------------------------------------------------

def _zeros_bias(tree: Tree, out_key: str, weight: np.ndarray,
                exp: Dict[str, np.ndarray]) -> None:
    """Reference convs/linears ALWAYS have biases (PyTorch defaults);
    models trained here with ``conv_bias: false`` export zero biases —
    functionally identical (every such conv feeds a GroupNorm whose β
    already carries the offset)."""
    exp[out_key] = np.asarray(tree["bias"], np.float32) if "bias" in tree \
        else np.zeros(weight.shape[0], np.float32)


def _exp_conv(tree: Tree, p: str, exp: Dict[str, np.ndarray]) -> None:
    w = np.ascontiguousarray(
        np.asarray(tree["kernel"], np.float32).transpose(3, 2, 0, 1))
    exp[f"{p}.weight"] = w
    _zeros_bias(tree, f"{p}.bias", w, exp)


def _exp_conv_t(tree: Tree, p: str, exp: Dict[str, np.ndarray]) -> None:
    k = np.asarray(tree["kernel"], np.float32)      # [kh, kw, I, O]
    w = np.ascontiguousarray(
        k.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1])  # → [I, O, kh, kw]
    exp[f"{p}.weight"] = w
    # ConvTranspose2d bias is per OUTPUT channel = dim 1 of [I, O, kh, kw]
    exp[f"{p}.bias"] = (np.asarray(tree["bias"], np.float32)
                        if "bias" in tree
                        else np.zeros(w.shape[1], np.float32))


def _exp_linear(tree: Tree, p: str, exp: Dict[str, np.ndarray]) -> None:
    exp[f"{p}.weight"] = np.ascontiguousarray(
        np.asarray(tree["kernel"], np.float32).T)
    exp[f"{p}.bias"] = np.asarray(tree["bias"], np.float32)


def _exp_gn(tree: Tree, p: str, exp: Dict[str, np.ndarray]) -> None:
    exp[f"{p}.weight"] = np.asarray(tree["scale"], np.float32)
    exp[f"{p}.bias"] = np.asarray(tree["bias"], np.float32)


def _exp_res_block(tree: Tree, p: str, exp: Dict[str, np.ndarray]) -> None:
    _exp_gn(tree["norm1"], f"{p}.norm1", exp)
    _exp_conv(tree["conv1"], f"{p}.conv1", exp)
    _exp_linear(tree["time_proj"], f"{p}.time_mlp", exp)
    _exp_gn(tree["norm2"], f"{p}.norm2", exp)
    _exp_conv(tree["conv2"], f"{p}.conv2", exp)
    if "shortcut" in tree:
        _exp_conv(tree["shortcut"], f"{p}.shortcut", exp)


def _exp_attention(tree: Tree, p: str, exp: Dict[str, np.ndarray]) -> None:
    _exp_linear(tree["query"], f"{p}.query_projection", exp)
    _exp_linear(tree["key"], f"{p}.key_projection", exp)
    _exp_linear(tree["value"], f"{p}.value_projection", exp)
    _exp_linear(tree["proj"], f"{p}.final_projection", exp)
    exp[f"{p}.norm.weight"] = np.asarray(tree["norm_scale"], np.float32)
    exp[f"{p}.norm.bias"] = np.asarray(tree["norm_bias"], np.float32)


def _exp_stage(tree: Tree, p: str, attn: bool, resample_key: str,
               exp: Dict[str, np.ndarray], num_layers: int = 2) -> None:
    for i in range(num_layers):
        _exp_res_block(tree[f"res{i}"], f"{p}.res_blocks.{i}", exp)
        if attn:
            _exp_attention(tree[f"attn{i}"], f"{p}.attention_blocks.{i}",
                           exp)
    src = "downsample" if resample_key == "down" else "upsample"
    conv = _exp_conv if resample_key == "down" else _exp_conv_t
    conv(tree[resample_key]["conv"], f"{p}.{src}", exp)


def export_ddpm_unet_params(params: Tree) -> Dict[str, np.ndarray]:
    """Flax UNet params → reference UNet state_dict keys (bare, no
    ``model.`` prefix) — the exact inverse of
    :func:`convert_ddpm_unet_state_dict` (roundtrip pinned in
    ``tests/test_golden_torch.py``). Missing conv biases (the default
    ``conv_bias: false`` parameterization) export as zeros, which is
    functionally identical under the following GroupNorms."""
    exp: Dict[str, np.ndarray] = {}
    _exp_conv(params["initial_conv"], "initial_conv", exp)
    te = params["time_embedding"]
    _exp_linear(te["dense1"], "time_embedding.positional_encoding.1", exp)
    _exp_linear(te["dense2"], "time_embedding.positional_encoding.3", exp)
    for i in range(5):
        _exp_stage(params[f"down{i}"], f"down_blocks.{i}", attn=(i == 3),
                   resample_key="down", exp=exp)
        _exp_stage(params[f"up{i}"], f"up_blocks.{i}", attn=(i == 1),
                   resample_key="up", exp=exp)
    _exp_res_block(params["mid_res1"], "bottleneck.0", exp)
    _exp_attention(params["mid_attn"], "bottleneck.1", exp)
    _exp_res_block(params["mid_res2"], "bottleneck.2", exp)
    _exp_gn(params["out_norm"], "output_conv.0", exp)
    _exp_conv(params["output_conv"], "output_conv.2", exp)
    return exp


def export_ddpm_checkpoint(payload: Dict[str, Any]) -> Dict[str, Any]:
    """This framework's model-only checkpoint → the reference's
    ``{model_state_dict, config}`` schema, loadable STRICTLY by the
    reference ``DDPM`` class (`/root/reference/models/base_model.py:135-150`).

    The state_dict carries ``model.``-prefixed UNet weights plus the
    ``betas/alphas/alphas_cumprod`` schedule buffers recomputed from the
    config (the reference registers exactly these,
    `/root/reference/models/ddpm.py:176-178`; loading overwrites its
    linspace init, so non-linear schedules trained here keep their true ᾱ
    even inside the reference). The emitted config uses the reference's
    canonical spellings."""
    cfg = dict(payload.get("config", {}) or {})
    if cfg.get("learn_sigma"):
        raise ValueError(
            "learn_sigma checkpoints cannot be exported: the reference "
            "UNet has a C-channel output head, not the 2C learned-"
            "variance head (drop the variance channels and retrain, or "
            "keep the model in this framework)")
    num_t = int(cfg.get("num_timesteps", cfg.get("time_steps", 1000)))
    beta_start = float(cfg.get("beta_start", 1e-4))
    beta_end = float(cfg.get("beta_end", 2e-2))
    from .schedules import make_noise_schedule
    sched = make_noise_schedule(beta_start, beta_end, num_t,
                                cfg.get("schedule_type", "linear"))
    sd: Dict[str, np.ndarray] = {
        "betas": np.asarray(sched.betas, np.float32),
        "alphas": np.asarray(1.0 - np.asarray(sched.betas), np.float32),
        "alphas_cumprod": np.asarray(sched.alphas_cumprod, np.float32),
    }
    for k, v in export_ddpm_unet_params(
            payload["model_state_dict"]).items():
        sd[f"model.{k}"] = v
    ref_cfg = {
        "num_timesteps": num_t, "beta_start": beta_start,
        "beta_end": beta_end,
        "in_channels": int(cfg.get("in_channels",
                                   cfg.get("image_channels", 3))),
        "model_channels": int(cfg.get("model_channels",
                                      cfg.get("hidden_channels", 128))),
        "image_size": int(cfg.get("image_size", 32)),
        "loss_type": cfg.get("loss_type", "mse"),
        "loss_config": cfg.get("loss_config", {}),
    }
    return {"model_state_dict": sd, "config": ref_cfg}


def convert_ddpm_checkpoint(ckpt: Dict[str, Any]) -> Dict[str, Any]:
    """Full reference checkpoint → this framework's model-only payload.

    Input: ``torch.load`` of either checkpoint schema (model-only
    ``{model_state_dict, config}`` or the trainer checkpoint). Output:
    ``{"model_state_dict": flax params, "config": canonical model config
    (conv_bias stamped), "ema_model_state_dict": … (when present)}`` —
    directly consumable by :meth:`BaseDiffusionModel.load`'s schema.
    """
    sd = ckpt.get("model_state_dict", ckpt)
    out: Dict[str, Any] = {
        "model_state_dict": convert_ddpm_unet_state_dict(sd)}
    config = dict(ckpt.get("config", {}) or {})
    model_cfg = dict(config.get("model_config", config.get("model", config)))
    model_cfg["conv_bias"] = True
    out["config"] = model_cfg
    if "ema_model_state_dict" in ckpt:
        out["ema_model_state_dict"] = convert_ddpm_unet_state_dict(
            ckpt["ema_model_state_dict"])
    return out
