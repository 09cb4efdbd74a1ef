"""Tests for config loading / canonicalization (reference `utils/config_utils.py`)."""

import textwrap

import pytest

from diffusion_model_universal_tpu.utils import config as C


def test_load_config_roundtrip(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(textwrap.dedent("""
        model_name: DDPM
        model_config:
          time_steps: 1000
          hidden_channels: 128
        training:
          learning_rate: 2e-4
    """))
    cfg = C.load_config(str(p))
    assert cfg["model_name"] == "DDPM"
    assert cfg["training"]["learning_rate"] == pytest.approx(2e-4)


def test_canonicalize_resolves_reference_yaml_spelling():
    """Defect D9 fix: YAML spelling (time_steps/hidden_channels/image_channels)
    must reach the model as num_timesteps/model_channels/in_channels."""
    cfg = C.canonicalize_model_config({
        "time_steps": 1000, "hidden_channels": 128, "image_channels": 3})
    assert cfg["num_timesteps"] == 1000
    assert cfg["model_channels"] == 128
    assert cfg["in_channels"] == 3


def test_canonical_key_wins_over_alias():
    cfg = C.canonicalize_model_config({"num_timesteps": 500, "time_steps": 1000})
    assert cfg["num_timesteps"] == 500


def test_canonicalize_handles_none():
    assert C.canonicalize_model_config(None) == {}


def test_validate_flags_unknown_keys():
    unknown = C.validate_model_config({"num_timesteps": 10, "typo_key": 1})
    assert unknown == ["typo_key"]
    with pytest.raises(ValueError):
        C.validate_model_config({"typo_key": 1}, strict=True)
    # The sample-quality / import knobs are known keys (no false warning).
    assert C.validate_model_config({
        "score_parameterization": "sigma", "training_objective": "dsm",
        "final_denoise": True, "dsm_weighting": "sigma2",
        "conv_bias": True}) == []


def test_load_data_config(tmp_path):
    p = tmp_path / "data.yaml"
    p.write_text(textwrap.dedent("""
        datasets:
          cifar10:
            image_size: 32
            splits: {train: 0.8, val: 0.1, test: 0.1}
    """))
    block = C.load_data_config(str(p), "cifar10")
    assert block["image_size"] == 32
    with pytest.raises(KeyError):
        C.load_data_config(str(p), "imagenet")


def test_interpolation_resolution():
    cfg = {
        "data": {"dataset": "CIFAR10"},
        "logging": {"group": "${data.dataset}_comparison",
                    "tags": ["ddpm", "${data.dataset}"],
                    "unresolvable": "${nope.nope}"},
    }
    out = C.resolve_interpolations(cfg)
    assert out["logging"]["group"] == "CIFAR10_comparison"
    assert out["logging"]["tags"][1] == "CIFAR10"
    assert out["logging"]["unresolvable"] == "${nope.nope}"


def test_packaged_data_config_exists_and_loads():
    path = C.default_data_config_path()
    block = C.load_data_config(path, "cifar10")
    assert block["image_size"] == 32
