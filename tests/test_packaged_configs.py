"""The four packaged YAMLs must construct the models they describe
(defect-D9 regression guard at the whole-config level)."""

from pathlib import Path

import pytest

from diffusion_model_universal_tpu.models import MODEL_REGISTRY
from diffusion_model_universal_tpu.utils.config import (load_config,
                                                        resolve_interpolations)

CONFIG_DIR = Path(__file__).resolve().parent.parent / \
    "diffusion_model_universal_tpu" / "configs"

CASES = [
    ("ddpm_config.yaml", "ddpm"),
    ("ddim_config.yaml", "ddim"),
    ("score_based_config.yaml", "score_based"),
    ("energy_based_config.yaml", "energy_based"),
]


@pytest.mark.parametrize("fname,model_type", CASES)
def test_packaged_config_builds_model(fname, model_type):
    cfg = load_config(str(CONFIG_DIR / fname))
    model = MODEL_REGISTRY[model_type](cfg["model_config"])
    # The YAML's declared sizes must reach the model (D9 fix).
    if model_type in ("ddpm", "ddim"):
        assert model.num_timesteps == cfg["model_config"]["time_steps"]
        assert model.net.model_channels == \
            cfg["model_config"]["hidden_channels"]
    # learning_rate must parse as float, not str ('2e-4' PyYAML quirk).
    assert isinstance(cfg["training"]["learning_rate"], float)


def test_interpolations_resolve_in_packaged_configs():
    cfg = resolve_interpolations(
        load_config(str(CONFIG_DIR / "ddpm_config.yaml")))
    assert cfg["logging"]["group"] == "CIFAR10_comparison"
    assert "${" not in str(cfg["logging"]["tags"])


def test_profiling_utils():
    from diffusion_model_universal_tpu.utils.profiling import (
        StepTimer, device_memory_stats, trace)
    t = StepTimer(skip_first=1)
    for _ in range(3):
        t.start()
        t.stop()
    assert t.mean >= 0
    stats = device_memory_stats()
    assert "bytes_in_use" in stats
    with trace(enabled=False):
        pass
