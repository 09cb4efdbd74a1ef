"""Model families + registry (reference `models/__init__.py:1-11`,
`scripts/train.py:41-46`)."""

from .base import BaseDiffusionModel
from .ddim import DDIM
from .ddpm import DDPM
from .energy_based import EnergyBasedDiffusion, EnergyNet
from .score_based import ScoreBasedDiffusion
from .unet import UNet

# Registry keyed by the CLI --model_type strings
# (reference `scripts/train.py:41-46`).
MODEL_REGISTRY = {
    "ddpm": DDPM,
    "ddim": DDIM,
    "score_based": ScoreBasedDiffusion,
    "energy_based": EnergyBasedDiffusion,
}

__all__ = [
    "BaseDiffusionModel", "DDPM", "DDIM", "ScoreBasedDiffusion",
    "EnergyBasedDiffusion", "EnergyNet", "UNet", "MODEL_REGISTRY",
]
