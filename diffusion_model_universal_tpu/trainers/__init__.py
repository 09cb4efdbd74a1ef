"""Trainer registry + per-family trainers.

The reference has one fat trainer plus thin subclasses that override
sample-grid generation and extra hyperparameter logging
(`trainers/__init__.py:6-11`, `ddim_trainer.py:14-82`,
`score_based_trainer.py:21-113`, `energy_based_trainer.py:21-114`).
Same structure here: :class:`DiffusionTrainer` is the engine; subclasses
adjust sampling/logging only.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .optim import make_lr_schedule, make_optimizer
from .trainer import DiffusionTrainer, TrainState


class DDPMTrainer(DiffusionTrainer):
    """DDPM training (the engine defaults)."""


class DDIMTrainer(DiffusionTrainer):
    """DDIM: logs DDIM hyperparams once; intermediates grids use one
    column per saved DDIM step (reference `ddim_trainer.py:25-82`)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        if self.is_main:
            self.logger.log({
                "ddim/sampling_steps": self.model.ddim_sampling_steps,
                "ddim/eta": self.model.eta,
            }, 0)


class ScoreBasedTrainer(DiffusionTrainer):
    """Score-based: samples via annealed Langevin (`model.sample`), logs
    σ-range/β (reference `score_based_trainer.py:64-113`)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        if self.is_main:
            self.logger.log({
                "score/sigma_min": self.model.sigma_min,
                "score/sigma_max": self.model.sigma_max,
                "score/beta": self.model.beta,
                "score/num_scales": self.model.num_scales,
            }, 0)

    def generate_samples(self, epoch: int, num_samples: int = 4,
                         use_ema: bool = False) -> Optional[str]:
        if not self.is_main:
            return None
        from ..utils.images import save_image
        params = self.state.ema_params if use_ema else self.state.params
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed + 99), epoch)
        samples = np.asarray(self.model.sample(params, key, num_samples))
        path = self.output_dir / "samples" / f"epoch_{epoch}.png"
        out = save_image(samples, str(path))
        return out


class EnergyBasedTrainer(ScoreBasedTrainer):
    """Energy-based: Langevin sampling + energy-stat logging
    (reference `energy_based_trainer.py:64-114`)."""

    def __init__(self, *args, **kwargs):
        DiffusionTrainer.__init__(self, *args, **kwargs)
        if self.is_main:
            self.logger.log({
                "energy/scale": self.model.energy_scale,
                "energy/regularization_weight":
                    self.model.regularization_weight,
                "energy/langevin_step_size": self.model.langevin_step_size,
                "energy/langevin_steps": self.model.langevin_steps,
            }, 0)


# Registry keyed by the CLI --model_type strings
# (reference `trainers/__init__.py:6-11`).
TRAINER_REGISTRY = {
    "ddpm": DDPMTrainer,
    "ddim": DDIMTrainer,
    "score_based": ScoreBasedTrainer,
    "energy_based": EnergyBasedTrainer,
}

__all__ = ["DiffusionTrainer", "TrainState", "DDPMTrainer", "DDIMTrainer",
           "ScoreBasedTrainer", "EnergyBasedTrainer", "TRAINER_REGISTRY",
           "make_optimizer", "make_lr_schedule"]
