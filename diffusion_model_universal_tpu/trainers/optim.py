"""Optimizer + LR-schedule factory.

Mirrors the reference trainer's optimizer setup
(`trainers/ddpm_trainer.py:138-202`): Adam from
``training.{learning_rate, beta1, beta2}`` and five scheduler types —
cosine / linear(warmup+decay) / step / exponential / one_cycle.

The reference steps some schedulers per-batch and others per-epoch
(`ddpm_trainer.py:557-568`); in Optax every schedule is a pure function of
the global STEP, so epoch-based ones are converted with
``steps_per_epoch`` — same trajectory, jit-friendly.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import optax


def make_lr_schedule(training_cfg: Dict[str, Any], steps_per_epoch: int,
                     num_epochs: int) -> Callable:
    """Build the Optax schedule named by ``training.scheduler.type``."""
    base_lr = float(training_cfg.get("learning_rate", 1e-4))
    sched_cfg = training_cfg.get("scheduler", {}) or {}
    stype = sched_cfg.get("type", "constant")
    total_steps = max(steps_per_epoch * num_epochs, 1)
    min_lr = float(sched_cfg.get("min_lr", 0.0))

    if stype == "cosine":
        # CosineAnnealingLR(T_max=num_epochs, eta_min=min_lr), per-epoch
        # in the reference (`ddpm_trainer.py:147-152`).
        return optax.cosine_decay_schedule(
            base_lr, decay_steps=total_steps, alpha=min_lr / base_lr)
    if stype == "linear":
        # Linear warmup then linear decay to 0 (`ddpm_trainer.py:154-170`).
        warmup = int(sched_cfg.get("warmup_steps", 0))
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, max(warmup, 1)),
             optax.linear_schedule(base_lr, min_lr,
                                   max(total_steps - warmup, 1))],
            boundaries=[warmup])
    if stype == "step":
        # StepLR(step_size epochs, gamma) (`ddpm_trainer.py:172-177`).
        step_size = int(sched_cfg.get("step_size", 100)) * steps_per_epoch
        gamma = float(sched_cfg.get("gamma", 0.1))
        return lambda step: base_lr * gamma ** (step // max(step_size, 1))
    if stype == "exponential":
        # ExponentialLR(gamma) per epoch (`ddpm_trainer.py:179-183`).
        gamma = float(sched_cfg.get("gamma", 0.95))
        return lambda step: base_lr * gamma ** (step / max(steps_per_epoch, 1))
    if stype == "one_cycle":
        # OneCycleLR(max_lr=lr) per batch (`ddpm_trainer.py:185-192`).
        pct_start = float(sched_cfg.get("pct_start", 0.3))
        return optax.cosine_onecycle_schedule(
            transition_steps=total_steps, peak_value=base_lr,
            pct_start=pct_start,
            div_factor=float(sched_cfg.get("div_factor", 25.0)),
            final_div_factor=float(sched_cfg.get("final_div_factor", 1e4)))
    if stype == "constant":
        return optax.constant_schedule(base_lr)
    raise ValueError(f"Unknown scheduler type: {stype}")


def make_optimizer(training_cfg: Dict[str, Any], steps_per_epoch: int,
                   num_epochs: int
                   ) -> Tuple[optax.GradientTransformation, Callable]:
    """Adam(+grad clip) with the configured LR schedule.

    Returns (optimizer, schedule_fn) — the schedule is also returned so the
    trainer can log the current LR (`ddpm_trainer.py:580-588`).
    """
    schedule = make_lr_schedule(training_cfg, steps_per_epoch, num_epochs)
    b1 = float(training_cfg.get("beta1", 0.9))
    b2 = float(training_cfg.get("beta2", 0.999))
    # Optional bf16 storage for Adam's first moment: halves mu's HBM
    # read+write per step. The first moment is a smoothed gradient whose
    # bf16 rounding is well inside gradient noise (standard practice in
    # large-scale JAX training); the second moment stays f32 (it feeds a
    # rsqrt, where precision matters).
    mu_dtype = training_cfg.get("adam_mu_dtype") or None
    chain = []
    grad_clip = training_cfg.get("grad_clip")
    if grad_clip:
        chain.append(optax.clip_by_global_norm(float(grad_clip)))
    chain.append(optax.adam(schedule, b1=b1, b2=b2, mu_dtype=mu_dtype))
    opt = optax.chain(*chain)
    # Production guard the reference lacks: a single NaN/Inf batch (bad
    # sample, bf16 overflow spike) permanently poisons Adam's moments and
    # the EMA. With `skip_nonfinite_updates`, non-finite updates become
    # no-ops (params/moments untouched) and training continues; after N
    # CONSECUTIVE bad steps the optimizer raises the error instead of
    # looping forever. Off by default — parity with the reference.
    skip = training_cfg.get("skip_nonfinite_updates", 0)
    if skip:
        # Booleans (`true` in YAML) get the 100-step default; integers are
        # honored LITERALLY — `skip_nonfinite_updates: 1` means fail fast
        # after one consecutive non-finite step, not 100.
        max_errors = 100 if isinstance(skip, bool) else int(skip)
        opt = optax.apply_if_finite(opt, max_consecutive_errors=max_errors)
    return opt, schedule
