"""Metric logging: W&B + TensorBoard dual sink, rank-0 gated.

Capability parity with the reference's logging subsystem
(`trainers/ddpm_trainer.py:222-454`, SURVEY.md §5.5):

* dual optional sinks via ``logging.use_wandb`` / ``use_tensorboard``;
* per-step train loss / LR / fractional epoch / global step;
* periodic gradient+weight norms, optimizer moment stats, β/α/ᾱ schedule
  stats every ``gradient_logging_freq`` steps;
* performance metrics (batch time, samples/sec, steps/sec) gated by
  ``track_time_metrics`` and device memory stats by ``track_gpu_stats``;
* run naming ``{model_name}_{timestamp}`` with group/tags/notes;
* sample grids as images;
* everything gated on the main process (`jax.process_index() == 0`,
  replacing the reference's rank-0 checks).

Both wandb and tensorboard are OPTIONAL imports — absent packages degrade
to console/JSONL logging rather than failing (this environment has no
wandb).
"""

from __future__ import annotations

import json
import time
from datetime import datetime
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


class MetricLogger:
    """Routes metric dicts to wandb / TensorBoard / JSONL."""

    def __init__(self, config: Dict[str, Any], model_name: str = "model",
                 output_dir: str = "outputs"):
        self.config = config or {}
        log_cfg = self.config.get("logging", {}) or {}
        self.log_cfg = log_cfg
        self.is_main = jax.process_index() == 0
        self.model_name = model_name
        self.output_dir = Path(output_dir)
        self._wandb = None
        self._tb = None
        self._jsonl = None

        if not self.is_main:
            return
        self.output_dir.mkdir(parents=True, exist_ok=True)
        run_name = f"{model_name}_{datetime.now().strftime('%Y%m%d_%H%M%S')}"

        if log_cfg.get("use_wandb", False):
            try:
                import wandb
                self._wandb = wandb.init(
                    project=log_cfg.get("wandb_project", "diffusion-models"),
                    entity=log_cfg.get("wandb_entity"),
                    group=log_cfg.get("group"),
                    tags=log_cfg.get("tags"),
                    notes=log_cfg.get("notes"),
                    name=run_name, config=self.config)
            except Exception as e:  # wandb missing or offline
                print(f"[logging] wandb unavailable ({e}); continuing without")

        if log_cfg.get("use_tensorboard", False):
            try:
                from torch.utils.tensorboard import SummaryWriter
                tb_dir = Path(log_cfg.get("tensorboard_dir", "logs")) / run_name
                self._tb = SummaryWriter(str(tb_dir))
            except Exception as e:
                print(f"[logging] tensorboard unavailable ({e})")

        # Always-on JSONL sink so runs are inspectable without either.
        self._jsonl = open(self.output_dir / "metrics.jsonl", "a")

    # -- sinks -----------------------------------------------------------
    def log(self, metrics: Dict[str, Any], step: int) -> None:
        """Route a flat metric dict to all sinks
        (reference `_log_metrics`, `ddpm_trainer.py:272-321`)."""
        if not self.is_main:
            return
        scalars = {}
        for k, v in metrics.items():
            if isinstance(v, (jnp.ndarray, np.ndarray)) and np.size(v) > 1:
                arr = np.asarray(v)
                scalars[f"{k}/mean"] = float(arr.mean())
                scalars[f"{k}/std"] = float(arr.std())
                if self._tb is not None:
                    self._tb.add_histogram(k, arr, step)
                if self._wandb is not None:
                    import wandb
                    self._wandb.log({k: wandb.Histogram(arr)}, step=step)
            else:
                scalars[k] = float(v)
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, step)
        if self._jsonl is not None:
            self._jsonl.write(json.dumps({"step": step, **scalars}) + "\n")
            self._jsonl.flush()

    def log_image(self, tag: str, image: np.ndarray, step: int) -> None:
        """Sample grid logging (reference `ddpm_trainer.py:837-848`)."""
        if not self.is_main:
            return
        if self._wandb is not None:
            import wandb
            self._wandb.log({tag: wandb.Image(image)}, step=step)
        if self._tb is not None:
            chw = image.transpose(2, 0, 1) if image.ndim == 3 else image
            self._tb.add_image(tag, chw, step)

    def log_hparams(self, hparams: Dict[str, Any]) -> None:
        if not self.is_main or self._tb is None:
            return
        flat = {k: v for k, v in hparams.items()
                if isinstance(v, (int, float, str, bool))}
        try:
            self._tb.add_hparams(flat, {})
        except Exception:
            pass

    # -- derived metric helpers ------------------------------------------
    def gradient_metrics(self, layer_grad_norms: Any, global_grad_norm: Any,
                         global_param_norm: Any) -> Dict[str, Any]:
        """Global + per-layer grad/weight norms
        (reference `_log_model_gradients`, `ddpm_trainer.py:324-372`).

        The norms are computed INSIDE the jitted train step (a pytree of
        scalars in the metrics output) so the host never pulls gradient
        tensors; this just flattens the tree into named metrics.
        """
        out: Dict[str, Any] = {
            "gradients/global_norm": float(global_grad_norm),
            "weights/global_norm": float(global_param_norm),
        }
        if (self.log_cfg.get("track_per_layer_metrics", False)
                and layer_grad_norms is not None):
            for path, v in jax.tree_util.tree_leaves_with_path(
                    layer_grad_norms):
                name = "/".join(str(getattr(k, "key", k)) for k in path)
                out[f"gradients/{name}_norm"] = float(v)
        return out

    def model_histograms(self, grads: Any, params: Any) -> Dict[str, Any]:
        """Per-parameter gradient + weight HISTOGRAM payloads (reference
        `_log_model_gradients`, `ddpm_trainer.py:324-372`, which calls
        wandb.Histogram / tb.add_histogram on each tensor).

        Returns ``{tag: flat ndarray}`` — :meth:`log` routes any
        size>1 array to the histogram sinks (TB ``add_histogram``,
        ``wandb.Histogram``) and writes mean/std scalars to JSONL.
        Gated by ``logging.track_histograms`` in the trainer: pulling
        every gradient/weight tensor to the host costs ~4 bytes/param
        per logging event (the reference pays the same GPU→host cost).
        """
        out: Dict[str, Any] = {}
        for prefix, tree in (("gradients", grads), ("weights", params)):
            for path, v in jax.tree_util.tree_leaves_with_path(tree):
                name = "/".join(str(getattr(k, "key", k)) for k in path)
                out[f"{prefix}/{name}_hist"] = np.asarray(v).ravel()
        return out

    def optimizer_metrics(self, opt_state: Any, lr: float) -> Dict[str, Any]:
        """Adam moment averages + LR (reference `_log_optimizer_stats`,
        `ddpm_trainer.py:404-435`).

        Per-leaf reductions execute on-device; only scalars cross to the
        host (no concatenation of full moment tensors).
        """
        out = {"optimizer/learning_rate": float(lr)}
        try:
            import optax
            for s in jax.tree_util.tree_leaves(
                    opt_state, is_leaf=lambda x: isinstance(
                        x, optax.ScaleByAdamState)):
                if isinstance(s, optax.ScaleByAdamState):
                    def _mean(tree):
                        # Sum per-leaf ON DEVICE, one host sync total —
                        # float() per leaf would cost 2 round trips per
                        # parameter tensor (~ms each under a tunnel).
                        leaves = jax.tree_util.tree_leaves(tree)
                        total = sum((jnp.sum(l) for l in leaves),
                                    jnp.zeros((), jnp.float32))
                        count = sum(l.size for l in leaves)
                        return float(total) / max(count, 1)
                    out["optimizer/exp_avg_mean"] = _mean(s.mu)
                    out["optimizer/exp_avg_sq_mean"] = _mean(s.nu)
                    break
        except Exception:
            pass
        return out

    def diffusion_metrics(self, schedule) -> Dict[str, Any]:
        """β/α/ᾱ summary stats (reference `_log_diffusion_metrics`,
        `ddpm_trainer.py:437-454`)."""
        return {
            "diffusion/beta": np.asarray(schedule.betas),
            "diffusion/alpha": np.asarray(schedule.alphas),
            "diffusion/alpha_cumprod": np.asarray(schedule.alphas_cumprod),
        }

    def performance_metrics(self, batch_time: float,
                            batch_size: int) -> Dict[str, Any]:
        """Throughput metrics (reference `_log_performance_metrics`,
        `ddpm_trainer.py:374-402`)."""
        out = {
            "performance/batch_time": batch_time,
            "performance/samples_per_second":
                batch_size / max(batch_time, 1e-9),
            "performance/steps_per_second": 1.0 / max(batch_time, 1e-9),
        }
        if self.log_cfg.get("track_gpu_stats", False):
            try:
                stats = jax.local_devices()[0].memory_stats()
                if stats:
                    out["performance/device_bytes_in_use"] = stats.get(
                        "bytes_in_use", 0)
                    out["performance/device_peak_bytes"] = stats.get(
                        "peak_bytes_in_use", 0)
            except Exception:
                pass
        return out

    def close(self) -> None:
        """Flush/close sinks (reference `cleanup`, `ddpm_trainer.py:926-940`)."""
        if self._wandb is not None:
            self._wandb.finish()
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()
            self._jsonl = None
