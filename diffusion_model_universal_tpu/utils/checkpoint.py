"""Orbax-backed trainer checkpointing.

TPU-native equivalent of the reference's full trainer checkpoint schema
(`trainers/ddpm_trainer.py:850-924`, SURVEY.md §5.4):

    {epoch, model_state_dict, ema_model_state_dict, optimizer_state_dict,
     config, best_val_loss, scheduler_state_dict}

maps to an Orbax pytree checkpoint of

    {params, ema_params, opt_state, step, epoch, best_val_loss}

plus a sidecar ``config.json`` (the schedule needs no state — Optax
schedules are pure functions of the step). Policies preserved:
periodic ``checkpoint_epoch_{N}`` saves, ``best_model``, and
``emergency_checkpoint_epoch_{N}`` on exception, all main-process-gated.
Orbax handles sharded arrays natively, so the same code path works
single-chip and multi-host.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except ImportError:  # pragma: no cover
    _HAS_ORBAX = False


class CheckpointManager:
    """Save/restore named checkpoints under one run directory."""

    def __init__(self, directory: str, config: Optional[Dict] = None):
        self.directory = Path(directory).absolute()
        self.config = config or {}
        self.is_main = jax.process_index() == 0
        if self.is_main:
            self.directory.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer() if _HAS_ORBAX else None

    # -- save -------------------------------------------------------------
    def save(self, name: str, state: Dict[str, Any],
             overwrite: bool = True) -> Optional[str]:
        """Save a state pytree as ``<dir>/<name>`` (+ config.json).

        Multi-host: EVERY process must call this — Orbax coordinates the
        distributed write internally (each host serializes the shards it
        addresses; returning early on non-main processes would deadlock
        process 0 at Orbax's sync barrier and lose remote shards). Only
        host-side file bookkeeping is main-gated.
        """
        multiprocess = jax.process_count() > 1
        if not self.is_main and not multiprocess:
            return None
        path = self.directory / name
        if self._ckptr is not None:
            # `force=True` removes an existing checkpoint with Orbax's own
            # cross-host coordination (a manual rmtree on one host would
            # race the others' writes).
            self._ckptr.save(path, state, force=overwrite)
            self._ckptr.wait_until_finished()
        else:  # pragma: no cover
            import pickle
            if not self.is_main:
                return None
            host = jax.tree_util.tree_map(np.asarray, state)
            path.mkdir(parents=True, exist_ok=True)
            with open(path / "state.pkl", "wb") as f:
                pickle.dump(host, f)
        if self.is_main:
            with open(self.directory / "config.json", "w") as f:
                json.dump(self.config, f, indent=2, default=str)
        return str(path)

    # -- restore ----------------------------------------------------------
    def restore(self, name: str, target: Optional[Any] = None) -> Any:
        """Restore ``<dir>/<name>``; ``target`` gives pytree structure/
        shardings (pass the freshly-initialized state for exact dtypes,
        optax NamedTuple structure, and device placement)."""
        path = self.directory / name
        if not path.exists():
            raise FileNotFoundError(f"checkpoint not found: {path}")
        if self._ckptr is not None:
            if target is not None:
                abstract = jax.tree_util.tree_map(
                    ocp.utils.to_shape_dtype_struct, target)
                return self._ckptr.restore(path, abstract)
            return self._ckptr.restore(path)
        import pickle  # pragma: no cover
        with open(path / "state.pkl", "rb") as f:
            return pickle.load(f)

    # -- policy helpers ---------------------------------------------------
    def latest_epoch_checkpoint(self) -> Optional[str]:
        """Name of the newest ``checkpoint_epoch_{N}`` (for --resume)."""
        best_n, best_name = -1, None
        for p in self.directory.glob("checkpoint_epoch_*"):
            m = re.match(r"checkpoint_epoch_(\d+)$", p.name)
            if m and int(m.group(1)) > best_n:
                best_n, best_name = int(m.group(1)), p.name
        return best_name

    def prune_epoch_checkpoints(self, keep: int) -> list:
        """Delete all but the newest ``keep`` periodic checkpoints.

        Retention applies ONLY to ``checkpoint_epoch_*`` — ``best_model``,
        emergency saves, and ``final_model`` are exempt. Main-process-only
        and called after ``save`` returned (which waits for Orbax to
        finish), so no host still writes the pruned directories; a 200k-
        step run with ``checkpoint_interval: 1`` no longer fills the disk.
        """
        if not self.is_main or keep <= 0:
            return []
        import shutil
        epochs = []
        for p in self.directory.glob("checkpoint_epoch_*"):
            m = re.match(r"checkpoint_epoch_(\d+)$", p.name)
            if m:
                epochs.append((int(m.group(1)), p))
        removed = []
        for _, p in sorted(epochs)[:-keep]:
            shutil.rmtree(p, ignore_errors=True)
            removed.append(p.name)
        return removed

    def exists(self, name: str) -> bool:
        return (self.directory / name).exists()

    def load_config(self) -> Dict[str, Any]:
        with open(self.directory / "config.json") as f:
            return json.load(f)
