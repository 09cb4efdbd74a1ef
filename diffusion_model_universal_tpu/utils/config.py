"""Config loading / validation.

Mirrors the YAML surface of the reference (`utils/config_utils.py:11-69`):
``load_config`` (yaml.safe_load), ``load_data_config(path, name)`` returning
``data_config['datasets'][name]``, and ``print_config`` pretty-printing.

Additions over the reference:

* ``canonicalize_model_config`` — the reference's shipped YAMLs use keys
  (``time_steps``, ``hidden_channels``, ``image_channels``) that its model
  code never reads (it reads ``num_timesteps``, ``model_channels``,
  ``in_channels`` with silent defaults — reference `models/ddpm.py:171-184`,
  defect D9 in SURVEY.md §2.7). We accept BOTH spellings and canonicalize, so
  the shipped configs train the model they describe.
* ``validate_config`` — warns on unknown keys instead of silently ignoring
  typos.
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Dict, Optional

import yaml

# Canonical name <- accepted aliases (reference YAML spelling first).
_MODEL_KEY_ALIASES: Dict[str, tuple] = {
    "num_timesteps": ("time_steps", "timesteps"),
    "model_channels": ("hidden_channels",),
    "in_channels": ("image_channels",),
}

# Keys the model layer understands (superset over all four families).
_KNOWN_MODEL_KEYS = {
    "num_timesteps", "beta_start", "beta_end", "image_size", "image_channels",
    "in_channels", "model_channels", "num_res_blocks", "dropout", "loss_type",
    "loss_config", "ddim_sampling_steps", "ddim_discretize_method", "eta",
    "sigma_min", "sigma_max", "num_scales", "beta", "langevin_steps",
    "langevin_step_size", "energy_scale", "regularization_weight",
    "use_time_conditioning", "channel_multipliers", "attention_resolutions",
    "scale_by_sigma", "ema_rate", "noise_schedule", "time_steps",
    "hidden_channels", "compute_dtype", "use_pallas", "mcmc_steps_per_iter",
    "schedule_type", "remat", "num_classes", "cfg_drop_prob",
    "conv_bias", "final_denoise", "dsm_weighting",
    "score_parameterization", "training_objective", "prediction_type",
}


class _SciLoader(yaml.SafeLoader):
    """SafeLoader that parses ``2e-4``-style floats.

    YAML 1.1 (PyYAML) requires a mantissa dot (``2.0e-4``); the reference's
    shipped configs write ``learning_rate: 2e-4`` (`configs/ddpm_config.yaml:49`)
    which PyYAML loads as a *string*. We resolve such scalars as floats, which
    is clearly the intended behavior.
    """


_SciLoader.add_implicit_resolver(
    "tag:yaml.org,2002:float",
    __import__("re").compile(
        r"""^(?:[-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
        |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
        |\.[0-9_]+(?:[eE][-+][0-9]+)?
        |[-+]?\.(?:inf|Inf|INF)
        |\.(?:nan|NaN|NAN))$""",
        __import__("re").X,
    ),
    list("-+0123456789."),
)


def load_config(config_path: str) -> Dict[str, Any]:
    """Load a YAML config file into a plain dict (reference `config_utils.py:11`)."""
    with open(config_path, "r") as f:
        return yaml.load(f, Loader=_SciLoader)


def load_data_config(config_path: str, dataset_name: str) -> Dict[str, Any]:
    """Load the per-dataset block of the shared data config.

    Reference `utils/config_utils.py:28-46`: reads
    ``data_config['datasets'][dataset_name]``.
    """
    with open(config_path, "r") as f:
        data_config = yaml.safe_load(f)
    datasets = data_config.get("datasets", {})
    if dataset_name not in datasets:
        raise KeyError(
            f"Dataset '{dataset_name}' not found in {config_path}; "
            f"available: {sorted(datasets)}"
        )
    return datasets[dataset_name]


def print_config(title: str, config: Dict[str, Any], indent: int = 0) -> None:
    """Pretty-print a nested config dict (reference `config_utils.py:49-69`)."""
    if indent == 0:
        bar = "=" * 60
        print(f"\n{bar}\n{title}\n{bar}")
    for key, value in config.items():
        pad = "  " * indent
        if isinstance(value, dict):
            print(f"{pad}{key}:")
            print_config(title, value, indent + 1)
        else:
            print(f"{pad}{key}: {value}")
    if indent == 0:
        print("=" * 60 + "\n")


def canonicalize_model_config(model_config: Optional[Dict[str, Any]]) -> Dict[str, Any]:
    """Return a copy of ``model_config`` with alias keys resolved.

    Fixes SURVEY.md defect D9: the reference's YAMLs say ``time_steps: 1000``
    and ``hidden_channels: 128`` but its model constructor reads
    ``num_timesteps`` / ``model_channels`` with silent fallbacks
    (`models/ddpm.py:171-184`), so the shipped config trained a smaller model
    than it declared. Canonical keys win if both spellings are present.
    """
    cfg = copy.deepcopy(model_config) if model_config else {}
    for canonical, aliases in _MODEL_KEY_ALIASES.items():
        if canonical not in cfg:
            for alias in aliases:
                if alias in cfg:
                    cfg[canonical] = cfg[alias]
                    break
    return cfg


def validate_model_config(model_config: Dict[str, Any], strict: bool = False) -> list:
    """Return (and optionally raise on) unknown model-config keys."""
    unknown = sorted(k for k in model_config if k not in _KNOWN_MODEL_KEYS)
    if unknown and strict:
        raise ValueError(f"Unknown model config keys: {unknown}")
    return unknown


def resolve_interpolations(config: Dict[str, Any]) -> Dict[str, Any]:
    """Resolve ``${a.b}``-style string interpolations against the root config.

    The reference passes ``${data.dataset}`` strings through literally
    (`configs/ddpm_config.yaml:93-95`, SURVEY.md §5.6); we resolve them.
    Unresolvable references are left as-is.
    """

    def lookup(path: str) -> Any:
        node: Any = config
        for part in path.split("."):
            if not isinstance(node, dict) or part not in node:
                return None
            node = node[part]
        return node

    def resolve(value: Any) -> Any:
        if isinstance(value, str) and "${" in value:
            out = value
            while "${" in out:
                start = out.index("${")
                end = out.index("}", start)
                ref = out[start + 2 : end]
                repl = lookup(ref)
                if repl is None:
                    break
                out = out[:start] + str(repl) + out[end + 1 :]
            return out
        if isinstance(value, dict):
            return {k: resolve(v) for k, v in value.items()}
        if isinstance(value, list):
            return [resolve(v) for v in value]
        return value

    return {k: resolve(v) for k, v in config.items()}


def default_data_config_path() -> str:
    """Path of the packaged ``data_config.yaml`` (reference hardcodes
    ``configs/data_config.yaml`` at `datasets/dataset_utils.py:97`)."""
    return str(Path(__file__).resolve().parent.parent / "configs" / "data_config.yaml")
