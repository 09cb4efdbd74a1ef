"""Sample-generation CLI.

Surface parity with the reference's `scripts/generate.py:81-135`:

    python -m diffusion_model_universal_tpu.scripts.generate \
        --config configs/ddpm_config.yaml --model_type ddpm \
        --checkpoint path/to/model.ckpt [--num_samples N] [--output_dir D]

Defect fixes (SURVEY.md §2.7):
* D2 — the reference calls a nonexistent ``model.generate_sample`` and
  reads a ``config['model']`` section no shipped YAML defines; here the
  dispatch uses each family's real sampler and the same
  ``model_config`` section training uses.
* Accepts both the model-only checkpoint (``BaseDiffusionModel.save``) and
  a full trainer checkpoint directory (Orbax), sampling from EMA params
  when available (``--ema``).
"""

from __future__ import annotations

import argparse
import math
import sys
from pathlib import Path


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Generate samples (TPU)")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--model_type", type=str, required=True,
                   choices=["ddpm", "ddim", "score_based", "energy_based"])
    p.add_argument("--checkpoint", type=str, required=True,
                   help="Model-only .ckpt file or trainer checkpoint dir")
    p.add_argument("--num_samples", type=int, default=16)
    p.add_argument("--output_dir", type=str, default="generated_samples")
    p.add_argument("--ema", action="store_true",
                   help="Sample from EMA params (trainer checkpoints only)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_devices", type=int, default=None,
                   help="Restrict sampling to the first N local devices "
                        "(default: all — generation is data-parallel)")
    p.add_argument("--sampler", type=str, default="default",
                   choices=["default", "dpm++", "heun", "strided"],
                   help="'default' = the model family's own sampler; "
                        "'dpm++' = DPM-Solver++(2M) fast ODE sampler "
                        "(one model eval/step); 'heun' = Karras-spaced "
                        "Heun/EDM (two evals/update); 'strided' = "
                        "respaced STOCHASTIC ancestral (iDDPM §4, the "
                        "fast path for learn_sigma models) — all "
                        "ddpm/ddim models only")
    p.add_argument("--sampler_steps", type=int, default=20,
                   help="Grid size for --sampler dpm++/heun/strided")
    p.add_argument("--class_id", type=int, default=None,
                   help="Class label for conditional checkpoints "
                        "(model_config.num_classes > 0); all samples "
                        "get this class")
    p.add_argument("--guidance_scale", type=float, default=3.0,
                   help="Classifier-free guidance scale for --class_id "
                        "(1.0 = plain conditional)")
    p.add_argument("--grid_only", action="store_true",
                   help="Skip per-sample PNGs, save only the grid")
    p.add_argument("--inpaint_image", type=str, default=None,
                   help=".npy conditioning image(s), [H,W,C] or [B,H,W,C] "
                        "in the model's data range ([-1,1]); regenerates "
                        "the region where --inpaint_mask is 0 "
                        "(ddpm/ddim models, ancestral sampler)")
    p.add_argument("--inpaint_mask", type=str, default=None,
                   help=".npy mask broadcastable to the image; 1 = keep, "
                        "0 = generate (required with --inpaint_image)")
    return p


def _load_inpaint_inputs(args, model):
    """Load/validate --inpaint_image/--inpaint_mask into [N,H,W,C] arrays."""
    import numpy as np
    if args.inpaint_mask is None:
        raise SystemExit("--inpaint_image requires --inpaint_mask")
    if args.sampler != "default":
        raise SystemExit("--inpaint_image uses the ancestral sampler; "
                         "drop --sampler")
    image = np.load(args.inpaint_image).astype(np.float32)
    mask = np.load(args.inpaint_mask).astype(np.float32)
    if image.ndim == 3:
        image = image[None]
    want = model.sample_shape(1)[1:]
    if image.shape[1:] != tuple(want):
        raise SystemExit(f"--inpaint_image shape {image.shape[1:]} != "
                         f"model sample shape {tuple(want)}")
    if image.shape[0] == 1 and args.num_samples > 1:
        image = np.tile(image, (args.num_samples, 1, 1, 1))
    if image.shape[0] != args.num_samples:
        raise SystemExit(f"--inpaint_image batch {image.shape[0]} != "
                         f"--num_samples {args.num_samples}")
    if mask.ndim == 2:
        mask = mask[None, :, :, None]
    elif mask.ndim == 3:
        mask = mask[None]
    try:
        np.broadcast_shapes(mask.shape, image.shape)
    except ValueError:
        raise SystemExit(f"--inpaint_mask shape {mask.shape} does not "
                         f"broadcast to image shape {image.shape}")
    return image, mask


def resolve_model_config(config: dict, checkpoint: str) -> dict:
    """YAML model_config with the checkpoint's embedded config overlaid.

    Model-file checkpoints embed the config they were built with
    (BaseDiffusionModel.save) — overlaying it means architecture keys
    the YAML doesn't mention (learn_sigma, num_classes,
    prediction_type, ...) can't silently mismatch the saved params.
    YAML keys absent from the checkpoint still apply. Shared by the
    generate CLI and the HTTP server."""
    model_cfg = dict(config.get("model_config", config.get("model", {})))
    p = Path(checkpoint)
    if p.is_file():
        import pickle
        try:
            with open(p, "rb") as f:
                ckpt_cfg = pickle.load(f).get("config") or {}
        except Exception:
            ckpt_cfg = {}
        model_cfg.update(ckpt_cfg)
    return model_cfg


def load_params(model, path: str, use_ema: bool):
    """Load params from either checkpoint flavor."""
    import jax
    p = Path(path)
    if p.is_dir():  # Orbax trainer checkpoint
        from ..utils.checkpoint import CheckpointManager
        mgr = CheckpointManager(str(p.parent))
        template = model.init_params(jax.random.PRNGKey(0))
        target = {"params": template, "ema_params": template}
        try:
            restored = mgr.restore(p.name, target)
        except Exception:
            restored = mgr.restore(p.name)
        key = "ema_params" if use_ema else "params"
        return restored[key]
    return model.load(str(p))


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)

    import jax
    import numpy as np

    if jax.default_backend() == "tpu":
        from ..utils.cache import enable_compilation_cache
        enable_compilation_cache()  # skip repeated remote sampler compiles

    from ..models import MODEL_REGISTRY
    from ..utils.config import load_config, resolve_interpolations
    from ..utils.images import save_image

    config = resolve_interpolations(load_config(args.config))
    model_cfg = resolve_model_config(config, args.checkpoint)
    model = MODEL_REGISTRY[args.model_type](model_cfg)
    params = load_params(model, args.checkpoint, args.ema)

    key = jax.random.PRNGKey(args.seed)
    # Distribute generation over all local devices (DP batch sharding
    # via the UNet's "batch" logical axis; no-op on one device).
    from ..parallel.mesh import local_devices, make_mesh, sampling_scope
    devices = local_devices(args.num_devices)
    labels = None
    if args.class_id is not None:
        if not hasattr(model, "make_class_labels"):
            raise SystemExit(f"--class_id unsupported for "
                             f"{args.model_type} models")
        try:
            labels = model.make_class_labels(args.class_id,
                                             args.num_samples)
        except ValueError as e:
            raise SystemExit(f"--class_id: {e}")
    inpaint = None
    if args.inpaint_image is not None:
        if not hasattr(model, "generate_samples_inpaint"):
            raise SystemExit(f"--inpaint_image unsupported for "
                             f"{args.model_type} models (ddpm/ddim only)")
        inpaint = _load_inpaint_inputs(args, model)
    from ..parallel.mesh import mesh_replicated
    from ..utils.memory import SamplerMemoryError, plan_sampler_chunks
    mesh = make_mesh(devices)
    # HBM preflight (BENCH_NOTES r4: an un-guarded B=1024 64² ancestral
    # request crashed the TPU worker): split oversized requests into
    # equal device-aligned chunks, or refuse with a clear message.
    try:
        chunk, n_chunks = plan_sampler_chunks(
            args.num_samples,
            image_size=int(model_cfg.get("image_size", 32)),
            model_channels=int(model_cfg.get("model_channels", 64)),
            in_channels=int(model_cfg.get("in_channels", 3)),
            dtype_bytes=2 if "bf" in str(
                model_cfg.get("compute_dtype", "bfloat16")) else 4,
            params_bytes=sum(
                a.size * a.dtype.itemsize
                for a in jax.tree_util.tree_leaves(params)),
            n_devices=len(devices))
    except SamplerMemoryError as e:
        raise SystemExit(f"--num_samples {args.num_samples}: {e}")
    # Mesh-form ALL jit inputs: single-device-committed inputs under the
    # sampling mesh make GSPMD pick unrecoverable partial shardings
    # whenever num_samples doesn't divide the data axis (mesh_replicated).
    params, key, labels = mesh_replicated(mesh, (params, key, labels))

    def sample_chunk(n, ckey, clabels, cinpaint):
        """One sampler dispatch for ``n`` samples (the original whole-batch
        body; chunking callers pass n = chunk and slice the result)."""
        if cinpaint is not None:
            image, mask = mesh_replicated(mesh, cinpaint)
            return np.asarray(model.generate_samples_inpaint(
                params, ckey, image, mask, labels=clabels,
                guidance_scale=args.guidance_scale if clabels is not None
                else 1.0))
        if args.sampler != "default":
            method = {"dpm++": "generate_samples_dpm",
                      "heun": "generate_samples_heun",
                      "strided": "generate_samples_strided"}[args.sampler]
            if not hasattr(model, method):
                raise SystemExit(
                    f"--sampler {args.sampler} needs an ε-prediction model "
                    f"(ddpm/ddim), got {args.model_type}")
            try:
                return np.asarray(getattr(model, method)(
                    params, ckey, n,
                    num_steps=args.sampler_steps, labels=clabels,
                    guidance_scale=args.guidance_scale if clabels is not None
                    else 1.0))
            except ValueError as e:  # e.g. --sampler_steps out of [2, T]
                raise SystemExit(f"--sampler {args.sampler}: {e}")
        if clabels is not None:
            return np.asarray(model.generate_samples_cfg(
                params, ckey, n, clabels,
                guidance_scale=args.guidance_scale))
        return np.asarray(model.generate_samples(params, ckey, n))

    with sampling_scope(mesh):
        if n_chunks == 1:
            samples = sample_chunk(args.num_samples, key, labels, inpaint)
        else:
            print(f"HBM preflight: {args.num_samples} samples split into "
                  f"{n_chunks} chunks of {chunk} (estimated footprint "
                  f"exceeds the device budget; set DMU_SAMPLER_HBM_BYTES "
                  f"to override)", flush=True)
            chunk_labels = None
            if labels is not None:
                chunk_labels = mesh_replicated(mesh, model.make_class_labels(
                    args.class_id, chunk))
            parts = []
            for ci in range(n_chunks):
                start = ci * chunk
                n = min(chunk, args.num_samples - start)
                ckey = jax.random.fold_in(key, ci)
                cinp = None
                if inpaint is not None:
                    image, mask = inpaint
                    img_c = image[start:start + n]
                    msk_c = mask[start:start + n] if mask.shape[0] > 1 \
                        else mask
                    if n < chunk:  # pad to the compiled chunk shape
                        img_c = np.concatenate(
                            [img_c, np.repeat(img_c[-1:], chunk - n, 0)])
                        if msk_c.shape[0] > 1:
                            msk_c = np.concatenate(
                                [msk_c, np.repeat(msk_c[-1:], chunk - n, 0)])
                    cinp = (img_c, msk_c)
                parts.append(sample_chunk(chunk, ckey, chunk_labels,
                                          cinp)[:n])
            samples = np.concatenate(parts)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    if not args.grid_only:
        for i in range(len(samples)):
            save_image(samples[i], str(out / f"sample_{i:04d}.png"))
    nrow = int(math.ceil(math.sqrt(args.num_samples)))
    grid_path = save_image(samples, str(out / "samples_grid.png"), nrow=nrow)
    print(f"Saved {len(samples)} samples to {out} (grid: {grid_path})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
