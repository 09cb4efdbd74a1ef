"""Training CLI.

Drop-in surface parity with the reference's `scripts/train.py:211-235`:

    python -m diffusion_model_universal_tpu.scripts.train \
        --config configs/ddpm_config.yaml --model_type ddpm \
        [--resume CKPT] [--eval_only] [--benchmark] [--num_devices N]

Differences are all TPU-idiom:
* No ``mp.spawn``/NCCL process management (`train.py:222-235`, `:48-67`) —
  JAX is SPMD: one process per host, a `Mesh` over all local devices, and
  ``--num_devices`` simply restricts the mesh. For multi-host runs call
  ``jax.distributed.initialize()`` (``--multihost``) before anything else.
* rank-0 gating becomes ``jax.process_index() == 0``.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train diffusion models (TPU)")
    p.add_argument("--config", type=str, required=True,
                   help="Path to YAML config file")
    p.add_argument("--model_type", type=str, required=True,
                   choices=["ddpm", "ddim", "score_based", "energy_based"])
    p.add_argument("--resume", type=str, default=None,
                   help="Checkpoint name (or 'latest') to resume from")
    p.add_argument("--eval_only", action="store_true",
                   help="Only run evaluation on the test set")
    p.add_argument("--benchmark", action="store_true",
                   help="Run FID/IS/SSIM/PSNR benchmarks after training")
    p.add_argument("--num_devices", "--num_gpus", type=int, default=None,
                   dest="num_devices",
                   help="Restrict the mesh to the first N local devices "
                        "(--num_gpus is the reference's spelling, "
                        "`scripts/train.py:219`, kept as a drop-in alias)")
    p.add_argument("--multihost", action="store_true",
                   help="Call jax.distributed.initialize() for multi-host")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--profile", nargs="?", const="__default__", default=None,
                   metavar="DIR",
                   help="Capture a jax.profiler trace of a few real "
                        "training steps before the run (TensorBoard "
                        "Profile tab / xprof); optional trace directory")
    p.add_argument("--profile_steps", type=int, default=5)
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)

    import jax
    if args.multihost:
        jax.distributed.initialize()
    if jax.default_backend() == "tpu":
        # Persistent compile cache: repeated CLI invocations (resume,
        # per-checkpoint --eval_only --benchmark sweeps) skip the
        # minutes-long remote TPU compiles. TPU-only: CPU AOT entries
        # from another host can SIGILL (see .claude/skills/verify).
        from ..utils.cache import enable_compilation_cache
        enable_compilation_cache()

    from ..datasets import get_dataset
    from ..models import MODEL_REGISTRY
    from ..parallel.mesh import is_main_process, local_devices, make_mesh
    from ..trainers import TRAINER_REGISTRY
    from ..utils.config import load_config, print_config, resolve_interpolations

    config = resolve_interpolations(load_config(args.config))
    if is_main_process():
        print_config("Main Configuration", config)

    devices = local_devices(args.num_devices)
    # Parallelism layout from the config's `distributed` section (the
    # reference's section only held the NCCL backend name,
    # `configs/ddpm_config.yaml:135-137`; here it picks mesh axes):
    #   model_parallel   — tensor-parallel factor (channels / params)
    #   spatial_parallel — image-height sharding factor (SP)
    # Remaining devices go to data parallelism.
    dist_cfg = config.get("distributed", {}) or {}
    mesh = make_mesh(devices,
                     model_parallel=int(dist_cfg.get("model_parallel", 1)),
                     spatial_parallel=int(
                         dist_cfg.get("spatial_parallel", 1)))

    world_size = jax.process_count()
    rank = jax.process_index()
    train_loader, val_loader, test_loader = get_dataset(
        config, world_size, rank)

    model_cls = MODEL_REGISTRY[args.model_type]
    model = model_cls(config.get("model_config", {}))

    trainer_cls = TRAINER_REGISTRY[args.model_type]
    trainer = trainer_cls(model, train_loader, val_loader, test_loader,
                          config, mesh=mesh, seed=args.seed)

    start_epoch = 0
    if args.resume:
        name = None if args.resume == "latest" else args.resume
        start_epoch = trainer.load_checkpoint(name)
        if is_main_process():
            print(f"Resumed from epoch {start_epoch}")

    if args.profile and not args.eval_only:
        path = trainer.profile(
            steps=args.profile_steps,
            log_dir=None if args.profile == "__default__" else args.profile)
        if is_main_process():
            print(f"Profiler trace written to {path}")

    try:
        if args.eval_only:
            test_loss = trainer.test()
            if is_main_process():
                print(f"Test loss: {test_loss:.6f}")
        else:
            num_epochs = config.get("training", {}).get("num_epochs", 1)
            trainer.train(num_epochs - start_epoch)
            if trainer.preempted:
                # SIGTERM received: the resumable checkpoint is saved;
                # exit with the conventional 128+SIGTERM code instead of
                # running final test/benchmark on a half-trained model.
                if is_main_process():
                    print("Preempted: checkpoint saved, exiting")
                return 143
            test_loss = trainer.test()
            if is_main_process():
                print(f"Final test loss: {test_loss:.6f}")
            trainer.save_checkpoint("final_model",
                                    num_epochs - 1)

        if args.benchmark and is_main_process():
            from ..utils.benchmarks import DiffusionBenchmark
            bench_cfg = config.get("benchmark", {}) or {}
            # Sample-count defaults mirror the reference: 50k for
            # --eval_only, 2k post-train (`scripts/train.py:138,172`);
            # batch defaults to the training batch. use_inception=True
            # requests the real InceptionV3 (weights via
            # DMU_INCEPTION_WEIGHTS; falls back to the seeded random
            # extractor with a warning otherwise).
            default_n = 50000 if args.eval_only else 2000
            bench = DiffusionBenchmark(
                n_samples=bench_cfg.get("n_samples", default_n),
                batch_size=bench_cfg.get(
                    "batch_size",
                    config.get("training", {}).get("batch_size", 128)),
                use_inception=bench_cfg.get("use_inception", True),
                metrics=bench_cfg.get("metrics"), mesh=mesh,
                # "unpaired" = reference-compat SSIM/PSNR vs arbitrary
                # real batches; "reconstruction" = meaningful denoising
                # pairing (see DiffusionBenchmark docstring).
                pairing=bench_cfg.get("pairing", "unpaired"),
                # benchmark.sampler: "default" | "dpm++" (+sampler_steps)
                # — fast-ODE-sampler fidelity through the same harness.
                sampler=bench_cfg.get("sampler", "default"),
                sampler_steps=bench_cfg.get("sampler_steps"))
            out_dir = Path(config.get("output", {}).get(
                "output_dir", "outputs"))
            out_dir.mkdir(parents=True, exist_ok=True)
            sample_dir = None
            if bench_cfg.get("save_samples", False):
                sample_dir = str(out_dir / bench_cfg.get(
                    "sample_dir", "benchmark_samples"))
            # EMA weights by default — the deployment surface (what
            # `generate.py --ema` and the demo grids sample from; the
            # training-time epoch grids default to raw params);
            # benchmark.use_ema: false reverts to raw params (the
            # reference evaluates its raw model, `scripts/train.py:134-156`).
            eval_params = (trainer.state.ema_params
                           if bench_cfg.get("use_ema", True)
                           else trainer.state.params)
            results = bench.evaluate(model, eval_params,
                                     test_loader, sample_dir=sample_dir)
            with open(out_dir / bench_cfg.get(
                    "results_file", "benchmark_results.json"), "w") as f:
                json.dump(results, f, indent=2)
            print("Benchmark:", json.dumps(results, indent=2))
    finally:
        trainer.cleanup()
    return 0


if __name__ == "__main__":
    sys.exit(main())
