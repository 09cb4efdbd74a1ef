"""diffusion_model_universal_tpu — a TPU-native diffusion model framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
framework `ChristianLin0420/diffusion-model-universal`:

* Four diffusion model families — DDPM, DDIM, score-based (NCSN-style), and
  energy-based — sharing a pure-functional UNet backbone.
* Samplers expressed as `jax.lax.scan` loops that run entirely on-device
  (the reference runs T=1000 sequential Python-level UNet calls,
  reference `models/ddpm.py:251-253`).
* A jit-compiled trainer with Optax optimizers/schedules, EMA, Orbax
  checkpointing and W&B/TensorBoard logging (reference
  `trainers/ddpm_trainer.py:34-944`).
* Data parallelism via `jax.sharding.Mesh` + NamedSharding instead of
  DDP/NCCL (reference `scripts/train.py:48-67`).
* Pallas TPU kernels for the hot ops (fused GroupNorm+SiLU, fused attention).

Layout:
    models/    model families + flax layers (NHWC, bf16-friendly)
    ops/       Pallas TPU kernels with XLA fallbacks
    parallel/  mesh construction + sharding rules
    trainers/  training loop, EMA, checkpointing, logging
    datasets/  MNIST / CIFAR-10 / CelebA / synthetic pipelines
    utils/     losses, config I/O, benchmark metrics
    configs/   YAML surface mirroring the reference's configs/
    scripts/   train.py / generate.py CLI
"""

__version__ = "0.1.0"
