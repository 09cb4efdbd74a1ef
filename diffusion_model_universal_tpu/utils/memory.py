"""Device-memory preflight for the scan samplers.

Why this exists (round-4 sampler batch sweep, BENCH_NOTES): a
`generate.py --num_samples 1024` request at 64×64 compiles the WHOLE
1000-step ancestral chain as one `lax.scan` program whose working set
scales linearly with batch; at B=1024 that program crashed the TPU
worker outright ("kernel fault") instead of raising a Python OOM. The
reference never hits this because its sampler is a host loop over
single UNet calls (`/root/reference/models/ddpm.py:251-253`) — slower,
but incrementally allocated. A TPU-native scan sampler therefore needs
an explicit preflight: estimate the program's HBM residency, split the
batch into equal chunks that fit a budget, and refuse with a clear
message when even one sample per device cannot fit.

The estimate is deliberately simple and conservative — a calibrated
multiple of the full-resolution feature map (see
:func:`estimate_sampler_bytes`) — and is pinned by CPU tests; the
TPU-measured anchor points are B=256 @ 64² runs fine (~2.4 GB
estimated) and B=1024 crashes a 16 GiB chip (~9.5 GB estimated plus
XLA's own program/fragmentation overhead, which the default 50% budget
fraction absorbs).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

# Peak live activations inside one UNet forward, expressed as a multiple
# of the full-resolution base-width feature map (B·S²·C·dtype). The
# down-path skips alone hold ≈1.9× (S²C + (S/2)²C + (S/4)²2C + ... with
# concat copies); in-flight conv operands/results and the attention maps
# add the rest. 8× reproduces the observed crash boundary with the
# default budget fraction.
_ACT_MULTIPLE = 8.0

# Fraction of the device's memory the sampler program may plan to use.
# The remainder covers XLA's executable, fragmentation, and the
# estimate's own error bars.
_BUDGET_FRACTION = 0.5

_DEFAULT_HBM = 16 * 1024**3  # v5e


class SamplerMemoryError(RuntimeError):
    """A sampler request cannot fit device memory at any chunk size."""


def device_memory_budget(fraction: float = _BUDGET_FRACTION) -> Optional[int]:
    """Usable bytes per device for a sampler program, or None = no limit.

    Resolution order: ``DMU_SAMPLER_HBM_BYTES`` (explicit override, also
    how tests pin the planner), the device's ``memory_stats()``
    bytes_limit, a 16 GiB default for TPU backends. CPU/virtual meshes
    return None — host RAM is not the resource this guards.
    """
    env = os.environ.get("DMU_SAMPLER_HBM_BYTES")
    if env:
        return int(float(env) * fraction)
    import jax
    if jax.default_backend() != "tpu":
        return None
    dev = jax.local_devices()[0]
    limit = 0
    try:
        stats = dev.memory_stats() or {}
        limit = int(stats.get("bytes_limit", 0))
    except Exception:
        pass
    return int((limit or _DEFAULT_HBM) * fraction)


def estimate_sampler_bytes(batch: int, image_size: int, model_channels: int,
                           in_channels: int = 3, dtype_bytes: int = 2,
                           params_bytes: int = 0) -> int:
    """Estimated HBM residency of a scan-sampler program at ``batch``.

    activations: ``batch · S² · C · dtype_bytes · 8`` (see module
    docstring); scan carry + per-step temporaries: four f32 image-shaped
    tensors (x, ε̂, posterior mean, noise); plus the parameters once.
    Scan LENGTH does not appear — the carry is constant-shape.
    """
    act = batch * image_size * image_size * model_channels * dtype_bytes
    act = int(act * _ACT_MULTIPLE)
    carry = batch * image_size * image_size * in_channels * 4 * 4
    return params_bytes + act + carry


def plan_sampler_chunks(num_samples: int, image_size: int,
                        model_channels: int, in_channels: int = 3,
                        dtype_bytes: int = 2, params_bytes: int = 0,
                        n_devices: int = 1,
                        budget_bytes: Optional[int] = None,
                        ) -> Tuple[int, int]:
    """Split ``num_samples`` into equal chunks that fit the budget.

    Returns ``(chunk_size, n_chunks)`` with
    ``chunk_size * n_chunks >= num_samples`` (the last chunk may be
    padded by the caller). With no budget (CPU, or stats unavailable)
    the plan is one chunk. Raises :class:`SamplerMemoryError` when even
    ``n_devices`` samples (one per device) exceed the budget.
    """
    if budget_bytes is None:
        budget_bytes = device_memory_budget()
    if budget_bytes is None or num_samples <= 0:
        return num_samples, 1

    def fits(b: int) -> bool:
        per_dev = -(-b // max(1, n_devices))  # ceil
        return estimate_sampler_bytes(
            per_dev, image_size, model_channels, in_channels, dtype_bytes,
            params_bytes) <= budget_bytes

    if fits(num_samples):
        return num_samples, 1
    if not fits(max(1, n_devices)):
        need = estimate_sampler_bytes(1, image_size, model_channels,
                                      in_channels, dtype_bytes, params_bytes)
        raise SamplerMemoryError(
            f"sampler batch of even 1 sample/device needs ~{need / 1e9:.2f} "
            f"GB of the ~{budget_bytes / 1e9:.2f} GB device budget "
            f"(image_size={image_size}, model_channels={model_channels}); "
            f"reduce image_size/model_channels or raise "
            f"DMU_SAMPLER_HBM_BYTES if the device is larger than detected")
    n_chunks = 2
    while True:
        chunk = -(-num_samples // n_chunks)
        # Keep chunks device-aligned so the DP sharding stays even.
        chunk = max(n_devices, -(-chunk // max(1, n_devices)) * n_devices)
        if fits(chunk):
            return chunk, -(-num_samples // chunk)
        n_chunks += 1
