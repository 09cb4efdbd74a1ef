"""Fused GroupNorm(+SiLU)(+time-bias) op.

This is the hot elementwise epilogue of every ResidualBlock in the UNet
(reference `models/layers/residual.py:55-68`: GN→SiLU→conv, add time bias,
GN→SiLU→conv). On TPU the win is keeping the normalize/scale/activate chain
in VMEM in one pass instead of multiple HBM round-trips.

Two implementations behind one API:

* :func:`group_norm_silu_xla` — reference implementation in plain jnp. XLA
  already fuses most of this chain; it is the fallback for CPU tests and the
  numerics oracle for the kernel.
* :func:`group_norm_silu_pallas` — Pallas TPU kernel (one grid step per
  batch row; statistics computed in fp32 in VMEM).

Layout is NHWC (TPU-native; channels last = lane dimension).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jnp.ndarray


def resolve_num_groups(num_channels: int, num_groups: int = 32) -> int:
    """Largest valid group count ≤ ``num_groups`` dividing ``num_channels``.

    Reproduces the reference's auto-shrink loop
    (`models/layers/residual.py:22-29`) exactly — channel-shape parity
    depends on it (SURVEY.md §7 'hard parts').
    """
    g = min(num_groups, num_channels)
    while num_channels % g != 0 and g > 1:
        g -= 1
    return g


def group_norm_silu_xla(x: Array, scale: Array, bias: Array, num_groups: int,
                        time_bias: Optional[Array] = None,
                        eps: float = 1e-5, apply_silu: bool = True) -> Array:
    """GroupNorm → (optional +time_bias) → (optional SiLU), NHWC.

    Args:
        x: [B, H, W, C] activations (any float dtype; stats in fp32).
        scale, bias: [C] affine parameters.
        num_groups: must divide C (use :func:`resolve_num_groups`).
        time_bias: optional [B, C] per-sample channel bias ADDED BEFORE the
            normalization? No — matching the reference ResidualBlock, the
            time bias is added to the conv OUTPUT, i.e. before the *next*
            norm; here it is provided so callers can fuse `h + t_bias` into
            the same kernel pass, applied to x before normalizing.
    """
    b, h, w, c = x.shape
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    if time_bias is not None:
        xf = xf + time_bias.astype(jnp.float32)[:, None, None, :]
    xg = xf.reshape(b, h * w, num_groups, c // num_groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 3), keepdims=True)
    normed = (xg - mean) * jax.lax.rsqrt(var + eps)
    normed = normed.reshape(b, h, w, c)
    out = normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(orig_dtype)


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, out_ref, *, num_groups: int,
                    eps: float, apply_silu: bool):
    """Pallas kernel body: one batch element per grid step.

    Block is [1, H*W, C] in VMEM. Group statistics are computed with a
    reshape to [H*W, G, C/G] — all VPU work, single pass over VMEM.
    """
    x = x_ref[0].astype(jnp.float32)              # [S, C]
    s, c = x.shape
    cg = c // num_groups
    xg = x.reshape(s, num_groups, cg)
    mean = jnp.mean(xg, axis=(0, 2), keepdims=True)
    centered = xg - mean
    var = jnp.mean(centered * centered, axis=(0, 2), keepdims=True)
    normed = (centered * jax.lax.rsqrt(var + eps)).reshape(s, c)
    out = normed * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "apply_silu"))
def group_norm_silu_pallas(x: Array, scale: Array, bias: Array,
                           num_groups: int, eps: float = 1e-5,
                           apply_silu: bool = True) -> Array:
    """Pallas TPU fused GroupNorm(+SiLU), NHWC, one batch row per grid step."""
    b, h, w, c = x.shape
    s = h * w
    x2 = x.reshape(b, s, c)
    out = pl.pallas_call(
        functools.partial(_gn_silu_kernel, num_groups=num_groups, eps=eps,
                          apply_silu=apply_silu),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
    )(x2, scale, bias)
    return out.reshape(b, h, w, c)


def group_norm_silu(x: Array, scale: Array, bias: Array, num_groups: int,
                    time_bias: Optional[Array] = None, eps: float = 1e-5,
                    apply_silu: bool = True, use_pallas: bool = False) -> Array:
    """Dispatch between the Pallas kernel and the XLA fallback."""
    if use_pallas and time_bias is None and _pallas_supported():
        return group_norm_silu_pallas(x, scale, bias, num_groups, eps,
                                      apply_silu)
    return group_norm_silu_xla(x, scale, bias, num_groups, time_bias, eps,
                               apply_silu)


@functools.lru_cache(maxsize=1)
def _pallas_supported() -> bool:
    try:
        return jax.default_backend() in ("tpu",)
    except Exception:
        return False
