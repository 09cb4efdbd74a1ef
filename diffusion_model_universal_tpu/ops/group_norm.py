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

    Layout-preserving formulation: the naive
    ``reshape(B, HW, G, C/G) → mean/var`` splits the channel (lane)
    dimension, which on TPU materializes full-activation f32 transposes
    (profiled at ~30% of the round-1 train step). Instead:

    1. per-CHANNEL spatial sums Σx, Σx² as one f32-accumulated reduction
       over (H, W) — channel dim stays on the lanes, single pass over x;
    2. group stats by reducing the tiny [B, C] sums to [B, G];
    3. one fused elementwise pass ``silu(x·a + b)`` in the input dtype,
       with the normalization folded into per-channel a, b.

    ``time_bias`` ([B, C], the ResidualBlock's time-embedding channel
    bias) folds into the SAME pass for free: its contribution to the
    group statistics is computed from Σx (no extra pass over x), and the
    elementwise add folds into ``b``.

    Args:
        x: [B, H, W, C] activations (any float dtype; stats in fp32).
        scale, bias: [C] affine parameters.
        num_groups: must divide C (use :func:`resolve_num_groups`).
        time_bias: optional [B, C] per-sample channel bias added to ``x``
            before normalizing.
    """
    b, h, w, c = x.shape
    g = num_groups
    cg = c // g
    n = float(h * w * cg)
    xf32 = x.astype(jnp.float32)
    colsum = jnp.sum(xf32, axis=(1, 2))                    # [B, C]
    colsumsq = jnp.sum(jnp.square(xf32), axis=(1, 2))      # [B, C]
    if time_bias is not None:
        tb = time_bias.astype(jnp.float32)                 # [B, C]
        hw = float(h * w)
        colsumsq = colsumsq + 2.0 * tb * colsum + hw * tb * tb
        colsum = colsum + hw * tb
    gsum = jnp.sum(colsum.reshape(b, g, cg), axis=-1)      # [B, G]
    gsumsq = jnp.sum(colsumsq.reshape(b, g, cg), axis=-1)
    mean = gsum / n
    var = jnp.maximum(gsumsq / n - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    # Broadcast per-group scalars back to channels ([B, C] — tiny).
    mean_c = jnp.repeat(mean, cg, axis=-1)
    rstd_c = jnp.repeat(rstd, cg, axis=-1)
    a = rstd_c * scale.astype(jnp.float32)                 # [B, C]
    b_ = bias.astype(jnp.float32) - mean_c * a
    if time_bias is not None:
        b_ = b_ + time_bias.astype(jnp.float32) * a
    out = xf32 * a[:, None, None, :] + b_[:, None, None, :]
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(x.dtype)


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, out_ref, *, num_groups: int,
                    group_size: int, eps: float, apply_silu: bool):
    """Pallas kernel body: one batch element per grid step.

    Block is [1, H*W, C] in VMEM. Mosaic cannot shape-cast the lane (C)
    dimension into [G, C/G], so group statistics are computed with one-hot
    group matmuls instead: channel sums [1, C] × membership [C, G] → group
    sums [1, G], broadcast back per channel via [1, G] × [G, C]. Everything
    stays in fp32 VMEM; one read + one write of the activation.
    """
    x = x_ref[0].astype(jnp.float32)              # [S, C]
    s, c = x.shape
    # Group membership matrices built from 2-D iotas (TPU needs ≥2-D iota).
    ch_of = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    grp_of = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    m_cg = (ch_of // group_size == grp_of).astype(jnp.float32)   # [C, G]
    grp_of2 = jax.lax.broadcasted_iota(jnp.int32, (num_groups, c), 0)
    ch_of2 = jax.lax.broadcasted_iota(jnp.int32, (num_groups, c), 1)
    m_gc = (ch_of2 // group_size == grp_of2).astype(jnp.float32)  # [G, C]

    n = float(s * group_size)
    colsum = jnp.sum(x, axis=0, keepdims=True)        # [1, C]
    colsumsq = jnp.sum(x * x, axis=0, keepdims=True)  # [1, C]
    hp = jax.lax.Precision.HIGHEST  # stats need full f32 MXU passes
    gsum = jnp.dot(colsum, m_cg, precision=hp,
                   preferred_element_type=jnp.float32)
    gsumsq = jnp.dot(colsumsq, m_cg, precision=hp,
                     preferred_element_type=jnp.float32)
    gmean = gsum / n                                   # [1, G]
    gvar = gsumsq / n - gmean * gmean
    mean_c = jnp.dot(gmean, m_gc, precision=hp,
                     preferred_element_type=jnp.float32)
    rstd_c = jax.lax.rsqrt(
        jnp.dot(gvar, m_gc, precision=hp,
                preferred_element_type=jnp.float32) + eps)

    out = (x - mean_c) * rstd_c
    out = out * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(
        jnp.float32)
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps",
                                              "apply_silu", "interpret"))
def group_norm_silu_pallas(x: Array, scale: Array, bias: Array,
                           num_groups: int, eps: float = 1e-5,
                           apply_silu: bool = True,
                           interpret: bool = False) -> Array:
    """Pallas TPU fused GroupNorm(+SiLU), NHWC, one batch row per grid step.

    ``interpret=True`` runs the kernel body through the Pallas
    interpreter — how CI exercises the kernel numerics on CPU against
    :func:`group_norm_silu_xla` (SURVEY §7 item 12).
    """
    b, h, w, c = x.shape
    s = h * w
    x2 = x.reshape(b, s, c)
    scale2 = scale.reshape(1, c)
    bias2 = bias.reshape(1, c)
    out = pl.pallas_call(
        functools.partial(_gn_silu_kernel, num_groups=num_groups,
                          group_size=c // num_groups, eps=eps,
                          apply_silu=apply_silu),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(x2, scale2, bias2)
    return out.reshape(b, h, w, c)


@functools.lru_cache(maxsize=None)
def _fused_gn_with_vjp(num_groups: int, eps: float, apply_silu: bool):
    """custom_vjp wrapper: Pallas kernel forward, XLA-derived backward.

    The backward rematerializes through the XLA reference implementation —
    numerically identical, and XLA fuses the GN backward chain well; the
    fused-kernel win is on the (sampling-dominated) forward path.
    """

    def xla_ref(x, scale, bias):
        return group_norm_silu_xla(x, scale, bias, num_groups, None, eps,
                                   apply_silu)

    @jax.custom_vjp
    def f(x, scale, bias):
        return group_norm_silu_pallas(x, scale, bias, num_groups, eps,
                                      apply_silu)

    def fwd(x, scale, bias):
        return f(x, scale, bias), (x, scale, bias)

    def bwd(res, g):
        x, scale, bias = res
        _, vjp = jax.vjp(xla_ref, x, scale, bias)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def group_norm_silu(x: Array, scale: Array, bias: Array, num_groups: int,
                    time_bias: Optional[Array] = None, eps: float = 1e-5,
                    apply_silu: bool = True, use_pallas: bool = False) -> Array:
    """Dispatch between the Pallas kernel and the XLA fallback."""
    if use_pallas and time_bias is None and _pallas_supported():
        return _fused_gn_with_vjp(num_groups, eps, apply_silu)(x, scale, bias)
    return group_norm_silu_xla(x, scale, bias, num_groups, time_bias, eps,
                               apply_silu)


@functools.lru_cache(maxsize=1)
def _pallas_supported() -> bool:
    try:
        return jax.default_backend() in ("tpu",)
    except Exception:
        return False
