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
       over (H, W) — channel dim stays on the lanes, single pass over x
       (XLA fuses the convert+reduce into the producing conv's epilogue);
    2. group stats by reducing the tiny [B, C] sums to [B, G];
    3. one fused elementwise pass ``silu(x·a + b)`` in the INPUT dtype,
       with the normalization folded into per-channel f32 a, b (cast to
       the input dtype at the tiny [B, C] stage). Keeping the apply in
       the input dtype matters for the BACKWARD: an f32 apply forces
       XLA to materialize f32 [B,H,W,C] cotangents (profiled at
       3×3.0 ms `convert_element_type` fusions per step at the flagship
       B=2048 — round-4 trace), while the output was cast to bf16 for
       the consuming conv anyway, so the extra f32 precision never
       survived the forward.

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
    # Apply in the INPUT dtype (a, b cast at the tiny [B, C] stage): for
    # bf16 activations this keeps the [B,H,W,C] elementwise pass AND its
    # backward cotangents in bf16 — the downstream conv consumed a bf16
    # cast of this output anyway, so only one rounding moves. f32 inputs
    # (CPU tests, golden oracles) are bit-identical to the f32 form.
    out = (x * a[:, None, None, :].astype(x.dtype)
           + b_[:, None, None, :].astype(x.dtype))
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas kernels (v2): batch-blocked fused GroupNorm(+time-bias)(+SiLU)
# with a fused custom backward.
#
# Layout strategy (same as the XLA path): the channel dim stays on the
# lanes; group statistics use one-hot membership matmuls ([C,G] / [G,C])
# because Mosaic cannot shape-cast the lane dimension into [G, C/G].
# Each grid step owns R batch rows with the full [S, C] plane in VMEM, so
# the forward is ONE read + ONE write of the activation (the XLA path is
# two reads + one write: a stats fusion then an apply fusion), and the
# backward reads (x, dy) once and writes dx once while accumulating
# dscale/dbias across grid steps in VMEM.
# ---------------------------------------------------------------------------


def _group_mats(c: int, g: int, group_size: int):
    """One-hot channel↔group membership matrices ([C,G], [G,C]), f32.

    Built from 2-D iotas (TPU needs ≥2-D iota)."""
    ch_of = jax.lax.broadcasted_iota(jnp.int32, (c, g), 0)
    grp_of = jax.lax.broadcasted_iota(jnp.int32, (c, g), 1)
    m_cg = (ch_of // group_size == grp_of).astype(jnp.float32)
    grp2 = jax.lax.broadcasted_iota(jnp.int32, (g, c), 0)
    ch2 = jax.lax.broadcasted_iota(jnp.int32, (g, c), 1)
    m_gc = (grp2 == ch2 // group_size).astype(jnp.float32)
    return m_cg, m_gc


def _block_stats(x, tb, m_cg, m_gc, group_size: int, eps: float):
    """Per-sample per-channel (mean_c, rstd_c) for x [R,S,C] + tb [R,C]."""
    r, s, c = x.shape
    n = float(s * group_size)
    hp = jax.lax.Precision.HIGHEST
    colsum = jnp.sum(x, axis=1)                      # [R, C]
    colsumsq = jnp.sum(x * x, axis=1)
    colsumsq = colsumsq + 2.0 * tb * colsum + float(s) * tb * tb
    colsum = colsum + float(s) * tb
    gsum = jnp.dot(colsum, m_cg, precision=hp,
                   preferred_element_type=jnp.float32)       # [R, G]
    gsumsq = jnp.dot(colsumsq, m_cg, precision=hp,
                     preferred_element_type=jnp.float32)
    mean = gsum / n
    var = jnp.maximum(gsumsq / n - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.dot(mean, m_gc, precision=hp,
                     preferred_element_type=jnp.float32)     # [R, C]
    rstd_c = jnp.dot(rstd, m_gc, precision=hp,
                     preferred_element_type=jnp.float32)
    return mean_c, rstd_c


def _gn_fwd_kernel(x_ref, tb_ref, scale_ref, bias_ref, out_ref, *,
                   num_groups: int, group_size: int, eps: float,
                   apply_silu: bool):
    x = x_ref[...].astype(jnp.float32)               # [R, S, C]
    tb = tb_ref[:, 0, :].astype(jnp.float32)         # [R, C]
    c = x.shape[-1]
    m_cg, m_gc = _group_mats(c, num_groups, group_size)
    mean_c, rstd_c = _block_stats(x, tb, m_cg, m_gc, group_size, eps)
    a = rstd_c * scale_ref[0].astype(jnp.float32)    # [R, C]
    b = (bias_ref[0].astype(jnp.float32)
         + (tb - mean_c) * a)                        # [R, C]
    out = x * a[:, None, :] + b[:, None, :]
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    out_ref[...] = out.astype(out_ref.dtype)


def _gn_bwd_kernel(x_ref, tb_ref, scale_ref, bias_ref, dy_ref,
                   dx_ref, dscale_ref, dbias_ref, dtb_ref, *,
                   num_groups: int, group_size: int, eps: float,
                   apply_silu: bool):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)               # [R, S, C]
    tb = tb_ref[:, 0, :].astype(jnp.float32)         # [R, C]
    dy = dy_ref[...].astype(jnp.float32)             # [R, S, C]
    r, s, c = x.shape
    hp = jax.lax.Precision.HIGHEST
    m_cg, m_gc = _group_mats(c, num_groups, group_size)
    mean_c, rstd_c = _block_stats(x, tb, m_cg, m_gc, group_size, eps)
    gamma = scale_ref[0].astype(jnp.float32)         # [C]
    xhat = (x + tb[:, None, :] - mean_c[:, None, :]) * rstd_c[:, None, :]

    if apply_silu:
        # out = silu(z), z = γ·x̂ + β  →  dz = dy · σ(z)(1 + z(1−σ(z)))
        z = xhat * gamma + bias_ref[0].astype(jnp.float32)
        sig = jax.nn.sigmoid(z)
        dz = dy * (sig * (1.0 + z * (1.0 - sig)))
    else:
        dz = dy

    # Affine-parameter grads, accumulated across grid steps in VMEM.
    dgamma_p = jnp.sum(dz * xhat, axis=(0, 1))[None, :]      # [1, C]
    dbeta_p = jnp.sum(dz, axis=(0, 1))[None, :]

    @pl.when(i == 0)
    def _init():
        dscale_ref[...] = dgamma_p
        dbias_ref[...] = dbeta_p

    @pl.when(i > 0)
    def _acc():
        dscale_ref[...] += dgamma_p
        dbias_ref[...] += dbeta_p

    # dx = r·(dx̂ − (Σ_g dx̂ + x̂·Σ_g dx̂·x̂)/N) with Σ over each group.
    n = float(s * group_size)
    dxhat = dz * gamma                                        # [R, S, C]
    s1_c = jnp.sum(dxhat, axis=1)                             # [R, C]
    s2_c = jnp.sum(dxhat * xhat, axis=1)
    s1 = jnp.dot(jnp.dot(s1_c, m_cg, precision=hp,
                         preferred_element_type=jnp.float32), m_gc,
                 precision=hp, preferred_element_type=jnp.float32)
    s2 = jnp.dot(jnp.dot(s2_c, m_cg, precision=hp,
                         preferred_element_type=jnp.float32), m_gc,
                 precision=hp, preferred_element_type=jnp.float32)
    dx = rstd_c[:, None, :] * (
        dxhat - (s1[:, None, :] + xhat * s2[:, None, :]) / n)
    dx_ref[...] = dx.astype(dx_ref.dtype)
    # tb enters as x + tb (broadcast over S) → dtb = Σ_s dx.
    dtb_ref[:, 0, :] = jnp.sum(dx, axis=1).astype(dtb_ref.dtype)


def _block_rows(b: int, s: int, c: int, bufs: int,
                budget_bytes: int = 6 * 1024 * 1024) -> int:
    """Largest power-of-2 divisor of ``b`` whose ``bufs`` f32 [R,S,C]
    buffers fit the VMEM budget."""
    per_row = s * c * 4 * bufs
    r = min(max(1, budget_bytes // max(per_row, 1)), b)
    while b % r != 0:  # descent ends at 1, which divides everything
        r -= 1
    return r


@functools.partial(jax.jit, static_argnames=("num_groups", "eps",
                                              "apply_silu", "interpret"))
def group_norm_silu_pallas(x: Array, scale: Array, bias: Array,
                           num_groups: int,
                           time_bias: Optional[Array] = None,
                           eps: float = 1e-5, apply_silu: bool = True,
                           interpret: bool = False) -> Array:
    """Pallas fused GroupNorm(+time-bias)(+SiLU), NHWC.

    One read + one write of the activation per call. ``interpret=True``
    runs the kernel body through the Pallas interpreter — how CI
    exercises the kernel numerics on CPU against
    :func:`group_norm_silu_xla` (SURVEY §7 item 12).
    """
    b, h, w, c = x.shape
    s = h * w
    x2 = x.reshape(b, s, c)
    tb = (jnp.zeros((b, 1, c), jnp.float32) if time_bias is None
          else time_bias.astype(jnp.float32).reshape(b, 1, c))
    # ~6 live f32 [R,S,C] planes incl. pipeline double-buffers.
    r = _block_rows(b, s, c, bufs=6)
    out = pl.pallas_call(
        functools.partial(_gn_fwd_kernel, num_groups=num_groups,
                          group_size=c // num_groups, eps=eps,
                          apply_silu=apply_silu),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        grid=(b // r,),
        in_specs=[
            pl.BlockSpec((r, s, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((r, 1, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((r, s, c), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(x2, tb, scale.reshape(1, c), bias.reshape(1, c))
    return out.reshape(b, h, w, c)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps",
                                              "apply_silu", "interpret"))
def group_norm_silu_pallas_bwd(x: Array, scale: Array, bias: Array,
                               time_bias: Array, dy: Array,
                               num_groups: int, eps: float = 1e-5,
                               apply_silu: bool = True,
                               interpret: bool = False):
    """Fused backward: (x, dy) read once → (dx, dscale, dbias, dtb)."""
    b, h, w, c = x.shape
    s = h * w
    x2 = x.reshape(b, s, c)
    dy2 = dy.reshape(b, s, c)
    tb = time_bias.astype(jnp.float32).reshape(b, 1, c)
    # The bwd kernel keeps ~14 live f32 [R,S,C] planes (x, dy,
    # xhat, z, dz, dxhat, dx + DMA double-buffers) — budget for
    # them or Mosaic overflows its 16M scoped-vmem stack.
    r = _block_rows(b, s, c, bufs=14)
    dx, dscale, dbias, dtb = pl.pallas_call(
        functools.partial(_gn_bwd_kernel, num_groups=num_groups,
                          group_size=c // num_groups, eps=eps,
                          apply_silu=apply_silu),
        out_shape=(
            jax.ShapeDtypeStruct((b, s, c), x.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ),
        grid=(b // r,),
        in_specs=[
            pl.BlockSpec((r, s, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((r, 1, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((r, s, c), lambda i: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((r, s, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((r, 1, c), lambda i: (i, 0, 0)),
        ),
        interpret=interpret,
    )(x2, tb, scale.reshape(1, c), bias.reshape(1, c), dy2)
    return (dx.reshape(b, h, w, c), dscale.reshape(c), dbias.reshape(c),
            dtb.reshape(b, c))


@functools.lru_cache(maxsize=None)
def _fused_gn_with_vjp(num_groups: int, eps: float, apply_silu: bool,
                       interpret: bool = False):
    """custom_vjp pairing the fused forward and backward kernels."""

    @jax.custom_vjp
    def f(x, scale, bias, time_bias):
        return group_norm_silu_pallas(x, scale, bias, num_groups,
                                      time_bias, eps, apply_silu,
                                      interpret=interpret)

    def fwd(x, scale, bias, time_bias):
        return f(x, scale, bias, time_bias), (x, scale, bias, time_bias)

    def bwd(res, dy):
        x, scale, bias, time_bias = res
        dx, dscale, dbias, dtb = group_norm_silu_pallas_bwd(
            x, scale, bias, time_bias, dy, num_groups, eps, apply_silu,
            interpret=interpret)
        return dx, dscale.astype(scale.dtype), dbias.astype(bias.dtype), \
            dtb.astype(time_bias.dtype)

    f.defvjp(fwd, bwd)
    return f


def group_norm_silu_fused(x: Array, scale: Array, bias: Array,
                          num_groups: int,
                          time_bias: Optional[Array] = None,
                          eps: float = 1e-5, apply_silu: bool = True,
                          interpret: bool = False) -> Array:
    """Differentiable fused-kernel GN (+time-bias)(+SiLU)."""
    b, c = x.shape[0], x.shape[-1]
    tb = (jnp.zeros((b, c), jnp.float32) if time_bias is None
          else time_bias)
    return _fused_gn_with_vjp(num_groups, eps, apply_silu,
                              interpret)(x, scale, bias, tb)


def group_norm_silu(x: Array, scale: Array, bias: Array, num_groups: int,
                    time_bias: Optional[Array] = None, eps: float = 1e-5,
                    apply_silu: bool = True, use_pallas: bool = False) -> Array:
    """Dispatch between the Pallas kernel and the XLA fallback."""
    if use_pallas and _pallas_supported():
        return group_norm_silu_fused(x, scale, bias, num_groups, time_bias,
                                     eps, apply_silu)
    return group_norm_silu_xla(x, scale, bias, num_groups, time_bias, eps,
                               apply_silu)


@functools.lru_cache(maxsize=1)
def _pallas_supported() -> bool:
    try:
        return jax.default_backend() in ("tpu",)
    except Exception:
        return False
