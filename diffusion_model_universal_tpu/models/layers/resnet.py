"""Residual / up / down blocks for the diffusion UNet.

TPU-native re-design of the reference's block zoo
(`models/layers/residual.py:11-256`): time-conditioned pre-activation
ResidualBlocks, stride-2 conv down / transpose-conv up stages, and
attention-augmented variants. Differences from the reference are layout and
fusion, not semantics:

* NHWC layout (channels-last = TPU lane dimension) instead of NCHW.
* GroupNorm+SiLU chains go through :mod:`ops.group_norm` so the Pallas fused
  kernel can replace them on TPU.
* Zero-init of the second conv and of the time projection is preserved
  (`residual.py:49-53`) — blocks start as identities, which the reference
  relies on for stable early training.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ...ops.group_norm import group_norm_silu, resolve_num_groups
from .attention import SelfAttentionBlock

Array = jnp.ndarray

# Conv outputs are tagged with this name so a byte-targeted remat policy
# (`jax.checkpoint_policies.save_only_these_names(CONVOUT)`, wired as
# UNet.remat_policy="save_convout") can SAVE the expensive-to-recompute
# conv outputs while recomputing the cheap GN/SiLU elementwise chains in
# the backward — cutting stored-activation HBM traffic on the
# memory-bound train step (BENCH_NOTES round-3 byte audit). Outside a
# jax.checkpoint region the tag is an identity no-op.
CONVOUT = "convout"


class GroupNormSiLU(nn.Module):
    """Parameterized fused GroupNorm(+SiLU) (see `ops/group_norm.py`).

    ``time_bias`` ([B, C]) is folded into the normalization pass for free
    (stat adjustment from the channel sums + elementwise fold) — callers
    should pass it here rather than materializing ``x + bias`` first.

    ``skip``: normalize the VIRTUAL concatenation ``[x, skip]`` without
    materializing it, returning the two normalized halves. Exact when no
    group straddles the boundary (each half a multiple of the concat's
    group size — caller checks); GroupNorm statistics are per-group, so
    disjoint groups normalize independently. Parameters are declared at
    the concat width either way, keeping one checkpoint schema.
    """

    num_groups: int = 32
    apply_silu: bool = True
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: Array, time_bias: Optional[Array] = None,
                 skip: Optional[Array] = None):
        c = x.shape[-1] + (skip.shape[-1] if skip is not None else 0)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        groups = resolve_num_groups(c, self.num_groups)
        if skip is None:
            return group_norm_silu(x, scale, bias, groups,
                                   time_bias=time_bias,
                                   apply_silu=self.apply_silu,
                                   use_pallas=self.use_pallas)
        ch = x.shape[-1]
        gs = c // groups
        assert ch % gs == 0, (ch, gs)  # caller guarantees alignment
        tb_h = time_bias[:, :ch] if time_bias is not None else None
        tb_s = time_bias[:, ch:] if time_bias is not None else None
        yh = group_norm_silu(x, scale[:ch], bias[:ch], ch // gs,
                             time_bias=tb_h, apply_silu=self.apply_silu,
                             use_pallas=self.use_pallas)
        ys = group_norm_silu(skip, scale[ch:], bias[ch:],
                             (c - ch) // gs, time_bias=tb_s,
                             apply_silu=self.apply_silu,
                             use_pallas=self.use_pallas)
        return yh, ys


class SplitConv(nn.Module):
    """Conv over a virtual channel concatenation ``[x, skip]``.

    Declares ONE kernel at the concat width (identical param tree to the
    ``nn.Conv`` it replaces) but computes ``conv(x, k[..., :ch, :]) +
    conv(skip, k[..., ch:, :])`` — algebraically the same contraction,
    reassociated. The win is in the BACKWARD: the gradient of a
    materialized concat is a full-activation split (1.5 ms at the
    flagship's up4, trace round 3); with two convs the dgrads flow to
    h and skip directly. ``skip=None`` degrades to the plain conv.
    """

    features: int
    kernel_size: tuple = (3, 3)
    dtype: jnp.dtype = jnp.float32
    use_bias: bool = False
    kernel_init: object = None

    @nn.compact
    def __call__(self, x: Array, skip: Optional[Array] = None) -> Array:
        cin = x.shape[-1] + (skip.shape[-1] if skip is not None else 0)
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init or nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features))
        dn = ("NHWC", "HWIO", "NHWC")
        pad = ((kh // 2, (kh - 1) // 2), (kw // 2, (kw - 1) // 2))

        def conv(v, k):
            return jax.lax.conv_general_dilated(
                v.astype(self.dtype), k.astype(self.dtype), (1, 1), pad,
                dimension_numbers=dn)

        if skip is None:
            y = conv(x, kernel)
        else:
            ch = x.shape[-1]
            y = conv(x, kernel[:, :, :ch]) + conv(skip, kernel[:, :, ch:])
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(self.dtype)
        return checkpoint_name(y, CONVOUT)


class ResidualBlock(nn.Module):
    """Pre-activation residual block with additive time conditioning.

    Reference `models/layers/residual.py:11-68`: GN→SiLU→3×3conv, add
    Dense(t_emb) as a per-channel bias, GN→SiLU→3×3conv (zero-init), plus a
    1×1-conv shortcut when channels change. Optional dropout honors the
    ``dropout`` config key the reference declares but never wires up.
    """

    out_channels: int
    num_groups: int = 32
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    # True restores the reference's conv-bias parameterization — needed to
    # import trained reference checkpoints losslessly (their biases carry
    # information). Default False: the TPU-optimized bias-free form (see
    # the conv() comment below).
    conv_bias: bool = False

    @nn.compact
    def __call__(self, x: Array, t_emb: Array,
                 deterministic: bool = True,
                 skip: Optional[Array] = None) -> Array:
        # ``skip``: a second input treated as channel-concatenated AFTER x
        # (the UNet's skip connection) — consumed through norm1/conv1/
        # shortcut WITHOUT materializing the concat when no GN group
        # straddles the boundary (see SplitConv/GroupNormSiLU). Falls
        # back to a real concat when groups straddle.
        if skip is not None:
            ctot = x.shape[-1] + skip.shape[-1]
            gs = ctot // resolve_num_groups(ctot, self.num_groups)
            if x.shape[-1] % gs != 0:
                x = jnp.concatenate([x, skip], axis=-1)
                skip = None
        in_channels = x.shape[-1] + (skip.shape[-1] if skip is not None
                                     else 0)
        # use_bias=False: every conv here feeds (through at most a residual
        # add) into a GroupNorm. A pre-norm per-channel bias is NOT exactly
        # absorbed by GN's β (it shifts group statistics when it varies
        # within a group), so this is a deliberate architecture choice, not
        # a free identity: the standard norm-precedes-conv-bias convention
        # trades that small expressivity delta for ~10% of the train step
        # (each bias costs a full-activation reduce_sum in the backward).
        # Reference-weight porting is unaffected — the param trees already
        # differ (NHWC flax vs NCHW torch).
        conv = lambda name, init=None: SplitConv(
            self.out_channels, (3, 3), dtype=self.dtype,
            use_bias=self.conv_bias,
            kernel_init=init or nn.initializers.lecun_normal(), name=name)

        if skip is None:
            h = GroupNormSiLU(self.num_groups, use_pallas=self.use_pallas,
                              name="norm1")(x)
            h = conv("conv1")(h.astype(self.dtype))
        else:
            yh, ys = GroupNormSiLU(self.num_groups,
                                   use_pallas=self.use_pallas,
                                   name="norm1")(x, skip=skip)
            h = conv("conv1")(yh.astype(self.dtype),
                              ys.astype(self.dtype))

        # Time embedding: zero-init projection → starts as a no-op. The
        # [B, C] channel bias is folded INTO norm2's fused pass (stats
        # adjusted from channel sums) instead of materializing h + bias —
        # one fewer full read+write of the activation per block.
        t_bias = nn.Dense(self.out_channels, dtype=self.dtype,
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          name="time_proj")(t_emb)

        h = GroupNormSiLU(self.num_groups, use_pallas=self.use_pallas,
                          name="norm2")(h, time_bias=t_bias)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = conv("conv2", init=nn.initializers.zeros)(h.astype(self.dtype))

        if in_channels != self.out_channels:
            x = SplitConv(self.out_channels, (1, 1), dtype=self.dtype,
                          use_bias=self.conv_bias,
                          name="shortcut")(
                              x, skip)
        elif skip is not None:  # pragma: no cover - concat preserves C
            x = jnp.concatenate([x, skip], axis=-1)
        return h + x


class Downsample(nn.Module):
    """Stride-2 4×4 conv (reference `residual.py:91`)."""

    channels: int
    dtype: jnp.dtype = jnp.float32
    conv_bias: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return checkpoint_name(
            nn.Conv(self.channels, (4, 4), strides=(2, 2),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    use_bias=self.conv_bias,  # see ResidualBlock
                    name="conv")(x.astype(self.dtype)), CONVOUT)


class Upsample(nn.Module):
    """2× learnable upsample via 4×4 stride-2 transpose conv
    (reference `residual.py:121`)."""

    channels: int
    dtype: jnp.dtype = jnp.float32
    conv_bias: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # torch ConvTranspose2d(k=4, s=2, p=1) equivalence: flax "SAME"
        # with transpose_kernel=False and the kernel spatially FLIPPED
        # relative to torch's [in,out,kh,kw] (pinned to 1e-6 in
        # tests/test_golden_torch.py; scripts/convert_weights.py applies
        # the flip when importing reference checkpoints).
        return checkpoint_name(
            nn.ConvTranspose(self.channels, (4, 4), strides=(2, 2),
                             padding="SAME", dtype=self.dtype,
                             use_bias=self.conv_bias,
                             name="conv")(x.astype(self.dtype)), CONVOUT)


class ConvDownBlock(nn.Module):
    """``num_layers`` ResidualBlocks then stride-2 downsample
    (reference `residual.py:70-98`)."""

    out_channels: int
    num_layers: int = 2
    num_groups: int = 32
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    conv_bias: bool = False

    @nn.compact
    def __call__(self, x: Array, t_emb: Array,
                 deterministic: bool = True) -> Array:
        for i in range(self.num_layers):
            x = ResidualBlock(self.out_channels, self.num_groups,
                              self.dropout, self.dtype, self.use_pallas,
                              self.conv_bias,
                              name=f"res{i}")(x, t_emb, deterministic)
        return Downsample(self.out_channels, self.dtype, self.conv_bias,
                          name="down")(x)


class ConvUpBlock(nn.Module):
    """ResidualBlocks then transpose-conv upsample
    (reference `residual.py:100-128`)."""

    out_channels: int
    num_layers: int = 2
    num_groups: int = 32
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    conv_bias: bool = False

    @nn.compact
    def __call__(self, x: Array, t_emb: Array,
                 deterministic: bool = True,
                 skip: Optional[Array] = None) -> Array:
        for i in range(self.num_layers):
            x = ResidualBlock(self.out_channels, self.num_groups,
                              self.dropout, self.dtype, self.use_pallas,
                              self.conv_bias,
                              name=f"res{i}")(x, t_emb, deterministic,
                                              skip if i == 0 else None)
        return Upsample(self.out_channels, self.dtype, self.conv_bias,
                        name="up")(x)


class AttentionDownBlock(nn.Module):
    """(ResBlock→SelfAttention)×num_layers then optional downsample
    (reference `residual.py:130-192`)."""

    out_channels: int
    num_layers: int = 2
    num_groups: int = 32
    num_att_heads: int = 4
    downsample: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    conv_bias: bool = False

    @nn.compact
    def __call__(self, x: Array, t_emb: Array,
                 deterministic: bool = True) -> Array:
        for i in range(self.num_layers):
            x = ResidualBlock(self.out_channels, self.num_groups,
                              self.dropout, self.dtype, self.use_pallas,
                              self.conv_bias,
                              name=f"res{i}")(x, t_emb, deterministic)
            x = SelfAttentionBlock(self.out_channels, self.num_att_heads,
                                   self.num_groups, self.dtype,
                                   self.use_pallas, name=f"attn{i}")(x)
        if self.downsample:
            x = Downsample(self.out_channels, self.dtype, self.conv_bias,
                           name="down")(x)
        return x


class AttentionUpBlock(nn.Module):
    """(ResBlock→SelfAttention)×num_layers then optional upsample
    (reference `residual.py:194-256`)."""

    out_channels: int
    num_layers: int = 2
    num_groups: int = 32
    num_att_heads: int = 4
    upsample: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    conv_bias: bool = False

    @nn.compact
    def __call__(self, x: Array, t_emb: Array,
                 deterministic: bool = True,
                 skip: Optional[Array] = None) -> Array:
        for i in range(self.num_layers):
            x = ResidualBlock(self.out_channels, self.num_groups,
                              self.dropout, self.dtype, self.use_pallas,
                              self.conv_bias,
                              name=f"res{i}")(x, t_emb, deterministic,
                                              skip if i == 0 else None)
            x = SelfAttentionBlock(self.out_channels, self.num_att_heads,
                                   self.num_groups, self.dtype,
                                   self.use_pallas, name=f"attn{i}")(x)
        if self.upsample:
            x = Upsample(self.out_channels, self.dtype, self.conv_bias,
                         name="up")(x)
        return x
