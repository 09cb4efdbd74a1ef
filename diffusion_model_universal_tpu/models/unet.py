"""The shared UNet noise-prediction backbone.

TPU-native re-design of the reference UNet (`models/ddpm.py:32-135`): a
5-stage down / bottleneck / 5-stage up architecture with skip concatenation,
additive time-embedding injection in every ResidualBlock, self-attention at
the 4th down stage, the bottleneck, and the 2nd up stage, and a
GroupNorm→SiLU→3×3-conv output head.

Channel plan for base width C (reference `ddpm.py:56-84`):
    down:   C → C → 2C → 2C(attn) → 4C        (each stage halves H,W)
    mid:    Res(4C) → Attn(4C) → Res(4C)
    up:     cat-skip then 4C → 2C(attn) → 2C → C → C (each stage doubles H,W)

Differences from the reference are TPU idiom, not architecture:
* NHWC layout; convs lower to MXU-tiled XLA convolutions.
* bf16 compute / fp32 params via the ``dtype`` attribute.
* Optional `nn.remat` on the down/up stages (`jax.checkpoint`) to trade
  FLOPs for HBM during training.
* ``continuous_sigma=True`` swaps the integer-timestep embedding for a
  log-σ MLP, which is the intended ScoreNet design
  (reference `models/score_based.py:56-61`, fixing defect D3).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import (AttentionDownBlock, AttentionUpBlock, ConvDownBlock,
                     ConvUpBlock, GroupNormSiLU, ResidualBlock,
                     SelfAttentionBlock, SigmaEmbedding, TimeEmbedding)
from .layers.resnet import CONVOUT

Array = jnp.ndarray


def resolve_remat_policy(name: Optional[str]):
    """Map the YAML ``remat_policy`` string to a jax.checkpoint policy.

    * ``None`` / ``"full"`` — recompute everything inside each rematted
      stage (jax.checkpoint's default; the pre-round-4 ``remat: true``
      behavior).
    * ``"save_convout"`` — save conv outputs (tagged
      :data:`~..layers.resnet.CONVOUT`), recompute the cheap GN/SiLU
      elementwise chains in the backward. Measured at the flagship
      B=2048 shape this is NOT a throughput win (XLA's default
      materialization demands fewer bytes — BENCH_NOTES round 4); it
      remains the memory-saving middle ground between no remat and full
      stage recompute for memory-limited (high-res) configs.
    """
    if name is None or name == "full":
        return None
    if name == "save_convout":
        return jax.checkpoint_policies.save_only_these_names(CONVOUT)
    raise ValueError(
        f"model_config.remat_policy must be 'full' or 'save_convout', "
        f"got {name!r}")


def _shard_activation(h: Array) -> Array:
    """Logical sharding annotation at a stage boundary.

    Resolves under ``parallel.mesh.activation_sharding_scope`` to
    batch→"data" (DP), height→"spatial" (SP halo convs), channels→"model"
    (TP); with no scope active it is a no-op, so single-chip programs are
    unchanged. Height is left unsharded below 8 rows — at 4²/2²/1² feature
    maps a spatial shard is all halo and no work.
    """
    names = ("batch", "height" if h.shape[1] >= 8 else None, None, "embed")
    return nn.with_logical_constraint(h, names)


class UNet(nn.Module):
    """Noise/score-prediction UNet.

    Attributes:
        in_channels: image channels (3 for RGB).
        model_channels: base width C.
        out_channels: output channels (== in_channels for ε-prediction).
        num_heads: attention heads (reference: 4).
        dropout: ResidualBlock dropout rate (reference declares but never
            wires `dropout` — here it is functional).
        continuous_sigma: use log-σ conditioning instead of integer t.
        remat: checkpoint down/up stages to cut activation memory.
        remat_policy: what the checkpointed stages SAVE — None/"full"
            (recompute everything) or "save_convout" (keep conv outputs,
            recompute GN/SiLU); implies ``remat`` when set.
    """

    in_channels: int = 3
    model_channels: int = 64
    out_channels: int = 3
    num_heads: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    continuous_sigma: bool = False
    remat: bool = False
    remat_policy: Optional[str] = None
    # Class-conditional generation (capability superset — the reference
    # is unconditional): index `num_classes` is the NULL token used for
    # classifier-free-guidance training/sampling.
    num_classes: int = 0
    # True restores the reference's conv-bias parameterization so trained
    # reference checkpoints import losslessly (scripts/convert_weights.py
    # sets it); default False is the TPU-optimized bias-free form.
    conv_bias: bool = False
    # Consume up-path skip connections through split GN/convs instead of
    # materializing the channel concat (identical math + param tree, bf16
    # rounding-level numerics difference; see the up-loop comment).
    split_skip_convs: bool = True

    @nn.compact
    def __call__(self, x: Array, t: Array, y: Array = None,
                 deterministic: bool = True) -> Array:
        if x.shape[1] < 32 or x.shape[2] < 32:
            raise ValueError(
                f"UNet needs spatial dims ≥ 32 (got {x.shape[1:3]}): the "
                "5-stage downsampling path reaches zero size below that "
                "(the reference UNet has the same constraint, "
                "models/ddpm.py:56-65). Resize inputs to ≥ 32.")
        c = self.model_channels
        common = dict(dropout=self.dropout, dtype=self.dtype,
                      use_pallas=self.use_pallas, conv_bias=self.conv_bias)

        if self.continuous_sigma:
            t_emb = SigmaEmbedding(c, c * 4, self.dtype, name="time_embedding")(t)
        else:
            t_emb = TimeEmbedding(c, c * 4, self.dtype, name="time_embedding")(t)
        if self.num_classes > 0:
            # Additive label embedding on the time-embedding pathway
            # (zero-init → starts unconditional); +1 slot = NULL token.
            if y is None:
                y = jnp.full(x.shape[:1], self.num_classes, jnp.int32)
            t_emb = t_emb + nn.Embed(
                self.num_classes + 1, c * 4, dtype=self.dtype,
                embedding_init=nn.initializers.zeros,
                name="label_embedding")(y).astype(t_emb.dtype)

        h = nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=nn.initializers.he_normal(),
                    use_bias=self.conv_bias,  # default: down0's GN follows
                    name="initial_conv")(x.astype(self.dtype))

        DownB = ConvDownBlock
        AttnDownB = AttentionDownBlock
        UpB = ConvUpBlock
        AttnUpB = AttentionUpBlock
        if self.remat or self.remat_policy is not None:
            # Static argnums: (self, x, t_emb, deterministic) → index 3.
            kw = dict(static_argnums=(3,))
            policy = resolve_remat_policy(self.remat_policy)
            if policy is not None:
                kw["policy"] = policy
            DownB = nn.remat(ConvDownBlock, **kw)
            AttnDownB = nn.remat(AttentionDownBlock, **kw)
            UpB = nn.remat(ConvUpBlock, **kw)
            AttnUpB = nn.remat(AttentionUpBlock, **kw)

        downs = [
            DownB(c, name="down0", **common),
            DownB(c, name="down1", **common),
            DownB(c * 2, name="down2", **common),
            AttnDownB(c * 2, num_att_heads=self.num_heads, name="down3",
                      **common),
            DownB(c * 4, name="down4", **common),
        ]
        skips = []
        h = _shard_activation(h)
        for block in downs:
            h = _shard_activation(block(h, t_emb, deterministic))
            skips.append(h)

        h = ResidualBlock(c * 4, name="mid_res1", **common)(
            h, t_emb, deterministic)
        h = SelfAttentionBlock(c * 4, self.num_heads, dtype=self.dtype,
                               use_pallas=self.use_pallas,
                               name="mid_attn")(h)
        h = _shard_activation(ResidualBlock(c * 4, name="mid_res2", **common)(
            h, t_emb, deterministic))

        ups = [
            UpB(c * 4, name="up0", **common),
            AttnUpB(c * 2, num_att_heads=self.num_heads, name="up1",
                    **common),
            UpB(c * 2, name="up2", **common),
            UpB(c, name="up3", **common),
            UpB(c, name="up4", **common),
        ]
        for block, skip in zip(ups, reversed(skips)):
            if self.split_skip_convs:
                # Virtual concat: the first ResidualBlock consumes the
                # skip through split GN/conv (same math, same param
                # tree; 1.3 ms/step cheaper backward at the flagship's
                # 16² stage — no concat materialization, no
                # full-activation gradient split). Falls back to a real
                # concat inside the block when GN groups would straddle
                # the boundary.
                h = _shard_activation(block(h, t_emb, deterministic,
                                            skip))
            else:
                h = jnp.concatenate([h, skip], axis=-1)
                h = _shard_activation(block(h, t_emb, deterministic))

        h = GroupNormSiLU(32, use_pallas=self.use_pallas, name="out_norm")(h)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME",
                       dtype=self.dtype, name="output_conv")(
                           h.astype(self.dtype)).astype(jnp.float32)
