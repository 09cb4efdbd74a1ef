"""Spatial self-attention block.

TPU-native re-design of the reference's SelfAttentionBlock
(`models/layers/attention.py:10-69`): flatten H×W to tokens, Linear Q/K/V,
multi-head scaled-dot-product attention, output Linear, then a POST-residual
GroupNorm (the reference normalizes after the residual add,
`attention.py:68` — unusual but part of its function signature).

The attention math runs through :mod:`ops.attention` so the Pallas fused
kernel and the XLA fallback share one numerics contract.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...ops import attention as attn_ops
from ...ops.group_norm import group_norm_silu, resolve_num_groups

Array = jnp.ndarray


class SelfAttentionBlock(nn.Module):
    """Multi-head spatial self-attention with post-residual GroupNorm.

    Attributes:
        embedding_dim: attention width (equals channel count in the UNet).
        num_heads: attention heads (reference uses 4).
        num_groups: GroupNorm groups for the post-norm (reference: 32).
    """

    embedding_dim: int
    num_heads: int = 4
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        s = h * w
        d_keys = self.embedding_dim // self.num_heads

        tokens = x.reshape(b, s, c)
        dense = lambda name: nn.Dense(self.embedding_dim, dtype=self.dtype,
                                      name=name)
        q = dense("query")(tokens)
        k = dense("key")(tokens)
        v = dense("value")(tokens)

        # [B, S, E] -> [B, N, S, D]
        split = lambda z: z.reshape(b, s, self.num_heads, d_keys).transpose(
            0, 2, 1, 3)
        out = attn_ops.multi_head_attention(
            split(q), split(k), split(v), use_pallas=self.use_pallas)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, self.embedding_dim)
        out = dense("proj")(out)
        out = out.reshape(b, h, w, self.embedding_dim)

        # Post-residual GroupNorm (no activation), as in the reference.
        scale = self.param("norm_scale", nn.initializers.ones,
                           (self.embedding_dim,))
        bias = self.param("norm_bias", nn.initializers.zeros,
                          (self.embedding_dim,))
        groups = resolve_num_groups(self.embedding_dim, self.num_groups)
        return group_norm_silu(out + x, scale, bias, groups,
                               apply_silu=False, use_pallas=self.use_pallas)
