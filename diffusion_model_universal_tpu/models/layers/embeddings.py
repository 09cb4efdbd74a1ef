"""Timestep embeddings.

TPU-native equivalents of the reference's embedding layers
(`models/layers/embeddings.py:11-75`): a sinusoidal positional encoding of
the (integer or continuous) timestep followed by a 2-layer MLP.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray


def sinusoidal_embedding(t: Array, dim: int) -> Array:
    """Transformer sinusoidal timestep encoding.

    Reference `models/layers/embeddings.py:24-39`: frequencies
    exp(arange(half)·(−ln 10000/(half−1))), concat(sin, cos). Returns fp32
    [B, dim] for a [B] input.
    """
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1)))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class TimeEmbedding(nn.Module):
    """Sinusoid → Dense → GELU → Dense (reference `embeddings.py:41-75`).

    Xavier-uniform weight init and zero bias as in the reference; runs in
    ``dtype`` (bf16 on TPU) with fp32 params.

    Attributes:
        base_dim: sinusoid dimension (UNet model_channels).
        output_dim: MLP width (4×model_channels in the UNet).
    """

    base_dim: int
    output_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: Array) -> Array:
        emb = sinusoidal_embedding(t, self.base_dim).astype(self.dtype)
        dense = lambda name: nn.Dense(
            self.output_dim, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros, name=name)
        emb = dense("dense1")(emb)
        # Exact (erf) GELU: torch's nn.GELU default, which the reference
        # uses (`embeddings.py:63`). flax defaults to the tanh
        # approximation — a ~1e-3 difference that would dominate the
        # full-UNet golden-parity budget; the tensor is a tiny [B, 4C],
        # so exactness is free.
        emb = nn.gelu(emb, approximate=False)
        return dense("dense2")(emb)


class SigmaEmbedding(nn.Module):
    """Continuous noise-level embedding for the score network.

    The intended design of the reference's ScoreNet time embedding
    (`models/score_based.py:56-61`, fixing defect D3): log σ → Dense → SiLU →
    Dense, producing the same t_emb width the UNet blocks consume.
    """

    base_dim: int
    output_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sigma: Array) -> Array:
        log_sigma = jnp.log(sigma.astype(jnp.float32))[:, None].astype(self.dtype)
        h = nn.Dense(self.base_dim, dtype=self.dtype, name="dense1")(log_sigma)
        h = nn.silu(h)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="dense2")(h)
