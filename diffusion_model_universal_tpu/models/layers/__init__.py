"""Layer zoo for the diffusion UNet (reference `models/layers/__init__.py:20-29`)."""

from .attention import SelfAttentionBlock
from .embeddings import SigmaEmbedding, TimeEmbedding, sinusoidal_embedding
from .resnet import (AttentionDownBlock, AttentionUpBlock, ConvDownBlock,
                     ConvUpBlock, Downsample, GroupNormSiLU, ResidualBlock,
                     Upsample)

__all__ = [
    "SelfAttentionBlock", "SigmaEmbedding", "TimeEmbedding",
    "sinusoidal_embedding", "AttentionDownBlock", "AttentionUpBlock",
    "ConvDownBlock", "ConvUpBlock", "Downsample", "GroupNormSiLU",
    "ResidualBlock", "Upsample",
]
