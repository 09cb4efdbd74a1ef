"""Fused multi-head self-attention op for the UNet's spatial attention.

The reference computes one dense softmax(QKᵀ·d⁻⁰·⁵)V per attention block
(`models/layers/attention.py:54-57`) over sequences of H·W tokens — at most
16–64 tokens for the shipped 32²/64² configs (attention runs after 3–5
stride-2 downsamples). That regime is MXU-bound, not memory-bound, so the
"flash" trick of tiling over sequence is unnecessary; the TPU win is doing
QKᵀ → softmax → ·V in one VMEM-resident kernel with fp32 accumulation.

Two implementations behind one API:
* :func:`mha_xla` — plain jnp einsum chain (fallback + numerics oracle).
* :func:`mha_pallas` — single-kernel fused attention, one (batch, head) tile
  per grid step, fp32 softmax in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jnp.ndarray


def mha_xla(q: Array, k: Array, v: Array) -> Array:
    """softmax(QKᵀ·d⁻⁰·⁵)V over [B, N, S, D] (batch, heads, seq, head_dim)."""
    d = q.shape[-1]
    scale = d ** -0.5
    logits = jnp.einsum("bnsd,bntd->bnst", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bnst,bntd->bnsd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _mha_kernel(q_ref, k_ref, v_ref, out_ref, *, scale: float):
    """One (batch·head) tile: full S×S attention in VMEM, fp32 softmax."""
    q = q_ref[0].astype(jnp.float32)   # [S, D]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jnp.dot(probs, v, preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mha_pallas(q: Array, k: Array, v: Array,
               interpret: bool = False) -> Array:
    """Fused attention kernel over [B, N, S, D]; grid = B·N.

    ``interpret=True`` runs the kernel body through the Pallas
    interpreter — how CI exercises the kernel numerics on CPU against
    :func:`mha_xla`.
    """
    b, n, s, d = q.shape
    scale = d ** -0.5
    qf = q.reshape(b * n, s, d)
    kf = k.reshape(b * n, s, d)
    vf = v.reshape(b * n, s, d)
    spec = pl.BlockSpec((1, s, d), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * n, s, d), q.dtype),
        grid=(b * n,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, n, s, d)


@jax.custom_vjp
def _mha_fused(q: Array, k: Array, v: Array) -> Array:
    """Pallas kernel forward with XLA-derived backward (the sequences here
    are ≤1024 tokens, so rematerializing attention in the backward is
    cheaper than storing probabilities)."""
    return mha_pallas(q, k, v)


def _mha_fwd(q, k, v):
    return _mha_fused(q, k, v), (q, k, v)


def _mha_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(mha_xla, q, k, v)
    return vjp(g)


_mha_fused.defvjp(_mha_fwd, _mha_bwd)


def multi_head_attention(q: Array, k: Array, v: Array,
                         use_pallas: bool = False) -> Array:
    """Dispatch between the Pallas kernel and the XLA fallback."""
    if use_pallas and _pallas_supported():
        return _mha_fused(q, k, v)
    return mha_xla(q, k, v)


@functools.lru_cache(maxsize=1)
def _pallas_supported() -> bool:
    try:
        return jax.default_backend() in ("tpu",)
    except Exception:
        return False
