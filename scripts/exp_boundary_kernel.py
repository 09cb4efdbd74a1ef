"""EXPERIMENT (VERDICT r4 #7): fused GN+boundary-conv Mosaic kernel.

The post-r4 trace leaves ~6 ms/step of 3-channel BOUNDARY passes as a
residual known cost: `initial_conv` (3→C, reference `models/ddpm.py:93`)
and the output head GN→SiLU→conv C→3 (`models/ddpm.py:88-91`). The r4
probes showed XLA fuses elementwise PRODUCERS into a conv at zero cost,
so a fused apply→conv kernel has nothing to win — but a kernel that also
computes the GN *statistics* in the same VMEM residency does one HBM
read of the activation where XLA's schedule does two (stats fusion, then
apply+conv fusion), UNLESS the stats fused into the producing conv's
epilogue (which they do in-situ). This experiment prices the standalone
units both ways and records the verdict.

Units (B=2048, 32², flagship widths):
  1. out-head: GN(32)+SiLU → 3×3 conv 128→3
       XLA two-fusion baseline vs one-pass Pallas kernel (stats+apply+
       SiLU+tap9 GEMM in VMEM).
  2. in-conv: 3×3 conv 3→128
       XLA conv vs Pallas im2col (K=27 single GEMM per block; the
       3-lane input is the pathological MXU case either way).

Usage:
    python scripts/exp_boundary_kernel.py --check   # CPU interpret parity
    python scripts/exp_boundary_kernel.py --bench   # TPU timings
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffusion_model_universal_tpu.ops.group_norm import (
    _block_stats, _group_mats, group_norm_silu_xla)
from exp_conv_kernel import _shift, conv3x3_xla

B = int(os.environ.get("EXP_BATCH", 2048))


# ---------------------------------------------------------------------------
# Unit 1: output head — GN(+SiLU) + conv3x3 C->3 in ONE kernel
# ---------------------------------------------------------------------------

def _kernel_out_head(x_ref, scale_ref, bias_ref, w_ref, o_ref, *,
                     num_groups: int, eps: float):
    x = x_ref[...].astype(jnp.float32)               # [Bb, H, W, C]
    bb, h, wd, c = x.shape
    gs = c // num_groups
    m_cg, m_gc = _group_mats(c, num_groups, gs)
    x2 = x.reshape(bb, h * wd, c)
    tb = jnp.zeros((bb, c), jnp.float32)
    mean_c, rstd_c = _block_stats(x2, tb, m_cg, m_gc, gs, eps)
    a = rstd_c * scale_ref[0].astype(jnp.float32)    # [Bb, C]
    b_ = bias_ref[0].astype(jnp.float32) - mean_c * a
    z = x2 * a[:, None, :] + b_[:, None, :]
    y = (z * jax.nn.sigmoid(z)).astype(x_ref.dtype)  # bf16 into the MXU
    y4 = y.reshape(bb, h, wd, c)
    cols = {dx: _shift(y4, dx, axis=2) for dx in (-1, 0, 1)}
    acc = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            t = 3 * (dy + 1) + (dx + 1)
            g = jax.lax.dot_general(
                _shift(cols[dx], dy, axis=1).reshape(bb * h * wd, c),
                w_ref[t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = g if acc is None else acc + g
    o_ref[...] = acc.reshape(bb, h, wd, -1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_groups", "block_b",
                                             "interpret"))
def out_head_pallas(x, scale, bias, w, num_groups: int = 32,
                    block_b: int = 4, interpret: bool = False):
    bsz, h, wd, c = x.shape
    cout = w.shape[-1]
    return pl.pallas_call(
        functools.partial(_kernel_out_head, num_groups=num_groups,
                          eps=1e-5),
        grid=(bsz // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, h, wd, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((9, c, cout), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, h, wd, cout),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x, scale.reshape(1, c), bias.reshape(1, c), w.reshape(9, c, cout))


def out_head_xla(x, scale, bias, w, num_groups: int = 32):
    return conv3x3_xla(group_norm_silu_xla(x, scale, bias, num_groups), w)


# ---------------------------------------------------------------------------
# Unit 2: input conv 3->C as a single K=27 im2col GEMM per block
# ---------------------------------------------------------------------------

def _kernel_in_conv(x_ref, w_ref, o_ref):
    x = x_ref[...]                                   # [Bb, H, W, 3]
    bb, h, wd, c = x.shape
    cols = {dx: _shift(x, dx, axis=2) for dx in (-1, 0, 1)}
    taps = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            taps.append(_shift(cols[dx], dy, axis=1))
    a = jnp.concatenate(taps, axis=3)                # [Bb, H, W, 27]
    g = jax.lax.dot_general(
        a.reshape(bb * h * wd, 9 * c), w_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[...] = g.reshape(bb, h, wd, -1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def in_conv_pallas(x, w, block_b: int = 4, interpret: bool = False):
    bsz, h, wd, c = x.shape
    cout = w.shape[-1]
    return pl.pallas_call(
        _kernel_in_conv,
        grid=(bsz // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, h, wd, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9 * c, cout), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, h, wd, cout),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x, w.reshape(9 * c, cout))


# ---------------------------------------------------------------------------


def scalarized(f):
    return jax.jit(lambda *a: jnp.sum(f(*a).astype(jnp.float32)))


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _ = np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = np.asarray(out)
    return (time.perf_counter() - t0) / n


def check(interpret: bool) -> None:
    key = jax.random.PRNGKey(0)
    kx, kw, ks, kb = jax.random.split(key, 4)
    x = jax.random.normal(kx, (4, 16, 16, 128), jnp.float32) * 0.5
    w = jax.random.normal(kw, (3, 3, 128, 3), jnp.float32) * 0.05
    scale = jax.random.normal(ks, (128,)) * 0.2 + 1.0
    bias = jax.random.normal(kb, (128,)) * 0.1
    want = np.asarray(out_head_xla(x, scale, bias, w), np.float32)
    got = np.asarray(out_head_pallas(x, scale, bias, w, block_b=2,
                                     interpret=interpret), np.float32)
    rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    print(f"out-head: rel {rel:.3e}")
    assert rel < 2e-2, "parity failed (out-head)"

    x3 = jax.random.normal(kx, (4, 16, 16, 3), jnp.float32) * 0.5
    w3 = jax.random.normal(kw, (3, 3, 3, 128), jnp.float32) * 0.1
    want = np.asarray(conv3x3_xla(x3, w3), np.float32)
    got = np.asarray(in_conv_pallas(x3, w3, block_b=2,
                                    interpret=interpret), np.float32)
    rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    print(f"in-conv: rel {rel:.3e}")
    assert rel < 2e-2, "parity failed (in-conv)"
    print("parity OK")


def bench() -> None:
    key = jax.random.PRNGKey(0)
    kx, kw, ks, kb = jax.random.split(key, 4)

    print(f"== out-head unit: GN(32)+SiLU -> conv 128->3  "
          f"(B={B}, 32x32) ==", flush=True)
    x = jax.random.normal(kx, (B, 32, 32, 128), jnp.bfloat16) * 0.5
    w = jax.random.normal(kw, (3, 3, 128, 3), jnp.bfloat16) * 0.05
    scale = jax.random.normal(ks, (128,)) * 0.2 + 1.0
    bias = jax.random.normal(kb, (128,)) * 0.1
    f_xla = scalarized(lambda x: out_head_xla(x, scale, bias, w))
    t = timeit(f_xla, x)
    print(f"  XLA unit      : {t*1e3:7.3f} ms", flush=True)
    for bb in (2, 4, 8):
        try:
            f_p = scalarized(functools.partial(
                out_head_pallas, scale=scale, bias=bias, w=w, block_b=bb))
            t = timeit(f_p, x)
            print(f"  Pallas b{bb:<2d}    : {t*1e3:7.3f} ms", flush=True)
        except Exception as e:
            print(f"  Pallas b{bb:<2d}    : FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)

    print(f"== in-conv unit: conv 3->128  (B={B}, 32x32) ==", flush=True)
    x3 = jax.random.normal(kx, (B, 32, 32, 3), jnp.bfloat16) * 0.5
    w3 = jax.random.normal(kw, (3, 3, 3, 128), jnp.bfloat16) * 0.1
    f_xla = scalarized(lambda x: conv3x3_xla(x, w3))
    t = timeit(f_xla, x3)
    print(f"  XLA conv      : {t*1e3:7.3f} ms", flush=True)
    for bb in (8, 16, 32):
        try:
            f_p = scalarized(functools.partial(in_conv_pallas, w=w3,
                                               block_b=bb))
            t = timeit(f_p, x3)
            print(f"  Pallas b{bb:<2d}    : {t*1e3:7.3f} ms", flush=True)
        except Exception as e:
            print(f"  Pallas b{bb:<2d}    : FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--bench", action="store_true")
    args = ap.parse_args()
    if args.check:
        jax.config.update("jax_platforms", "cpu")
        check(interpret=True)
    if args.bench:
        bench()
