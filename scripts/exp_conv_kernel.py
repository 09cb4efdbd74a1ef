"""EXPERIMENT: Pallas 3x3 conv (shifted-GEMM formulation) vs XLA's conv.

Targets the flagship UNet's dominant conv shape (32x32, C=128->128, 3x3,
stride 1 — 41.8% of step conv FLOPs, `bench._CONV_SHAPES`). XLA's conv
kernels measure ~0.74-0.76 MXU efficiency there; this probes whether a
Pallas implicit-GEMM formulation can beat that.

Formulation: grid over batch blocks; per block the 3 column-shifted
variants of the input are built once with `pltpu.roll` + edge masking
(cheap VPU rotates — W sits in sublanes), then each of the 9 taps is a
row-shift (roll) + one MXU GEMM (Bb*H*W, C) @ (C, Cout) accumulated in
f32. Padding is handled by zero-masking the wrapped row/column, so the
batch-block grid needs no spatial halo exchange.

Known structural risk (why XLA may be unbeatable here): the 9-tap f32
partial-sum traffic flows through VMEM/VPU unless the kernel
materializes an im2col buffer for K-chaining; either route costs
~30-40% overhead against the ~25% XLA already pays.

Usage:
    python scripts/exp_conv_kernel.py --check          # CPU interpret parity
    python scripts/exp_conv_kernel.py --bench          # TPU timing vs XLA

MEASURED CONCLUSION (v5e, 2026-08-19, B=2048 32² 128→128): the
"fused unit" probe (silu(x·a+b) → conv, the GN-apply producer fusion
hypothesized to reclaim part of the step's 24.8 ms elementwise band)
has ZERO headroom: the XLA baseline unit runs 3.70-3.77 ms — within
noise of the BARE conv (3.68-3.76 ms across runs) — i.e. XLA already
folds the per-sample affine+SiLU producer into the convolution at no
cost. The elementwise band in the step trace is therefore GN *stats*
reductions, skip-adds, Adam/EMA and backward-only traffic, none of
which this fusion touches. (The Pallas fused variant additionally
fails to lower on this backend — Mosaic rejects per-sample broadcasts
(Bb,1,C)·(Bb,HW,C) with a vector.broadcast verification error — but
with the XLA unit tying the bare conv it could at best tie.)
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


def _shift(a, d: int, axis: int):
    """a'[..., i, ...] = a[..., i+d, ...] with zero fill at the edge.

    Expressed as slice+concat (Mosaic's bf16 rotate is unimplemented on
    this backend; slice/concat along sublane axes lowers fine).
    """
    if d == 0:
        return a
    size = a.shape[axis]
    zero = jnp.zeros_like(jax.lax.slice_in_dim(a, 0, 1, axis=axis))
    if d == 1:
        body = jax.lax.slice_in_dim(a, 1, size, axis=axis)
        return jnp.concatenate([body, zero], axis=axis)
    body = jax.lax.slice_in_dim(a, 0, size - 1, axis=axis)
    return jnp.concatenate([zero, body], axis=axis)


def _kernel(x_ref, w_ref, o_ref):
    x = x_ref[...]  # (Bb, H, W, C)
    bb, h, w, c = x.shape
    # Column-shifted variants, shared across the three row shifts.
    cols = {dx: _shift(x, dx, axis=2) for dx in (-1, 0, 1)}
    acc = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            a = _shift(cols[dx], dy, axis=1)
            t = 3 * (dy + 1) + (dx + 1)
            g = jax.lax.dot_general(
                a.reshape(bb * h * w, c), w_ref[t],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = g if acc is None else acc + g
    o_ref[...] = acc.reshape(bb, h, w, -1).astype(o_ref.dtype)


def _kernel_fused(x_ref, a_ref, b_ref, w_ref, o_ref):
    """GN-apply + SiLU PROLOGUE fused into the tap9 conv.

    Takes the RAW activation plus the per-(sample, channel) affine that
    `ops/group_norm.py` folds the GroupNorm statistics into
    (y = silu(x·a + b)), computes y once in VMEM/registers, then feeds
    the 9 taps from it. XLA cannot fuse an elementwise producer INTO a
    convolution operand, so its best schedule materializes y through HBM
    (one write by the fused affine+SiLU kernel, one read by the conv) —
    exactly the "elementwise band" of the step trace (BENCH_NOTES r3:
    24.8 ms of a 156 ms step). This kernel deletes that round trip.
    """
    x = x_ref[...]                               # (Bb, H, W, C)
    bb_, h, w, c = x.shape
    # Apply in the input dtype — matches `group_norm_silu_xla`'s fused
    # bf16 apply pass (stats are folded into a/b upstream in f32). The
    # broadcast runs in (Bb, H·W, C) shape: Mosaic lowers a length-1
    # middle-dim (sublane) broadcast, but rejects the 4D (Bb,1,1,C) form.
    x2 = x.reshape(bb_, h * w, c)
    z = x2 * a_ref[...].reshape(bb_, 1, c) + b_ref[...].reshape(bb_, 1, c)
    y = (z * jax.nn.sigmoid(z)).reshape(bb_, h, w, c)
    cols = {dx: _shift(y, dx, axis=2) for dx in (-1, 0, 1)}
    acc = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            t = 3 * (dy + 1) + (dx + 1)
            g = jax.lax.dot_general(
                _shift(cols[dx], dy, axis=1).reshape(bb_ * h * w, c),
                w_ref[t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = g if acc is None else acc + g
    o_ref[...] = acc.reshape(bb_, h, w, -1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def gn_silu_conv3x3_pallas(x, a, b, w, block_b: int = 4,
                           interpret: bool = False):
    """silu(x·a+b) → 3x3 SAME conv, one Pallas kernel. a, b: (B, C)."""
    bsz, h, ww, c = x.shape
    cout = w.shape[-1]
    return pl.pallas_call(
        _kernel_fused,
        grid=(bsz // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, h, ww, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((block_b, 1, 1, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((block_b, 1, 1, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9, c, cout), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, h, ww, cout),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, ww, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x, a.reshape(bsz, 1, 1, c), b.reshape(bsz, 1, 1, c),
      w.reshape(9, c, cout))


def gn_silu_conv3x3_xla(x, a, b, w):
    """XLA baseline for the fused unit: affine+SiLU then conv (the
    intermediate y makes an HBM round trip between the two kernels)."""
    z = x * a[:, None, None, :] + b[:, None, None, :]
    return conv3x3_xla((z * jax.nn.sigmoid(z)).astype(x.dtype), w)


def _kernel_k3(x_ref, w_ref, o_ref):
    """K-chained variant: one GEMM per kernel ROW (K = 3·C), with the
    row shift realized as a free slice of an H-padded buffer (H is an
    untiled outer dim, so slicing it costs nothing) and the W·H·Bb free
    dims fed to `dot_general` directly (no reshape → no relayout)."""
    x = x_ref[...]  # (Bb, H, W, C)
    bb, h, w, c = x.shape
    a3 = jnp.concatenate([_shift(x, dx, axis=2) for dx in (-1, 0, 1)],
                         axis=3)                     # (Bb, H, W, 3C)
    a3p = jnp.pad(a3, ((0, 0), (1, 1), (0, 0), (0, 0)))
    acc = None
    for dy in (-1, 0, 1):
        a = jax.lax.slice_in_dim(a3p, 1 + dy, 1 + dy + h, axis=1)
        g = jax.lax.dot_general(
            a, w_ref[dy + 1],                        # (3C, Cout)
            (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (Bb, H, W, Cout)
        acc = g if acc is None else acc + g
    o_ref[...] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "variant",
                                             "interpret"))
def conv3x3_pallas(x, w, block_b: int = 4, variant: str = "tap9",
                   interpret: bool = False):
    """3x3 SAME conv, NHWC, stride 1. w: (3, 3, Cin, Cout)."""
    b, h, ww, c = x.shape
    cout = w.shape[-1]
    if variant == "tap9":
        kern, wk = _kernel, w.reshape(9, c, cout)
    else:
        kern, wk = _kernel_k3, w.reshape(3, 3 * c, cout)
    return pl.pallas_call(
        kern,
        grid=(b // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, h, ww, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(wk.shape, lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, h, ww, cout),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, ww, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x, wk)


def conv3x3_xla(x, w):
    # bf16 in/out; the TPU conv accumulates f32 internally (same as the
    # Pallas kernel's f32 accumulator) — matches bench.py's methodology.
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3x3_pallas_vjp(x, w, block_b: int = 4, interpret: bool = False):
    """Differentiable packed conv: Pallas tap9 FORWARD + XLA-autodiff
    BACKWARD (dgrad/dwgrad are themselves convs, where XLA's emitter is
    already at its ceiling — the probe's tap9 result). This is the form
    that could land in the UNet behind a flag for the tiny-spatial
    bottleneck shapes IF the hardware probe shows a win there; built and
    gradient-tested ahead of the measurement so landing is one step."""
    return conv3x3_pallas(x, w, block_b=block_b, interpret=interpret)


def _vjp_fwd(x, w, block_b, interpret):
    return (conv3x3_pallas(x, w, block_b=block_b, interpret=interpret),
            (x, w))


def _vjp_bwd(block_b, interpret, res, g):
    x, w = res
    # The mathematically-equivalent XLA conv's VJP — identical grads up
    # to float noise, with XLA's fused dgrad/wgrad kernels.
    _, pullback = jax.vjp(conv3x3_xla, x, w)
    return pullback(g)


conv3x3_pallas_vjp.defvjp(_vjp_fwd, _vjp_bwd)


def check(interpret: bool) -> None:
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (4, 16, 16, 128), jnp.bfloat16) * 0.1
    w = jax.random.normal(kw, (3, 3, 128, 128), jnp.bfloat16) * 0.05
    want = np.asarray(conv3x3_xla(x, w), np.float32)
    for variant in ("tap9", "k3"):
        got = np.asarray(conv3x3_pallas(x, w, block_b=2, variant=variant,
                                        interpret=interpret), np.float32)
        err = np.abs(got - want).max()
        rel = err / max(np.abs(want).max(), 1e-6)
        print(f"{variant}: max abs err {err:.3e}  (rel {rel:.3e})")
        assert rel < 2e-2, f"parity failed ({variant})"
    ka, kb = jax.random.split(kw)
    a = jax.random.normal(ka, (4, 128), jnp.bfloat16) * 0.3 + 1.0
    bb = jax.random.normal(kb, (4, 128), jnp.bfloat16) * 0.1
    want = np.asarray(gn_silu_conv3x3_xla(x, a, bb, w), np.float32)
    got = np.asarray(gn_silu_conv3x3_pallas(x, a, bb, w, block_b=2,
                                            interpret=interpret), np.float32)
    rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    print(f"fused-gn-silu: rel {rel:.3e}")
    assert rel < 2e-2, "parity failed (fused)"
    print("parity OK")


def bench(block_b: int, shape=(32, 128, 128)) -> None:
    h, c, cout = shape
    b, reps = 2048, 50
    # Keep the timed program near bench.py's ~0.25 s target.
    flops_single = 2.0 * b * h * h * 9 * c * cout
    reps = min(max(int(0.25 * 197e12 * 0.7 / flops_single), 10), 400)
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (b, h, h, c), jnp.bfloat16) * 0.01
    w = (jax.random.normal(kw, (3, 3, c, cout), jnp.bfloat16)
         * (1.0 / (9 * c)) ** 0.5)
    flops = 2.0 * b * h * h * 9 * c * cout
    peak = 197e12

    def timed(fn, name):
        # Chain output->input, Python-unrolled (bench.py methodology:
        # zero non-conv traffic, CSE defeated by the data dependence).
        @jax.jit
        def loop(x0):
            y = x0
            for _ in range(reps):
                y = fn(y, w)
            return jnp.sum(y.astype(jnp.float32))

        s = loop(x)  # compile + warm
        np.asarray(s)
        t0 = time.perf_counter()
        np.asarray(loop(x))
        dt = (time.perf_counter() - t0) / reps
        eff = flops / dt / peak
        print(f"{name:>10}: {dt*1e3:7.3f} ms/conv   "
              f"{flops/dt/1e12:6.1f} TFLOP/s   MXU eff {eff:.3f}",
              flush=True)
        return eff

    print(f"shape (B={b}, {h}x{h}, {c}->{cout}), reps={reps}", flush=True)
    e_xla = timed(conv3x3_xla, "XLA")
    # Candidate batch blocks sized so a block is ~1-4 MB of VMEM.
    base = max(2, (1 << 20) // (h * h * c * 2))
    for variant, bb in (("tap9", base), ("tap9", 2 * base),
                        ("k3", base // 2 or 1), ("k3", base)):
        if b % bb:
            continue
        try:
            e = timed(functools.partial(conv3x3_pallas, block_b=bb,
                                        variant=variant),
                      f"{variant}-b{bb}")
            print(f"  {variant}-b{bb}/XLA = {e/e_xla:.3f}", flush=True)
        except Exception as exc:  # VMEM overflow etc. — record and go on
            print(f"  {variant}-b{bb}: FAILED "
                  f"{type(exc).__name__}: {str(exc)[:200]}", flush=True)

    # ---- fused GN-apply+SiLU → conv unit (needs cin == cout to chain) --
    if c != cout:
        return
    print("fused unit: silu(x*a+b) -> conv   (the elementwise-band fusion)",
          flush=True)
    ka, kb = jax.random.split(kw)
    av = jax.random.normal(ka, (b, c), jnp.bfloat16) * 0.05 + 1.0
    bv = jax.random.normal(kb, (b, c), jnp.bfloat16) * 0.05
    e_xla_f = timed(lambda y, wt: gn_silu_conv3x3_xla(y, av, bv, wt),
                    "XLA-unit")
    for bb in (base, 2 * base):
        if b % bb:
            continue
        try:
            e = timed(functools.partial(
                lambda y, wt, _bb: gn_silu_conv3x3_pallas(
                    y, av, bv, wt, block_b=_bb), _bb=bb),
                f"fused-b{bb}")
            print(f"  fused-b{bb}/XLA-unit = {e/e_xla_f:.3f}", flush=True)
        except Exception as exc:
            print(f"  fused-b{bb}: FAILED "
                  f"{type(exc).__name__}: {str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--block_b", type=int, default=4)
    ap.add_argument("--shape", type=int, nargs=3, default=[32, 128, 128],
                    metavar=("H", "CIN", "COUT"),
                    help="conv shape to probe (see bench._CONV_SHAPES)")
    args = ap.parse_args()
    if args.check:
        jax.config.update("jax_platforms", "cpu")
        check(interpret=True)
    if args.bench:
        bench(args.block_b, tuple(args.shape))
