"""Round-3 step-time experiments (isolated micro-benches on the TPU).

Each phase times fwd+bwd of ONE suspicious region of the flagship train
step (identified by scripts/trace_report.py at B=2048) against candidate
reformulations, using the chained/perturbed-rep methodology of bench.py.

    python scripts/exp_round3.py upsample    # ConvTranspose lowerings
    python scripts/exp_round3.py boundary    # initial/output conv bwd
    python scripts/exp_round3.py concat      # skip-concat vs split convs
    python scripts/exp_round3.py rng         # threefry vs rbg noise block

Trace evidence (B=2048, 156.4 ms/step): initial_conv wgrad 2.84 ms,
output_conv dgrad+wgrad 2.4+1.55 ms, up4 ConvTranspose bwd reverse
1.64 ms, up4 concat-bwd split 1.5 ms.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("EXP_BATCH", 2048))


def timeit(fn, *args, n=20, warmup=3):
    import jax
    import numpy as np
    for _ in range(warmup):
        out = fn(*args)
    _ = jax.tree_util.tree_map(np.asarray, out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = jax.tree_util.tree_map(np.asarray, out)
    return (time.perf_counter() - t0) / n


def grad_norm_fn(f):
    """fwd+bwd timing program: grad of sum(f²) wrt all args, reduced to
    ONE on-device scalar (returning the raw grad tensors would ship
    hundreds of MB through the tunnel per call — see scalarized())."""
    import jax
    import jax.numpy as jnp

    def loss(*a):
        return jnp.sum(f(*a).astype(jnp.float32) ** 2)

    grad = jax.grad(loss, argnums=tuple(range(len_args(f))))

    def gnorm(*a):
        return sum(jnp.sum(g.astype(jnp.float32) ** 2)
                   for g in jax.tree_util.tree_leaves(grad(*a)))

    return jax.jit(gnorm)


def scalarized(f):
    """jit(sum(f(*a))) — time forward passes WITHOUT shipping the full
    output tensor through the tunnel (a [2048,32,32,128] bf16 return is
    537 MB ≈ 1.8 s of pure transfer, swamping a ~2 ms device program;
    the first boundary/upsample runs measured exactly that)."""
    import jax
    import jax.numpy as jnp

    return jax.jit(lambda *a: jnp.sum(f(*a).astype(jnp.float32)))


def len_args(f):
    import inspect
    return len(inspect.signature(f).parameters)


def subpixel_conv_transpose(x, w):
    """4x4 stride-2 SAME transpose conv as 4 parity-phase 2x2 convs +
    pixel interleave. out[2m+d] couples x only through kernel taps of
    the opposite parity: even rows (d=0) read taps {3,1} as a 2-tap
    conv with pad (1,0); odd rows (d=1) read taps {2,0} with pad (0,1)
    (same per axis). Every sub-conv is a plain stride-1 conv — no
    lhs_dilation, so XLA's transposed-conv backward (which reverses the
    upstream gradient, a full-activation copy) never appears."""
    import jax
    import jax.numpy as jnp

    phases = []
    pads = {0: (1, 0), 1: (0, 1)}
    for di in (0, 1):
        for dj in (0, 1):
            wk = jnp.flip(w[(1 - di)::2, (1 - dj)::2], axis=(0, 1))
            y = jax.lax.conv_general_dilated(
                x, wk, (1, 1), (pads[di], pads[dj]),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            phases.append(y)
    p = jnp.stack(phases, axis=3)            # [B,H,W,4,C]
    b, h, wd, _, c = p.shape
    p = p.reshape(b, h, wd, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return p.reshape(b, h * 2, wd * 2, c)


def phase_upsample():
    """up4's Upsample: [B,16,16,128] -> [B,32,32,128] 4x4 s2 transpose."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, 16, 16, 128), jnp.bfloat16) * 0.1

    mod = nn.ConvTranspose(128, (4, 4), strides=(2, 2), padding="SAME",
                           dtype=jnp.bfloat16, use_bias=False)
    params = mod.init(jax.random.fold_in(key, 1), x)
    w = params["params"]["kernel"].astype(jnp.bfloat16)

    def flax_ct(x, w):
        return mod.apply({"params": {"kernel": w}}, x)

    fa = jax.jit(flax_ct)
    fb = jax.jit(subpixel_conv_transpose)
    ya, yb = fa(x, w), fb(x, w)
    print("shapes:", ya.shape, yb.shape)
    err = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                - yb.astype(jnp.float32))))
    print(f"subpixel max |diff| vs flax ConvTranspose: {err:.6f}")

    ga = grad_norm_fn(flax_ct)
    gb = grad_norm_fn(subpixel_conv_transpose)
    for name, f, g in (("flax_ct", scalarized(flax_ct), ga),
                       ("subpixel", scalarized(subpixel_conv_transpose),
                        gb)):
        tf = timeit(f, x, w)
        tg = timeit(g, x, w)
        print(f"{name:14s} fwd {tf*1e3:7.3f} ms   fwd+bwd {tg*1e3:7.3f} ms")


def phase_boundary():
    """initial_conv (3->128) wgrad and output_conv (128->3) bwd."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    x3 = jax.random.normal(key, (B, 32, 32, 3), jnp.float32) * 0.5
    w_in = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 3, 128),
                             jnp.bfloat16) * 0.1
    xh = jax.random.normal(jax.random.fold_in(key, 2), (B, 32, 32, 128),
                           jnp.bfloat16) * 0.1
    w_out = jax.random.normal(jax.random.fold_in(key, 3), (3, 3, 128, 3),
                              jnp.bfloat16) * 0.05
    dn = ("NHWC", "HWIO", "NHWC")

    def conv_in(x, w):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w, (1, 1), "SAME",
            dimension_numbers=dn)

    def conv_out(x, w):
        return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                            dimension_numbers=dn)

    def im2col(x):
        # [B,H,W,C] -> [B,H,W,9C] of 3x3 SAME taps.
        pads = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [pads[:, i:i + x.shape[1], j:j + x.shape[2], :]
                for i in range(3) for j in range(3)]
        return jnp.concatenate(cols, axis=-1)

    def wgrad_in_gemm(x, dz):
        cols = im2col(x.astype(jnp.bfloat16))       # [B,32,32,27]
        return jax.lax.dot_general(
            cols.reshape(-1, 27), dz.reshape(-1, 128),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [27, 128]

    def dgrad_out_gemm(dy, w):
        # dx = sum_taps dy_shifted @ W_flip: im2col dy (3ch -> 27 cols).
        cols = im2col(dy)                            # [B,32,32,27]
        wf = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)  # [3,3,3out,128in]
        return jax.lax.dot_general(
            cols.reshape(-1, 27), wf.reshape(27, 128),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(B, 32, 32, 128)

    # --- XLA autodiff baselines ---------------------------------------
    def loss_in(x, w):
        return jnp.sum(conv_in(x, w).astype(jnp.float32) ** 2)

    gi = jax.jit(jax.grad(loss_in, argnums=1))

    def loss_out(x, w):
        return jnp.sum(conv_out(x, w).astype(jnp.float32) ** 2)

    go_raw = jax.jit(jax.grad(loss_out, argnums=(0, 1)))
    go = jax.jit(lambda x, w: sum(
        jnp.sum(g.astype(jnp.float32) ** 2)
        for g in jax.grad(loss_out, argnums=(0, 1))(x, w)))

    dz = jax.jit(lambda x, w: 2 * conv_in(x, w).astype(jnp.bfloat16))(
        x3, w_in)
    dy3 = jax.jit(lambda x, w: 2 * conv_out(x, w))(xh, w_out)

    wg = jax.jit(wgrad_in_gemm)
    dg = jax.jit(dgrad_out_gemm)

    # numerics
    ref_wg = gi(x3, w_in)
    got_wg = wg(x3, dz).reshape(3, 3, 3, 128)
    print("wgrad_in  max|diff|:",
          float(jnp.max(jnp.abs(ref_wg.astype(jnp.float32)
                                - got_wg.astype(jnp.float32)))))
    ref_dx = go_raw(xh, w_out)[0]
    got_dx = dg(dy3, w_out)
    print("dgrad_out max|diff|:",
          float(jnp.max(jnp.abs(ref_dx.astype(jnp.float32)
                                - got_dx.astype(jnp.float32)))))

    # All timed programs reduce to scalars (or [27,128]-sized grads) on
    # device; the raw-tensor returns of conv_out/dgrad ship 100 MB-2 GB
    # through the tunnel otherwise (see scalarized()).
    sdg = jax.jit(lambda dy, w: jnp.sum(dgrad_out_gemm(dy, w)))
    print(f"initial wgrad   XLA  {timeit(gi, x3, w_in)*1e3:7.3f} ms")
    print(f"initial wgrad   GEMM {timeit(wg, x3, dz)*1e3:7.3f} ms")
    print(f"output fwd           {timeit(scalarized(conv_out), xh, w_out)*1e3:7.3f} ms")
    print(f"output dgrad+wgrad XLA {timeit(go, xh, w_out)*1e3:7.3f} ms")
    print(f"output dgrad    GEMM {timeit(sdg, dy3, w_out)*1e3:7.3f} ms")


def phase_concat():
    """up4 res0 entry: GN+SiLU+conv1 on concat(h, skip) vs split convs."""
    import jax
    import jax.numpy as jnp

    from diffusion_model_universal_tpu.ops.group_norm import \
        group_norm_silu_xla

    key = jax.random.PRNGKey(0)
    h = jax.random.normal(key, (B, 16, 16, 128), jnp.bfloat16) * 0.1
    sk = jax.random.normal(jax.random.fold_in(key, 1),
                           (B, 16, 16, 128), jnp.bfloat16) * 0.1
    w = jax.random.normal(jax.random.fold_in(key, 2), (3, 3, 256, 128),
                          jnp.bfloat16) * 0.02
    scale = jnp.ones((256,), jnp.float32)
    bias = jnp.zeros((256,), jnp.float32)
    dn = ("NHWC", "HWIO", "NHWC")

    def fused_concat(h, sk, w, scale, bias):
        x = jnp.concatenate([h, sk], axis=-1)
        y = group_norm_silu_xla(x, scale, bias, 32)
        return jax.lax.conv_general_dilated(
            y.astype(jnp.bfloat16), w, (1, 1), "SAME",
            dimension_numbers=dn)

    def split_convs(h, sk, w, scale, bias):
        # 256ch/32groups = 8 per group; 128 % 8 == 0 -> the two halves own
        # disjoint groups, so GN(concat) == concat(GN(h), GN(sk)) with
        # sliced affine params; the conv distributes over the concat.
        yh = group_norm_silu_xla(h, scale[:128], bias[:128], 16)
        ys = group_norm_silu_xla(sk, scale[128:], bias[128:], 16)
        a = jax.lax.conv_general_dilated(
            yh.astype(jnp.bfloat16), w[:, :, :128], (1, 1), "SAME",
            dimension_numbers=dn)
        b = jax.lax.conv_general_dilated(
            ys.astype(jnp.bfloat16), w[:, :, 128:], (1, 1), "SAME",
            dimension_numbers=dn)
        return a + b

    fa, fb = jax.jit(fused_concat), jax.jit(split_convs)
    err = float(jnp.max(jnp.abs(fa(h, sk, w, scale, bias).astype(jnp.float32)
                                - fb(h, sk, w, scale, bias)
                                .astype(jnp.float32))))
    print(f"split max |diff|: {err:.6f}")
    ga, gb = grad_norm_fn(fused_concat), grad_norm_fn(split_convs)
    for name, f, g in (("concat", fa, ga), ("split", fb, gb)):
        print(f"{name:8s} fwd {timeit(f, h, sk, w, scale, bias)*1e3:7.3f} ms"
              f"   fwd+bwd {timeit(g, h, sk, w, scale, bias)*1e3:7.3f} ms")


def phase_rng():
    """The per-step random block: t ~ randint, eps ~ normal [B,32,32,3]."""
    import jax
    import jax.numpy as jnp

    def block(key):
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (B,), 0, 1000)
        eps = jax.random.normal(kn, (B, 32, 32, 3), jnp.float32)
        return t.astype(jnp.float32).sum() + eps.sum()

    kt = jax.random.PRNGKey(0)
    kr = jax.random.key(0, impl="rbg")
    f = jax.jit(block)
    print(f"threefry  {timeit(f, kt)*1e3:7.3f} ms")
    print(f"rbg       {timeit(f, kr)*1e3:7.3f} ms")


def phase_blockremat():
    """Remat policy as a BYTE-cutting lever (r3 session-2 finding).

    The flagship step is memory-bound: XLA cost analysis prices it at
    96.7 GB demanded HBM traffic (118 ms floor) vs 157.9 ms measured
    (BENCH_NOTES round-3). With remat OFF, every GN+SiLU output is
    stored for the backward — a full [B,H,W,C] write plus a backward
    read per activation. `jax.checkpoint` with
    ``save_only_these_names('convout')`` keeps CONV outputs (the
    expensive-to-recompute tensors) and recomputes the cheap GN/SiLU
    elementwise chains in the backward from them — trading a second
    read of x (already resident) for the store+load of y. On a
    bytes-bound step that is a straight win if the recompute fuses.

    Times a 4-block ResidualBlock chain fwd+bwd at the flagship shape
    under: none / save-convout / full-remat.
    """
    import jax
    import jax.numpy as jnp
    from jax.ad_checkpoint import checkpoint_name

    from diffusion_model_universal_tpu.ops.group_norm import \
        group_norm_silu_xla

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, 32, 32, 128), jnp.bfloat16) * 0.1
    temb = jax.random.normal(jax.random.fold_in(key, 1), (B, 128),
                             jnp.float32) * 0.1
    n_blocks = 4
    dn = ("NHWC", "HWIO", "NHWC")

    def make_params(k):
        ws = []
        for i in range(n_blocks):
            k1, k2, k = jax.random.split(jax.random.fold_in(k, i), 3)
            ws.append({
                "w1": jax.random.normal(k1, (3, 3, 128, 128),
                                        jnp.bfloat16) * 0.03,
                "w2": jax.random.normal(k2, (3, 3, 128, 128),
                                        jnp.bfloat16) * 0.03,
                "s1": jnp.ones((128,), jnp.float32),
                "b1": jnp.zeros((128,), jnp.float32),
                "s2": jnp.ones((128,), jnp.float32),
                "b2": jnp.zeros((128,), jnp.float32),
            })
        return ws

    params = make_params(jax.random.fold_in(key, 7))

    def block(x, p, temb):
        y1 = group_norm_silu_xla(x, p["s1"], p["b1"], 32)
        h = jax.lax.conv_general_dilated(
            y1.astype(jnp.bfloat16), p["w1"], (1, 1), "SAME",
            dimension_numbers=dn)
        h = checkpoint_name(h, "convout")
        y2 = group_norm_silu_xla(h, p["s2"], p["b2"], 32,
                                 time_bias=temb)
        out = jax.lax.conv_general_dilated(
            y2.astype(jnp.bfloat16), p["w2"], (1, 1), "SAME",
            dimension_numbers=dn)
        return checkpoint_name(out, "convout") + x

    policies = {
        "none": None,
        "save_convout": jax.checkpoint_policies.save_only_these_names(
            "convout"),
        "full_remat": jax.checkpoint_policies.nothing_saveable,
    }

    for name, pol in policies.items():
        blk = block if pol is None else jax.checkpoint(block, policy=pol)

        def chain(x, params, temb):
            for p in params:
                x = blk(x, p, temb)
            return x

        def loss(x, params, temb):
            return jnp.sum(chain(x, params, temb).astype(jnp.float32) ** 2)

        # Reduce the gradient pytree to ONE scalar on-device: the naive
        # "return full grads" form shipped a ~1.5 GB x-grad through the
        # tunnel per call, swamping the ~100 ms device program (first
        # run of this phase measured 2.6-3.5 s/call, all transfer).
        def gnorm(x, params, temb):
            gx, gp = jax.grad(loss, argnums=(0, 1))(x, params, temb)
            leaves = jax.tree_util.tree_leaves((gx, gp))
            return sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves)

        g = jax.jit(gnorm)
        cost_txt = "cost-analysis n/a"
        try:
            cost = g.lower(x, params, temb).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
            nbytes = float(cost.get("bytes accessed", 0.0))
            cost_txt = f"{nbytes/1e9:6.2f} GB   {flops/1e12:6.2f} TFLOP"
        except Exception as e:  # sentinel, not fake zeros (ADVICE r3)
            cost_txt = f"cost-analysis failed: {type(e).__name__}"
        t = timeit(g, x, params, temb, n=10)
        print(f"{name:14s} fwd+bwd {t*1e3:8.3f} ms   {cost_txt}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["upsample", "boundary", "concat",
                                      "rng", "blockremat", "all"])
    args = ap.parse_args()
    from diffusion_model_universal_tpu.utils.cache import \
        enable_compilation_cache
    enable_compilation_cache()
    phases = (["upsample", "boundary", "concat", "rng", "blockremat"]
              if args.phase == "all" else [args.phase])
    for p in phases:
        print(f"=== {p} (B={B}) ===")
        globals()[f"phase_{p}"]()
