"""Prototype: Pallas conv3x3 for the CRN's hot stages (real TPU).

Motivation (profile_conv_variants*.py, v5e): XLA's conv lowering tops out
at 57-79 TF/s on the CRN shapes while big bf16 matmuls on the same chip
sustain ~166 TF/s.  The conv's im2col matmul has K=9*Cin (2592 for stage 5)
— large enough to run near peak — but XLA evidently decomposes by tap
(K=288 per pass), eating the small-K penalty 9 times.  This kernel builds
the im2col patches in VMEM (free halo reads; no HBM im2col) and issues ONE
MXU matmul per tile, optionally fusing bias+affine(BN)+LeakyReLU.

Variants benchmarked:
  xla      — jax.lax conv (bf16 pre-cast) baseline
  k9       — Pallas, 9 accumulated (K=Cin) dots
  im2col   — Pallas, single (K=9*Cin) dot
  im2col+e — im2col + fused bias/affine/leakyrelu epilogue, bf16 out

Usage: python scripts/proto_pallas_conv.py [batch]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sync(x):
    return float(x[(0,) * x.ndim]) + float(x[(-1,) * x.ndim])


def timeit(fn, args, iters=20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def make_conv_kernel(TH, W, CIN, CO, n_htiles, mode, epilogue):
    import jax
    import jax.numpy as jnp

    def kernel(prev_ref, cur_ref, next_ref, w_ref, s_ref, b_ref, out_ref,
               xwin_ref, patches_ref):
        h = pl.program_id(1)
        cur = cur_ref[0]                      # (TH, W, CIN)
        xwin_ref[1:TH + 1, 1:W + 1, :] = cur
        # W edges: zero columns (conv 'same' zero padding)
        xwin_ref[:, 0, :] = jnp.zeros((TH + 2, CIN), cur.dtype)
        xwin_ref[:, W + 1, :] = jnp.zeros((TH + 2, CIN), cur.dtype)

        @pl.when(h > 0)
        def _():
            xwin_ref[0, 1:W + 1, :] = prev_ref[0, TH - 1]

        @pl.when(h == 0)
        def _():
            xwin_ref[0, :, :] = jnp.zeros((W + 2, CIN), cur.dtype)

        @pl.when(h < n_htiles - 1)
        def _():
            xwin_ref[TH + 1, 1:W + 1, :] = next_ref[0, 0]

        @pl.when(h == n_htiles - 1)
        def _():
            xwin_ref[TH + 1, :, :] = jnp.zeros((W + 2, CIN), cur.dtype)

        if mode in ("im2col", "patch_only", "mm_only"):
            if mode != "mm_only":
                for t in range(9):
                    ki, kj = divmod(t, 3)
                    patches_ref[:, t * CIN:(t + 1) * CIN] = \
                        xwin_ref[ki:ki + TH, kj:kj + W, :].reshape(
                            TH * W, CIN)
            if mode == "patch_only":
                # fake cheap output so the dot is skipped but patches
                # aren't dead-code-eliminated
                acc = (patches_ref[:, :CO].astype(jnp.float32)
                       + cur[:, :, :CO].reshape(TH * W, CO))
            else:
                acc = jnp.dot(patches_ref[:], w_ref[:],
                              preferred_element_type=jnp.float32)
        else:  # k9
            acc = None
            for t in range(9):
                ki, kj = divmod(t, 3)
                tap = xwin_ref[ki:ki + TH, kj:kj + W, :].reshape(TH * W, CIN)
                part = jnp.dot(tap, w_ref[t * CIN:(t + 1) * CIN, :],
                               preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
        if epilogue:
            acc = acc * s_ref[0] + b_ref[0]
            acc = jnp.where(acc > 0, acc, 0.2 * acc)
        out_ref[0] = acc.reshape(TH, W, CO).astype(out_ref.dtype)

    return kernel


def build(x, w, scale, bias, TH, mode, epilogue, out_dtype):
    import jax
    import jax.numpy as jnp

    N, H, W, CIN = x.shape
    CO = w.shape[-1]
    n_htiles = H // TH
    wmat = w.reshape(9 * CIN, CO)
    grid = (N, n_htiles)
    blk = lambda f: pl.BlockSpec((1, TH, W, CIN),
                                 lambda n, h: (n, f(h), 0, 0))
    kern = make_conv_kernel(TH, W, CIN, CO, n_htiles, mode, epilogue)

    @jax.jit
    def run(x, wmat, scale, bias):
        # x passed 3x: prev/cur/next row-tile views for the conv halo.
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, H, W, CO), out_dtype),
            grid=grid,
            in_specs=[
                blk(lambda h: jnp.maximum(h - 1, 0)),
                blk(lambda h: h),
                blk(lambda h: jnp.minimum(h + 1, n_htiles - 1)),
                pl.BlockSpec((9 * CIN, CO), lambda n, h: (0, 0)),
                pl.BlockSpec((1, CO), lambda n, h: (0, 0)),
                pl.BlockSpec((1, CO), lambda n, h: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, TH, W, CO),
                                   lambda n, h: (n, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((TH + 2, W + 2, CIN), x.dtype),
                pltpu.VMEM((TH * W, 9 * CIN), x.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * N * H * W * 9 * CIN * CO,
                bytes_accessed=x.size * x.dtype.itemsize * 3
                + N * H * W * CO * 4,
                transcendentals=0),
        )(x, x, x, wmat, scale, bias)

    return run


def main():
    global pl, pltpu
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl  # noqa: F811
    from jax.experimental.pallas import tpu as pltpu  # noqa: F811

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.RandomState(0)

    all_shapes = [  # (H, CIN, CO) — CRN vg128 hot convs
        (128, 288, 64),    # stage5 conv0
        (128, 64, 64),     # stage5 conv1 / output_conv_0
        (64, 416, 128),    # stage4 conv0
        (64, 128, 128),    # stage4 conv1
        (32, 672, 256),    # stage3 conv0
    ]
    # Select shapes/variants via argv to keep each TPU run under the
    # compile-time budget (each pallas variant compiles 20-60 s through
    # the tunnel).
    pick = sys.argv[2] if len(sys.argv) > 2 else "0"
    shapes = [all_shapes[int(i)] for i in pick.split(",")]
    tile_hs = [int(t) for t in (sys.argv[3].split(",")
                                if len(sys.argv) > 3 else ["8"])]
    # argv[4]: comma-set of variants to run (xla, im2col, k9, epi)
    variants = set((sys.argv[4] if len(sys.argv) > 4
                    else "xla,im2col,k9,epi").split(","))
    for (H, CIN, CO) in shapes:
        W = H
        x = jnp.asarray(rng.randn(batch, H, W, CIN), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, CIN, CO) * 0.05, jnp.bfloat16)
        scale = jnp.asarray(rng.rand(1, CO) + 0.5, jnp.float32)
        bias = jnp.asarray(rng.randn(1, CO) * 0.1, jnp.float32)
        flops = 2 * batch * H * W * 9 * CIN * CO

        @jax.jit
        def xla_conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)

        if "xla" in variants:
            ms = timeit(xla_conv, (x, w))
            print(f"[{H:3d}^2 {CIN:4d}->{CO:4d}] xla bf16      "
                  f"{ms:8.3f} ms {flops / ms / 1e9:7.1f} TF/s")

        # Lane-align the channel dim so the in-VMEM tap concat compiles
        # (Mosaic rejects concat of 288-lane pieces); the real model's
        # producer op emits the padded channels for free.
        CP = -(-CIN // 128) * 128
        xp = jnp.pad(x, ((0, 0),) * 3 + ((0, CP - CIN),)) if CP != CIN else x
        wp = (jnp.pad(w, ((0, 0), (0, 0), (0, CP - CIN), (0, 0)))
              if CP != CIN else w)
        ref = np.asarray(xla_conv(x, w))

        for TH in tile_hs:
            for mode in ("im2col", "k9", "patch_only", "mm_only"):
                if mode not in variants:
                    continue
                try:
                    run = build(xp, wp, scale, bias, TH, mode, False,
                                jnp.float32)
                    wmat = wp.reshape(9 * CP, CO)
                    ms = timeit(run, (xp, wmat, scale, bias))
                    got = np.asarray(run(xp, wmat, scale, bias))
                    err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
                    print(f"  pallas {mode:7s} TH={TH:2d}   {ms:8.3f} ms "
                          f"{flops / ms / 1e9:7.1f} TF/s  relerr={err:.2e}")
                except Exception as e:  # noqa: BLE001
                    print(f"  pallas {mode:7s} TH={TH:2d}   FAILED: "
                          f"{type(e).__name__}: {str(e)[:160]}")
        try:
            if "epi" not in variants:
                raise StopIteration("skipped")
            run = build(xp, wp, scale, bias, tile_hs[0], "im2col", True,
                        jnp.bfloat16)
            wmat = wp.reshape(9 * CP, CO)
            ms = timeit(run, (xp, wmat, scale, bias))
            print(f"  pallas im2col+epilogue  {ms:8.3f} ms "
                  f"{flops / ms / 1e9:7.1f} TF/s (bf16 out)")
        except Exception as e:  # noqa: BLE001
            print(f"  pallas im2col+epilogue  FAILED: "
                  f"{type(e).__name__}: {str(e)[:160]}")
        del x, w, xp, wp


if __name__ == "__main__":
    main()
