"""Per-stage CRN micro-profiler (real TPU).

Times each refinement stage in isolation — legacy (materialized nearest-2x
upsample + concat + conv3x3) vs fused (FusedUpsampleConv) — plus the pieces
of the fused path, to attribute end-to-end regressions/wins.

Usage: python scripts/profile_crn.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sync(x):
    return float(x.sum())


def timeit(fn, args, iters=20):
    out = fn(*args)
    sync(out)
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    LD = 160  # layout channels (gconv 128 + noise 32)
    stages = [  # (out_res, feats_in_ch, out_ch)
        (8, 1, 1024),
        (16, 1024, 512),
        (32, 512, 256),
        (64, 256, 128),
        (128, 128, 64),
    ]

    rng = np.random.RandomState(0)

    def upsample_nearest(x, k):
        N, H, W, C = x.shape
        y = jnp.broadcast_to(x[:, :, None, :, None, :], (N, H, k, W, k, C))
        return y.reshape(N, H * k, W * k, C)

    def conv(x, w, pad):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))

    total_legacy = total_fused = 0.0
    for (res, cf, co) in stages:
        R = res // 2
        layout = jnp.asarray(rng.randn(batch, res, res, LD), jnp.float32)
        feats = jnp.asarray(rng.randn(batch, R, R, cf), jnp.float32)
        W = jnp.asarray(rng.randn(3, 3, LD + cf, co) * 0.05, jnp.float32)

        @jax.jit
        def legacy(layout, feats, W):
            x = jnp.concatenate([layout, upsample_nearest(feats, 2)], -1)
            return conv(x, W, [(1, 1), (1, 1)])

        @jax.jit
        def fused(layout, feats, W):
            wl, wf = W[:, :, :LD], W[:, :, LD:]
            out = conv(layout, wl, [(1, 1), (1, 1)])
            T = jnp.asarray([[[1, 0, 0], [0, 1, 1]],
                             [[1, 1, 0], [0, 0, 1]]], jnp.float32)
            K = jnp.einsum("auk,bvl,klio->uviabo", T, T, wf)
            Kb = K.reshape(2, 2, wf.shape[2], 4 * co)
            N, R_, Rw, _ = feats.shape
            fpad = jnp.pad(feats, ((0, 0), (1, 1), (1, 1), (0, 0)))
            big = conv(fpad, Kb, "VALID").reshape(N, R_ + 1, Rw + 1, 2, 2, co)
            rows = [jnp.stack([big[:, a:a + R_, b:b + Rw, a, b]
                               for b in (0, 1)], axis=3) for a in (0, 1)]
            up = jnp.stack(rows, axis=2).reshape(N, 2 * R_, 2 * Rw, co)
            return out + up

        @jax.jit
        def layout_only(layout, W):
            return conv(layout, W[:, :, :LD], [(1, 1), (1, 1)])

        @jax.jit
        def feats_only(feats, W):
            wf = W[:, :, LD:]
            T = jnp.asarray([[[1, 0, 0], [0, 1, 1]],
                             [[1, 1, 0], [0, 0, 1]]], jnp.float32)
            K = jnp.einsum("auk,bvl,klio->uviabo", T, T, wf)
            Kb = K.reshape(2, 2, wf.shape[2], 4 * co)
            N, R_, Rw, _ = feats.shape
            fpad = jnp.pad(feats, ((0, 0), (1, 1), (1, 1), (0, 0)))
            return conv(fpad, Kb, "VALID")

        @jax.jit
        def interleave_only(big_in, out):
            big = big_in.reshape(batch, R + 1, R + 1, 2, 2, co)
            rows = [jnp.stack([big[:, a:a + R, b:b + R, a, b]
                               for b in (0, 1)], axis=3) for a in (0, 1)]
            up = jnp.stack(rows, axis=2).reshape(batch, res, res, co)
            return out + up

        tl = timeit(legacy, (layout, feats, W))
        tf = timeit(fused, (layout, feats, W))
        tlo = timeit(layout_only, (layout, W))
        tfo = timeit(feats_only, (feats, W))
        big = feats_only(feats, W)
        outl = layout_only(layout, W)
        til = timeit(interleave_only, (big, outl))
        total_legacy += tl
        total_fused += tf
        print(f"stage res={res:4d} cf={cf:5d} co={co:5d}: "
              f"legacy={tl:7.3f}ms fused={tf:7.3f}ms "
              f"[layout={tlo:6.3f} feats={tfo:6.3f} interleave={til:6.3f}]")

    print(f"TOTAL conv0s: legacy={total_legacy:.3f}ms fused={total_fused:.3f}ms")


if __name__ == "__main__":
    main()
