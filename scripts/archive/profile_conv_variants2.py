"""Round 2 of the conv shootout: test the lane-waste theory (Co=64 vs 128),
shifted-matmul lowering, and transposed (channels-major) formulations.

Usage: python scripts/profile_conv_variants2.py [batch]
"""

from __future__ import annotations

import gc
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
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    del out
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    H = W = 128
    CIN = 288
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, H, W, CIN), jnp.float32)

    def report(name, ms, flops):
        print(f"{name:40s} {ms:8.3f} ms   {flops / ms / 1e12 * 1e3:7.1f} TF/s")

    for co in (64, 128):
        k = jnp.asarray(rng.randn(3, 3, CIN, co) * 0.05, jnp.float32)

        @jax.jit
        def conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        ms = timeit(conv, (x, k))
        report(f"conv NHWC f32 Co={co}", ms, 2 * batch * H * W * CIN * co * 9)
        del k
        gc.collect()

    co = 64
    k = jnp.asarray(rng.randn(3, 3, CIN, co) * 0.05, jnp.float32)
    flops = 2 * batch * H * W * CIN * co * 9

    @jax.jit
    def conv_as_9mm(x, k):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for dy in range(3):
            for dx in range(3):
                t = xp[:, dy:dy + H, dx:dx + W, :] @ k[dy, dx]
                acc = t if acc is None else acc + t
        return acc

    report("conv as 9 shifted matmuls f32", timeit(conv_as_9mm, (x, k)), flops)

    # Channels-major: x (CIN, B, H, W) "CNHW"-ish via conv dimension numbers.
    xt = jnp.asarray(
        np.moveaxis(np.asarray(x), 3, 0).copy())  # (CIN, B, H, W)

    @jax.jit
    def conv_cnhw(xt, k):
        # treat B as a spatial dim? No: use dimension_numbers with feature
        # first: input CNHW = ("CNHW" not std) -> emulate with NCHW on
        # transposed batch/feature: lhs (CIN, B, H, W) with N<->C swapped
        # means batch=CIN... invalid. Instead: merge (H W) and do explicit
        # matmuls per tap on (CIN, B*H*W).
        xf = xt.reshape(CIN, batch, H, W)
        xp = jnp.pad(xf, ((0, 0), (0, 0), (1, 1), (1, 1)))
        acc = None
        for dy in range(3):
            for dx in range(3):
                win = xp[:, :, dy:dy + H, dx:dx + W].reshape(CIN, -1)
                t = jax.lax.dot_general(
                    k[dy, dx], win, (((0,), (0,)), ((), ())))  # (co, BHW)
                acc = t if acc is None else acc + t
        return acc

    report("conv channels-major 9 matmuls f32",
           timeit(conv_cnhw, (xt, k)), flops)

    del xt
    gc.collect()

    # Elementwise cost scale: instance-norm + leakyrelu on (B,H,W,64).
    y = jnp.asarray(rng.randn(batch, H, W, co), jnp.float32)

    @jax.jit
    def inorm_act(y):
        mu = y.mean(axis=(1, 2), keepdims=True)
        var = y.var(axis=(1, 2), keepdims=True)
        z = (y - mu) * jax.lax.rsqrt(var + 1e-5)
        return jnp.where(z > 0, z, 0.2 * z)

    ms = timeit(inorm_act, (y,))
    print(f"{'instance-norm+leakyrelu (B,128,128,64)':40s} {ms:8.3f} ms")

    @jax.jit
    def bn_act(y):
        z = y * 1.1 + 0.3
        return jnp.where(z > 0, z, 0.2 * z)

    ms = timeit(bn_act, (y,))
    print(f"{'affine+leakyrelu (B,128,128,64)':40s} {ms:8.3f} ms")

    # conv1 (64->64) cost at this res
    k1 = jnp.asarray(rng.randn(3, 3, co, co) * 0.05, jnp.float32)

    @jax.jit
    def conv1(y, k1):
        return jax.lax.conv_general_dilated(
            y, k1, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    report("conv1 NHWC f32 64->64 @128^2",
           timeit(conv1, (y, k1)), 2 * batch * H * W * co * co * 9)


if __name__ == "__main__":
    main()
