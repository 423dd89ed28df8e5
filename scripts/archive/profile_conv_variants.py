"""Variant shootout for the CRN's hot high-res conv (stage 5: 128x128,
288ch -> 64ch, batch 128).  Finds the fastest lowering on v5e.

Usage: python scripts/profile_conv_variants.py [batch]
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
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    H = W = 128
    CIN, CO = 288, 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, H, W, CIN), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, CIN, CO) * 0.05, jnp.float32)
    flops = 2 * batch * H * W * CIN * CO * 9

    def report(name, ms):
        print(f"{name:34s} {ms:8.3f} ms   {flops / ms / 1e9:7.1f} GF/s")

    @jax.jit
    def conv_nhwc_f32(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    report("conv NHWC f32", timeit(conv_nhwc_f32, (x, k)))

    @jax.jit
    def conv_nhwc_bf16(x, k):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return y

    report("conv NHWC bf16-in f32-acc", timeit(conv_nhwc_bf16, (x, k)))

    xb = x.astype(jnp.bfloat16)
    kb = k.astype(jnp.bfloat16)

    @jax.jit
    def conv_nhwc_bf16_pre(xb, kb):
        return jax.lax.conv_general_dilated(
            xb, kb, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    report("conv NHWC bf16 (pre-cast in HBM)", timeit(conv_nhwc_bf16_pre, (xb, kb)))

    @jax.jit
    def conv_nchw_f32(x, k):
        xn = x.transpose(0, 3, 1, 2)
        y = jax.lax.conv_general_dilated(
            xn, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "HWIO", "NCHW"))
        return y.transpose(0, 2, 3, 1)

    report("conv NCHW f32 (incl transposes)", timeit(conv_nchw_f32, (x, k)))

    # Pure matmul bound: what a perfectly-packed im2col would cost.
    xm = x.reshape(batch * H * W, CIN)
    km = jnp.asarray(rng.randn(CIN, CO * 9) * 0.05, jnp.float32)

    @jax.jit
    def mm(xm, km):
        return xm @ km

    ms = timeit(mm, (xm, km))
    print(f"{'matmul (BHW,288)@(288,576) f32':34s} {ms:8.3f} ms   "
          f"{2 * xm.shape[0] * CIN * CO * 9 / ms / 1e9:7.1f} GF/s")

    xmb = xm.astype(jnp.bfloat16)
    kmb = km.astype(jnp.bfloat16)

    @jax.jit
    def mmb(xmb, kmb):
        return jax.lax.dot(xmb, kmb, preferred_element_type=jnp.float32)

    ms = timeit(mmb, (xmb, kmb))
    print(f"{'matmul bf16':34s} {ms:8.3f} ms   "
          f"{2 * xm.shape[0] * CIN * CO * 9 / ms / 1e9:7.1f} GF/s")

    # 1x1-conv equivalence check: 3x3 conv as 9 shifted matmuls, summed.
    @jax.jit
    def conv_as_9mm(x, k):
        acc = jnp.zeros((batch, H, W, CO), jnp.float32)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        for dy in range(3):
            for dx in range(3):
                acc = acc + xp[:, dy:dy + H, dx:dx + W, :] @ k[dy, dx]
        return acc

    report("conv as 9 shifted matmuls f32", timeit(conv_as_9mm, (x, k)))


if __name__ == "__main__":
    main()
