"""Probe two candidate perf levers on the live chip (one batched run):

1. int8 MXU rate: does XLA reach the 2x-bf16 int8 systolic path through
   dot_general / conv_general_dilated on v5e?  Measured on a big square
   matmul and on the CRN stage-5 conv shape (the e2e forward's largest
   HBM-bound section) including the quantize/dequantize epilogues a real
   int8 serving tier would pay.

2. RNG rate for the serving layout-noise draw ((N,128,128,32) normals,
   67M elements at b128 — the attributed ~6% serve-vs-raw gap):
   threefry (default, reproducibility contract) vs 'rbg' impl vs
   drawing bf16 normals directly.

Usage: python -u scripts/profile_int8_rng.py [batch] [cases]
       cases: comma-set of mm,conv,rng (default all)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from roofline import measure, measure_dispatch_floor  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from sg2im_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import roofline

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    pick = set((sys.argv[2] if len(sys.argv) > 2 else
                "mm,conv,rng").split(","))
    rng = np.random.RandomState(0)

    roofline._DISPATCH_FLOOR_MS = measure_dispatch_floor()
    print(f"dispatch floor {roofline._DISPATCH_FLOOR_MS:.2f} ms")

    if "mm" in pick:
        K = 8192
        for dt, acc in ((jnp.bfloat16, jnp.float32), (jnp.int8, jnp.int32)):
            if dt == jnp.int8:
                a = jnp.asarray(rng.randint(-127, 127, (K, K)), dt)
                b = jnp.asarray(rng.randint(-127, 127, (K, K)), dt)
            else:
                a = jnp.asarray(rng.randn(K, K), dt)
                b = jnp.asarray(rng.randn(K, K), dt)

            def mm(x, y, acc=acc):
                return jax.lax.dot_general(
                    x, y, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc)

            ms, _, _ = measure(f"mm_{dt.__name__}", mm, (a, b), iters=10)
            print(f"mm {dt.__name__:8s} {ms:8.3f} ms  "
                  f"{2 * K**3 / (ms / 1e3) / 1e12:7.1f} TF/s", flush=True)

    if "conv" in pick:
        # CRN stage-5 conv0 shape (vg128/b128 split mode): the up-feats
        # branch (N,128,128,128)->64 is the big one; epilogue = affine+leaky.
        N, H, CIN, CO = batch, 128, 128, 64
        scale = jnp.asarray(rng.rand(CO), jnp.float32)
        shift = jnp.asarray(rng.rand(CO), jnp.float32)

        def epi(y):
            y = y.astype(jnp.float32) * scale + shift
            return jnp.where(y > 0, y, 0.2 * y)

        xf = jnp.asarray(rng.randn(N, H, H, CIN), jnp.bfloat16)
        kf = jnp.asarray(rng.randn(3, 3, CIN, CO) * 0.05, jnp.bfloat16)

        def conv_bf16(x, k):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return epi(y).astype(jnp.bfloat16)

        ms, fl, by = measure("conv_bf16", conv_bf16, (xf, kf), iters=10)
        print(f"conv bf16     {ms:8.3f} ms  {(fl or 0) / 1e9:7.1f} GF  "
              f"{(by or 0) / 1e6:6.0f} MB", flush=True)

        xi = jnp.asarray(rng.randint(-127, 127, (N, H, H, CIN)), jnp.int8)
        ki = jnp.asarray(rng.randint(-127, 127, (3, 3, CIN, CO)), jnp.int8)
        kscale = jnp.asarray(rng.rand(CO) * 1e-3, jnp.float32)

        def conv_int8(x, k):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return epi(y.astype(jnp.float32) * kscale).astype(jnp.int8)

        ms, fl, by = measure("conv_int8", conv_int8, (xi, ki), iters=10)
        print(f"conv int8     {ms:8.3f} ms  {(fl or 0) / 1e9:7.1f} GF  "
              f"{(by or 0) / 1e6:6.0f} MB", flush=True)

        # int8 conv INCLUDING dynamic activation quantization from bf16
        # (what a real int8 tier pays between stages if activations stay
        # bf16 in HBM).
        def conv_int8_dynq(x, k):
            m = jnp.max(jnp.abs(x.astype(jnp.float32)))
            s = m / 127.0
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                          -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return epi(y.astype(jnp.float32) * (kscale * s)
                       ).astype(jnp.bfloat16)

        ms, fl, by = measure("conv_int8_dynq", conv_int8_dynq, (xf, ki),
                             iters=10)
        print(f"conv int8+dynq{ms:8.3f} ms  {(fl or 0) / 1e9:7.1f} GF  "
              f"{(by or 0) / 1e6:6.0f} MB", flush=True)

    if "rng" in pick:
        N = batch
        shape = (N, 128, 128, 32)
        seed = jnp.int32(7)

        def draw_threefry(s):
            return jax.random.normal(jax.random.PRNGKey(s), shape,
                                     jnp.float32)

        def draw_threefry_bf16(s):
            return jax.random.normal(jax.random.PRNGKey(s), shape,
                                     jnp.bfloat16)

        def draw_rbg(s):
            key = jax.random.key(s, impl="rbg")
            return jax.random.normal(key, shape, jnp.float32)

        def draw_rbg_bf16(s):
            key = jax.random.key(s, impl="rbg")
            return jax.random.normal(key, shape, jnp.bfloat16)

        for label, fn in (("threefry_f32", draw_threefry),
                          ("threefry_bf16", draw_threefry_bf16),
                          ("rbg_f32", draw_rbg),
                          ("rbg_bf16", draw_rbg_bf16)):
            try:
                ms, fl, by = measure(f"rng_{label}", fn, (seed,), iters=10)
                el = int(np.prod(shape))
                print(f"rng {label:14s} {ms:8.3f} ms  "
                      f"{el / (ms / 1e3) / 1e9:6.1f} Gelem/s  "
                      f"{(by or 0) / 1e6:6.0f} MB", flush=True)
            except Exception as e:
                print(f"rng {label:14s} FAILED: {e!r}", flush=True)


if __name__ == "__main__":
    main()
