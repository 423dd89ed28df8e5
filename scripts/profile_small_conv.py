"""Profile 3x3-conv formulations for the CRN's SMALL-SPATIAL stages.

PERF.json shows the early CRN stages far from both roofline bounds on
v5e (s1_conv0: 6.2 TF/s = 4% MXU, s1_conv1: 39.8%, s2_conv0: 53%): XLA's
native conv lowering tiles badly when H=W is 8-16 even though the
underlying GEMM (M = N*H*W = 8-32k rows) is MXU-shaped.  This measures
exact reformulations at the real vg128/b128 stage shapes:

  stock    lax.conv_general_dilated NHWC (what the model runs today)
  im2col   pad + 9 shifted slices -> (N*H*W, 9*C) @ (9*C, CO) single GEMM
           (materializes a 9x-wider input; only sane at tiny spatial)
  shifts   sum of 9 (N*H*W, C) @ (C, CO) GEMMs, one per tap (no 9x blowup)

plus the split-mode stage-1/2 compositions (two taps of different widths)
so the winner can be wired into FusedUpsampleConv.  All variants carry
the model's fused epilogue (f32 affine + leaky, cast bf16) so times are
comparable with PERF.json sections.  Every formulation is exact up to
sum reassociation (the 'split' mode's existing exactness class).

Usage: python -u scripts/profile_small_conv.py [batch] [cases]
       cases: comma-set of s1c0,s1c1,s2c0,s2c1,s3c0 (default all)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from roofline import measure, measure_dispatch_floor  # noqa: E402


def main():
    import jax.numpy as jnp

    from sg2im_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import roofline

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    pick = set((sys.argv[2] if len(sys.argv) > 2 else
                "s1c0,s1c1,s2c0,s2c1,s3c0").split(","))
    bf16 = jnp.bfloat16
    rng = np.random.RandomState(0)

    roofline._DISPATCH_FLOOR_MS = measure_dispatch_floor()
    print(f"dispatch floor {roofline._DISPATCH_FLOOR_MS:.2f} ms")

    def epilogue(y, scale, shift):
        y = y.astype(jnp.float32) * scale + shift
        return jnp.where(y > 0, y, 0.2 * y).astype(bf16)

    def conv_stock(x, k, scale, shift):
        import jax
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return epilogue(y, scale, shift)

    def _patches(x):
        N, H, W, C = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [xp[:, dy:dy + H, dx:dx + W, :]
                for dy in range(3) for dx in range(3)]
        return jnp.concatenate(cols, axis=-1).reshape(N * H * W, 9 * C)

    def conv_im2col(x, k, scale, shift):
        N, H, W, C = x.shape
        CO = k.shape[-1]
        p = _patches(x)
        y = p @ k.reshape(9 * C, CO)
        return epilogue(y.reshape(N, H, W, CO), scale, shift)

    def conv_shifts(x, k, scale, shift):
        N, H, W, C = x.shape
        CO = k.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = None
        for dy in range(3):
            for dx in range(3):
                sl = xp[:, dy:dy + H, dx:dx + W, :].reshape(N * H * W, C)
                t = sl @ k[dy, dx]
                y = t if y is None else y + t
        return epilogue(y.reshape(N, H, W, CO), scale, shift)

    def run_case(name, H, CIN, CO, widths=None):
        """widths: optional tap split (split mode runs one conv per input
        block instead of one conv over the concat)."""
        N = batch
        x = jnp.asarray(rng.randn(N, H, H, CIN), bf16)
        k = jnp.asarray(rng.randn(3, 3, CIN, CO) * 0.05, bf16)
        scale = jnp.asarray(rng.rand(CO), jnp.float32)
        shift = jnp.asarray(rng.rand(CO), jnp.float32)
        args = (x, k, scale, shift)
        res = {}
        for label, fn in (("stock", conv_stock), ("im2col", conv_im2col),
                          ("shifts", conv_shifts)):
            ms, fl, by = measure(f"{name}/{label}", fn, args, iters=20)
            res[label] = ms
            print(f"{name:6s} {label:7s} {ms:8.3f} ms"
                  f"  {(fl or 0) / 1e9:7.1f} GF  {(by or 0) / 1e6:6.0f} MB",
                  flush=True)
        if widths:
            # split composition: one stock conv per block, summed
            xs = [jnp.asarray(rng.randn(N, H, H, w), bf16) for w in widths]
            ks = [jnp.asarray(rng.randn(3, 3, w, CO) * 0.05, bf16)
                  for w in widths]

            def split_stock(scale, shift, *xk):
                n = len(xk) // 2
                import jax
                y = None
                for xi, ki in zip(xk[:n], xk[n:]):
                    t = jax.lax.conv_general_dilated(
                        xi, ki, (1, 1), [(1, 1), (1, 1)],
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    y = t if y is None else y + t
                return epilogue(y, scale, shift)

            def split_im2col(scale, shift, *xk):
                n = len(xk) // 2
                y = None
                for xi, ki in zip(xk[:n], xk[n:]):
                    Ni, Hi, Wi, Ci = xi.shape
                    t = _patches(xi) @ ki.reshape(9 * Ci, CO)
                    y = t if y is None else y + t
                return epilogue(y.reshape(N, H, H, CO), scale, shift)

            sargs = (scale, shift, *xs, *ks)
            for label, fn in (("sp-stock", split_stock),
                              ("sp-im2col", split_im2col)):
                ms, fl, by = measure(f"{name}/{label}", fn, sargs, iters=20)
                res[label] = ms
                print(f"{name:6s} {label:9s} {ms:6.3f} ms"
                      f"  {(fl or 0) / 1e9:7.1f} GF"
                      f"  {(by or 0) / 1e6:6.0f} MB", flush=True)
        return res

    # vg128/b128 production stage shapes (split mode):
    #   s1 conv0: layout 8x8x160 (+1ch zero feats)  -> 1024
    #   s1 conv1: 8x8x1024 -> 1024
    #   s2 conv0: layout 16x16x160 + up-feats 16x16x1024 -> 512
    #   s2 conv1: 16x16x512 -> 512
    #   s3 conv0: 32x32x(160+512) -> 256  (control: already 71% MXU)
    if "s1c0" in pick:
        run_case("s1c0", 8, 161, 1024, widths=(160, 1))
    if "s1c1" in pick:
        run_case("s1c1", 8, 1024, 1024)
    if "s2c0" in pick:
        run_case("s2c0", 16, 1184, 512, widths=(160, 1024))
    if "s2c1" in pick:
        run_case("s2c1", 16, 512, 512)
    if "s3c0" in pick:
        run_case("s3c0", 32, 672, 256, widths=(160, 512))


if __name__ == "__main__":
    main()
