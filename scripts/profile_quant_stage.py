"""Shoot-out of int8 formulations for the high-res CRN stages (turbo tier).

scripts/profile_int8_rng.py established the primitive rates on v5e:
int8 conv runs 1.34-1.7x bf16 when its inputs are ALREADY int8, but
per-conv dynamic quantization (bf16 -> max -> round -> int8 before every
conv) pays an extra materialization pass that makes it a net LOSS on the
HBM-bound stage-5 shape (6.52 ms vs 5.35 bf16).  This script measures the
three candidate stage formulations end-to-end at the PRODUCTION shapes
(split mode, BN-eval affine epilogues, vg128/b128) so the turbo tier can
be built on numbers, not extrapolation:

  bf16      — the current production stage (baseline).
  dynq      — per-conv dynamic int8 (expected loser; kept as the control).
  resident  — int8-RESIDENT chain: feats arrive int8 with a static scale,
              nearest-upsample stays int8 (pure indexing), every conv runs
              on the int8 MXU path, and each norm/act epilogue emits int8
              directly (static bound folded into the quantize) — no extra
              passes anywhere.  The layout branch stays bf16.
  resident_ql — resident + the layout branch also int8 (pre-quantized
              levels; measures the ceiling if the pyramid is quantized).

Usage: python -u scripts/profile_quant_stage.py [batch] [stages]
       stages: comma-set of s4,s5,head (default all)
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
    pick = set((sys.argv[2] if len(sys.argv) > 2 else "s2,s3,s4,s5,head")
               .split(","))
    rng = np.random.RandomState(0)
    bf16 = jnp.bfloat16

    roofline._DISPATCH_FLOOR_MS = measure_dispatch_floor()
    print(f"dispatch floor {roofline._DISPATCH_FLOOR_MS:.2f} ms", flush=True)

    def conv(x, k, prefer=None):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=prefer)

    def upsample(x):
        N, H, W, C = x.shape
        return jnp.broadcast_to(x[:, :, None, :, None, :],
                                (N, H, 2, W, 2, C)).reshape(N, 2 * H,
                                                            2 * W, C)

    def qweight(k):
        sw = np.abs(k).max(axis=(0, 1, 2)).clip(1e-30) / 127.0
        kq = np.clip(np.round(k / sw), -127, 127).astype(np.int8)
        return jnp.asarray(kq), jnp.asarray(sw, np.float32)

    def quant_dyn(x):
        xf = x.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-30) / 127.0
        return jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8), s

    # One production stage: split conv0 (layout branch + up-feats branch),
    # BN-eval affine + leaky epilogue, conv1, same epilogue.
    def make_stage(s, R, L, CIN, CO, emit_int8_out):
        kl = rng.randn(3, 3, L, CO).astype(np.float32) * 0.05
        kf = rng.randn(3, 3, CIN, CO).astype(np.float32) * 0.05
        k1 = rng.randn(3, 3, CO, CO).astype(np.float32) * 0.05
        a0 = jnp.asarray(rng.rand(CO) + 0.5, jnp.float32)
        b0 = jnp.asarray(rng.rand(CO) - 0.5, jnp.float32)
        a1 = jnp.asarray(rng.rand(CO) + 0.5, jnp.float32)
        b1 = jnp.asarray(rng.rand(CO) - 0.5, jnp.float32)
        layout = jnp.asarray(rng.randn(batch, R, R, L), bf16)
        feats_f = jnp.asarray(rng.randn(batch, R // 2, R // 2, CIN), bf16)
        feats_q = jnp.asarray(
            rng.randint(-127, 128, (batch, R // 2, R // 2, CIN)), jnp.int8)
        layout_q = jnp.asarray(
            rng.randint(-127, 128, (batch, R, R, L)), jnp.int8)
        s_in = np.float32(6.0 / 127.0)
        s_lay = np.float32(4.0 / 127.0)
        s_out = 6.0 / 127.0  # static epilogue bound (K=6 sigma)

        klb, kfb, k1b = (jnp.asarray(k, bf16) for k in (kl, kf, k1))
        klq, swl = qweight(kl)
        kfq, swf = qweight(kf)
        k1q, sw1 = qweight(k1)

        def epi(y, a, b):
            y = y.astype(jnp.float32) * a + b
            return jnp.where(y > 0, y, 0.2 * y)

        def emit(y):
            if emit_int8_out:
                return jnp.clip(jnp.round(y / s_out), -127,
                                127).astype(jnp.int8)
            return y.astype(bf16)

        def stage_bf16(layout, feats):
            up = upsample(feats)
            y = conv(layout, klb) + conv(up, kfb)
            x = epi(y, a0, b0).astype(bf16)
            return emit(epi(conv(x, k1b), a1, b1))

        def stage_dynq(layout, feats):
            up = upsample(feats)
            lq, sl = quant_dyn(layout)
            uq, su = quant_dyn(up)
            y = (conv(lq, klq, jnp.int32).astype(jnp.float32) * (sl * swl)
                 + conv(uq, kfq, jnp.int32).astype(jnp.float32) * (su * swf))
            x = epi(y, a0, b0)
            xq, sx = quant_dyn(x)
            y1 = conv(xq, k1q, jnp.int32).astype(jnp.float32) * (sx * sw1)
            return emit(epi(y1, a1, b1))

        def stage_resident(layout, feats_q):
            up = upsample(feats_q)  # int8 indexing, no arithmetic
            y = (conv(layout, klb).astype(jnp.float32)
                 + conv(up, kfq, jnp.int32).astype(jnp.float32)
                 * (s_in * swf))
            x = epi(y, a0, b0)
            xq = jnp.clip(jnp.round(x / s_out), -127, 127).astype(jnp.int8)
            y1 = (conv(xq, k1q, jnp.int32).astype(jnp.float32)
                  * (np.float32(s_out) * sw1))
            return emit(epi(y1, a1, b1))

        def stage_resident_ql(layout_q, feats_q):
            up = upsample(feats_q)
            y = (conv(layout_q, klq, jnp.int32).astype(jnp.float32)
                 * (s_lay * swl)
                 + conv(up, kfq, jnp.int32).astype(jnp.float32)
                 * (s_in * swf))
            x = epi(y, a0, b0)
            xq = jnp.clip(jnp.round(x / s_out), -127, 127).astype(jnp.int8)
            y1 = (conv(xq, k1q, jnp.int32).astype(jnp.float32)
                  * (np.float32(s_out) * sw1))
            return emit(epi(y1, a1, b1))

        return [("bf16", stage_bf16, (layout, feats_f)),
                ("dynq", stage_dynq, (layout, feats_f)),
                ("resident", stage_resident, (layout, feats_q)),
                ("resident_ql", stage_resident_ql, (layout_q, feats_q))]

    stages = {
        # (R, L, CIN, CO) at vg128/b128 split-mode shapes
        "s2": (16, 160, 1024, 512),
        "s3": (32, 160, 512, 256),
        "s4": (64, 160, 256, 128),
        "s5": (128, 160, 128, 64),
    }
    for name, (R, L, CIN, CO) in stages.items():
        if name not in pick:
            continue
        for label, fn, args in make_stage(name, R, L, CIN, CO, True):
            ms, fl, by = measure(f"{name}_{label}", fn, args, iters=10)
            print(f"{name} {label:12s} {ms:8.3f} ms  "
                  f"{(fl or 0) / 1e9:7.1f} GF  {(by or 0) / 1e6:6.0f} MB",
                  flush=True)

    if "head" in pick:
        # Output head: conv3x3 64->64 @128^2 + leaky + conv1x1 64->3.
        CO = 64
        k0 = rng.randn(3, 3, CO, CO).astype(np.float32) * 0.05
        k2 = rng.randn(1, 1, CO, 3).astype(np.float32) * 0.05
        k0b = jnp.asarray(k0, bf16)
        k2b = jnp.asarray(k2, bf16)
        k0q, sw0 = qweight(k0)
        x_f = jnp.asarray(rng.randn(batch, 128, 128, CO), bf16)
        x_q = jnp.asarray(rng.randint(-127, 128, (batch, 128, 128, CO)),
                          jnp.int8)
        s_in = np.float32(6.0 / 127.0)

        def head_bf16(x):
            y = conv(x, k0b).astype(jnp.float32)
            y = jnp.where(y > 0, y, 0.2 * y).astype(bf16)
            return conv(y, k2b)

        def head_resident(xq):
            y = (conv(xq, k0q, jnp.int32).astype(jnp.float32)
                 * (s_in * sw0))
            y = jnp.where(y > 0, y, 0.2 * y).astype(bf16)
            return conv(y, k2b)

        for label, fn, args in (("bf16", head_bf16, (x_f,)),
                                ("resident", head_resident, (x_q,))):
            ms, fl, by = measure(f"head_{label}", fn, args, iters=10)
            print(f"head {label:12s} {ms:8.3f} ms  "
                  f"{(fl or 0) / 1e9:7.1f} GF  {(by or 0) / 1e6:6.0f} MB",
                  flush=True)


if __name__ == "__main__":
    main()
