"""Probe: packed-domain (space-to-depth) CRN conv shapes vs the stock ones.

The CRN's 3x3 convs run at 57-79 TF/s under XLA (ARCHITECTURE §7): the
measured ceiling tracks the small output-channel count (CO=64..256 lanes)
and the per-tap K-pass schedule.  Reformulating each stage in the 2x2
space-to-depth domain — operate at half resolution with 4x channels; a
3x3 'same' conv on the fine grid becomes a 2x2 VALID conv with
(4*CIN -> 4*CO) channels on the packed grid — costs 16/9x the FLOPs on
distinct-phase inputs but turns every conv into a big-K / big-N matmul.
The upsampled-feats branch of conv0 has *aliased* phases (nearest-2x
broadcast), so its packed kernel needs only CIN input channels: 16/36 of
the stock FLOPs (same math as FusedUpsampleConv 'phase' mode, but with no
depth-to-space interleave between stages — the chain stays packed).

This probe times, per vg128 CRN stage (batch from argv, default 128):
  stock  : conv0 3x3 (L+C -> CO) @ res, conv1 3x3 (CO -> CO) @ res
  packed : conv0 2x2 (C + 4L -> 4CO) @ res/2, conv1 2x2 (4CO -> 4CO) @ res/2
and reports the effective TF/s normalized to the STOCK flop count, so
"packed wins" iff its effective TF/s is higher.

Usage: python scripts/profile_packed_conv.py [batch] [stage_indices]
       [variants]
       (stages comma-separated into STAGES, default "4,5"; variants a
        comma-set of stock0,packed0,stock1,packed1,d2s — run few shapes
        per invocation to stay inside the tunnel compile budget)
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


# vg128 CRN: dims=(1024,512,256,128,64), layout_dim L=160 (128 vec + 32
# noise).  Stage i outputs CO=dims[i] at res 2^i * 4.  input feats C.
STAGES = [
    # (stage, res, L, C_feats, CO)
    (1, 8, 160, 1, 1024),
    (2, 16, 160, 1024, 512),
    (3, 32, 160, 512, 256),
    (4, 64, 160, 256, 128),
    (5, 128, 160, 128, 64),
]


def main():
    import jax
    import jax.numpy as jnp

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    pick = [int(s) for s in (sys.argv[2] if len(sys.argv) > 2
                             else "4,5").split(",")]
    variants = set((sys.argv[3] if len(sys.argv) > 3
                    else "stock0,packed0,stock1,packed1,d2s").split(","))
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)

    def conv(x, k, padding):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    conv_same = jax.jit(lambda x, k: conv(x, k, [(1, 1), (1, 1)]))
    conv_valid = jax.jit(lambda x, k: conv(x, k, "VALID"))

    for (s, res, L, C, CO) in STAGES:
        if s not in pick:
            continue
        R = res // 2
        cin = L + C
        stock0 = 2 * batch * res * res * 9 * cin * CO
        stock1 = 2 * batch * res * res * 9 * CO * CO

        if "stock0" in variants:
            # Stock conv0 at full res (upsampled feats materialized).
            x0 = jnp.asarray(rng.randn(batch, res, res, cin), dt)
            k0 = jnp.asarray(rng.randn(3, 3, cin, CO) * 0.05, dt)
            ms = timeit(conv_same, (x0, k0))
            print(f"stage{s} stock  conv0 3x3 {cin:4d}->{CO:4d} @{res:3d}^2 "
                  f"{ms:8.3f} ms  {stock0 / ms / 1e9:6.1f} TF/s")
            del x0, k0

        if "packed0" in variants:
            # Packed conv0: feats branch C in-ch (phases aliased) + 4L.
            xp = jnp.asarray(rng.randn(batch, R + 1, R + 1, C + 4 * L), dt)
            kp = jnp.asarray(
                rng.randn(2, 2, C + 4 * L, 4 * CO) * 0.05, dt)
            ms = timeit(conv_valid, (xp, kp))
            eff = stock0 / ms / 1e9
            raw = 2 * batch * R * R * 4 * (C + 4 * L) * 4 * CO / ms / 1e9
            print(f"stage{s} packed conv0 2x2 {C + 4 * L:4d}->{4 * CO:4d} "
                  f"@{R:3d}^2 {ms:8.3f} ms  {eff:6.1f} TF/s-effective "
                  f"({raw:6.1f} raw)")
            del xp, kp

        if "stock1" in variants:
            x1 = jnp.asarray(rng.randn(batch, res, res, CO), dt)
            k1 = jnp.asarray(rng.randn(3, 3, CO, CO) * 0.05, dt)
            ms = timeit(conv_same, (x1, k1))
            print(f"stage{s} stock  conv1 3x3 {CO:4d}->{CO:4d} @{res:3d}^2 "
                  f"{ms:8.3f} ms  {stock1 / ms / 1e9:6.1f} TF/s")
            del x1, k1

        if "packed1" in variants:
            # Packed conv1: all phases distinct -> 4CO -> 4CO.
            xq = jnp.asarray(rng.randn(batch, R + 1, R + 1, 4 * CO), dt)
            kq = jnp.asarray(rng.randn(2, 2, 4 * CO, 4 * CO) * 0.05, dt)
            ms = timeit(conv_valid, (xq, kq))
            eff = stock1 / ms / 1e9
            raw = 2 * batch * R * R * 4 * 4 * CO * 4 * CO / ms / 1e9
            print(f"stage{s} packed conv1 2x2 {4 * CO:4d}->{4 * CO:4d} "
                  f"@{R:3d}^2 {ms:8.3f} ms  {eff:6.1f} TF/s-effective "
                  f"({raw:6.1f} raw)")
            del xq, kq

        if "d2s" in variants:
            # Stage-boundary depth-to-space: packed output -> fine-grid
            # feats for the next stage (the only interleave the packed
            # chain needs).
            def d2s(q):
                N, Rr, _, C4 = q.shape
                c = C4 // 4
                return q.reshape(N, Rr, Rr, 2, 2, c).transpose(
                    0, 1, 3, 2, 4, 5).reshape(N, 2 * Rr, 2 * Rr, c)

            xq = jnp.asarray(rng.randn(batch, R, R, 4 * CO), dt)
            f = jax.jit(d2s)
            ms = timeit(f, (xq,))
            gb = xq.size * xq.dtype.itemsize * 2 / 1e9
            print(f"stage{s} d2s {4 * CO:4d}ch @{R:3d}^2 -> {CO:4d}ch "
                  f"@{2 * R:3d}^2  {ms:8.3f} ms  ({gb / (ms / 1e3):5.1f} "
                  f"GB/s)")
            del xq


if __name__ == "__main__":
    main()
