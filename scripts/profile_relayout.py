"""Measure: Pallas relayout kernels vs XLA's strided copies (VERDICT r3 #2).

Times space_to_depth / depth_to_space on the packed-CRN pipeline's real
shapes (vg128, batch from argv) three ways:
  xla    — the jnp reshape/transpose in nn/crn.py, jitted alone
  pallas — ops/pallas/relayout_kernel.py compiled via Mosaic
  copy   — a same-byte-count jnp copy (x + 0), the stream-rate ceiling
and reports ms + effective GB/s (bytes = in + out).  Decision bar
(NEXT_STEPS r3 #4): pallas >3x xla revives the packed CRN mode; anything
less closes it (ARCHITECTURE §7: even free relayouts roughly cancel the
measured conv wins).

Usage: python scripts/profile_relayout.py [batch] [variants]
       variants: comma-set of xla,pallas,copy (default all) — run few
       shapes per invocation to stay inside the tunnel compile budget.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from sg2im_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def sync(x):
    return float(x[(0,) * x.ndim].astype("float32"))  # tunnel-safe sync


def timeit(fn, args, iters=30):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


# Packed-mode relayouts at vg128 (dims 1024,512,256,128,64; layout 160ch,
# packed_min_res=32 -> stages 3,4,5 packed): s2d of each packed stage's
# layout level, d2s at the packed-chain boundaries/output.
SHAPES = {
    "s2d_L32": ("s2d", (32, 32, 160)),
    "s2d_L64": ("s2d", (64, 64, 160)),
    "s2d_L128": ("s2d", (128, 128, 160)),
    "d2s_s3out": ("d2s", (16, 16, 4 * 256)),
    "d2s_s4out": ("d2s", (32, 32, 4 * 128)),
    "d2s_s5out": ("d2s", (64, 64, 4 * 64)),
}


def main():
    import jax
    import jax.numpy as jnp

    from sg2im_tpu.nn.crn import depth_to_space, space_to_depth
    from sg2im_tpu.ops.pallas.relayout_kernel import (
        depth_to_space_pallas, space_to_depth_pallas)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    variants = (sys.argv[2].split(",") if len(sys.argv) > 2
                else ["xla", "pallas", "copy"])
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    rows = []
    print(f"batch={batch} dtype=bf16 backend={jax.default_backend()}")
    print(f"{'shape':<12}{'variant':<9}{'ms':>9}{'GB/s':>9}")
    for name, (kind, hw_c) in SHAPES.items():
        x = jnp.asarray(
            rng.randn(batch, *hw_c).astype(np.float32)).astype(dtype)
        nbytes = 2 * x.size * x.dtype.itemsize  # read + write
        fns = {}
        if kind == "s2d":
            fns["xla"] = jax.jit(space_to_depth)
            fns["pallas"] = jax.jit(
                lambda v: space_to_depth_pallas(v, interpret=False))
        else:
            fns["xla"] = jax.jit(depth_to_space)
            fns["pallas"] = jax.jit(
                lambda v: depth_to_space_pallas(v, interpret=False))
        fns["copy"] = jax.jit(lambda v: v + jnp.asarray(0, v.dtype))
        for variant in variants:
            if variant not in fns:
                continue
            try:
                ms = timeit(fns[variant], (x,))
            except Exception as e:
                print(f"{name:<12}{variant:<9}  FAILED: {type(e).__name__}:"
                      f" {str(e)[:120]}")
                rows.append({"shape": name, "variant": variant,
                             "error": str(e)[:300]})
                continue
            gbs = nbytes / (ms * 1e-3) / 1e9
            print(f"{name:<12}{variant:<9}{ms:>9.3f}{gbs:>9.1f}")
            rows.append({"shape": name, "variant": variant,
                         "ms": round(ms, 4), "gb_s": round(gbs, 1)})
    # correctness spot-check on-device for one shape per kind
    for name, (kind, hw_c) in (("s2d_L32", SHAPES["s2d_L32"]),
                               ("d2s_s4out", SHAPES["d2s_s4out"])):
        x = jnp.asarray(
            rng.randn(4, *hw_c).astype(np.float32)).astype(dtype)
        if kind == "s2d":
            a = np.asarray(space_to_depth(x).astype(jnp.float32))
            b = np.asarray(space_to_depth_pallas(
                x, interpret=False).astype(jnp.float32))
        else:
            a = np.asarray(depth_to_space(x).astype(jnp.float32))
            b = np.asarray(depth_to_space_pallas(
                x, interpret=False).astype(jnp.float32))
        assert (a == b).all(), f"compiled kernel mismatch on {name}"
        print(f"correctness {name}: OK (bit-identical to jnp)")
    print(json.dumps({"batch": batch, "rows": rows}))


if __name__ == "__main__":
    main()
