"""End-to-end turbo-tier measurement on the live chip: production serving
engine (bf16 + split + high Dense) vs the int8 turbo engine (calibrated
resident int8 CRN + rbg bf16 noise), at the bench configuration
(vg128-scale, batch 128, seeded in-program noise — the real serving path).

Also prints the raw-space PSNR of turbo vs the production engine on the
same inputs/zero noise — the quantization-error magnitude in isolation
(reference-parity PSNR comes from bench.py's harness).

Usage: python -u scripts/profile_turbo.py [batch] [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from sg2im_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from bench import flagship_config, flagship_setup

    from sg2im_tpu.data.batching import GraphBatch
    from sg2im_tpu.inference import InferenceEngine
    from sg2im_tpu.utils.metrics import psnr

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    vocab, mk = flagship_config()
    fwd, args = flagship_setup(batch)
    variables = args[0]
    gb = GraphBatch(objs=args[1], triples=args[2], obj_mask=args[3],
                    triple_mask=args[4])

    engines = {
        "prod": InferenceEngine(vocab, mk, variables),
        "turbo": InferenceEngine(vocab, mk, variables, quantize="int8",
                                 noise_impl="rbg",
                                 noise_dtype=jnp.bfloat16),
    }
    outs = {}
    for name, eng in engines.items():
        # First call calibrates the turbo engine on this batch (one extra
        # compile); second call runs the static program.
        float(eng.generate_batch(gb, seed=0)["imgs"].sum())
        float(eng.generate_batch(gb, seed=1)["imgs"].sum())
        t0 = time.perf_counter()
        for i in range(iters):
            out = eng.generate_batch(gb, seed=i + 2)
        float(out["imgs"].sum())
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:6s} {dt * 1e3:8.2f} ms/batch  "
              f"{batch / dt:8.1f} img/s", flush=True)
        outs[name] = np.asarray(
            eng.generate_batch(gb, noise="zeros")["imgs"], np.float32)

    p = psnr(outs["turbo"], outs["prod"], max_val=1.0)
    print(f"turbo-vs-prod raw PSNR (zero noise): {float(p):.2f} dB",
          flush=True)


if __name__ == "__main__":
    main()
