"""Measure the serving noise path: eager-noise upload vs in-program draw.

Compares, at flagship (vg128) scale and serving batch 128, the
pre-round-3 serving sequence for noise='random' requests —

  (a) eager: dispatch jax.random.normal(PRNGKey(seed), (N,H,W,32)) as its
      own device program (268 MB f32 materialized in HBM), then run the
      jitted forward reading it back;

against the round-3 path —

  (b) seeded: pass the PRNGKey into the jitted forward and draw the noise
      inside the program (InferenceEngine._fwd_seeded), where generation
      fuses into the bf16 consumer chain and the f32 tensor never exists
      in HBM.

Both produce bit-identical images (test_engine_seeded_noise_matches_
explicit).  Run on the real TPU in the background (tunnel discipline:
no timeout, sync via float(x.sum())).

MEASURED (v5e, vg128, b128, bf16+split+high serving mode, 2026-08-18):
  eager (device-resident draw + fwd): 32.06 ms/b128 = 3992 img/s
  seeded (in-program draw):           32.10 ms/b128 = 3987 img/s
  bit_identical: true
Conclusion: throughput-NEUTRAL — the separate eager dispatch overlaps
with the forward, so in-program generation wins no wall-clock here.  The
seeded path is kept as the serving default for its dispatch-count and
API-safety properties, NOT as a perf claim.  The measurement that DID
matter: before round 3, generate_batch's explicit-array branch called
np.asarray on already-device-resident noise, forcing a 268 MB D2H+H2D
round trip (~22 s through this container's tunnel) — now fixed to pass
jax.Array noise through untouched.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sg2im_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from bench import flagship_setup

    from sg2im_tpu.inference import InferenceEngine

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))

    # Reuse bench's flagship model/config (incl. bf16 + split + high-Dense
    # production serving mode) but drive it through the engine's two
    # noise paths.
    fwd, args = flagship_setup(batch)
    variables, objs, triples, obj_mask, triple_mask, _ = args
    from bench import flagship_config

    vocab, model_kwargs = flagship_config()
    engine = InferenceEngine(vocab, model_kwargs, variables)

    from sg2im_tpu.data.batching import GraphBatch

    gb = GraphBatch(objs=np.asarray(objs), triples=np.asarray(triples),
                    obj_mask=np.asarray(obj_mask),
                    triple_mask=np.asarray(triple_mask))

    def sync(out):
        return float(out["imgs"].sum())

    def time_path(noise_mode: str):
        """noise_mode 'eager': explicit normal upload per call (old path,
        drawn on device each iteration like pre-round-3 generate_batch
        did); 'seeded': in-program draw."""
        H, W = 128, 128

        def once(seed):
            if noise_mode == "eager":
                noise = jax.random.normal(
                    jax.random.PRNGKey(seed), (batch, H, W, 32),
                    dtype=jnp.float32)
                return engine.generate_batch(gb, noise=noise)
            return engine.generate_batch(gb, noise=None, seed=seed)

        sync(once(0))  # compile
        sync(once(1))  # warm
        t0 = time.perf_counter()
        out = None
        for i in range(iters):
            out = once(i + 2)
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        return dt

    results = {}
    for mode in ("eager", "seeded"):
        dt = time_path(mode)
        results[f"{mode}_ms_b{batch}"] = round(dt * 1000, 2)
        results[f"{mode}_img_s"] = round(batch / dt, 1)
        print(f"{mode}: {dt*1e3:.2f} ms/b{batch} = {batch/dt:.1f} img/s",
              flush=True)

    # bit-identity probe at flagship scale (seed 5)
    noise = jax.random.normal(jax.random.PRNGKey(5),
                              (batch, 128, 128, 32), dtype=jnp.float32)
    a = np.asarray(engine.generate_batch(gb, noise=noise)["imgs"][:2])
    b = np.asarray(engine.generate_batch(gb, noise=None, seed=5)["imgs"][:2])
    results["bit_identical"] = bool(np.array_equal(a, b))
    results["speedup_pct"] = round(
        100.0 * (results[f"eager_ms_b{batch}"]
                 / results[f"seeded_ms_b{batch}"] - 1.0), 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
