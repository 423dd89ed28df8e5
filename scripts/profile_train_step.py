"""Train-step profile: phase breakdown + config levers, one TPU process.

Measures, at the flagship COCO-64 GAN train config (the CPU-baseline
shape, bench.py::train_step_setup):
  1. per-phase device times (G fwd / G fwd+bwd / D_obj / D_img) via
     Trainer.step_breakdown,
  2. the full jitted step under config levers: f32-legacy (baseline),
     --bf16_compute, --crn_mode split, both, and batch 64/128 scaling.

All variants run inside ONE process (tunnel discipline: never two TPU
processes; batch the jit variants).  Results print as a markdown table
+ one JSON line for the docs.

Usage: python -u scripts/profile_train_step.py [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sg2im_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

# The flagship trainer/batch construction lives in bench.py so the
# profile and the driver-captured bench numbers can never desynchronize.
from bench import train_step_setup  # noqa: E402


def time_step(trainer, state, batch_d, iters):
    import jax

    batch_d = {k: jax.device_put(v) for k, v in batch_d.items()}  # staged
    state, m = trainer.step(state, dict(batch_d))
    float(m["total_loss"])  # compile + real sync through the tunnel
    state, m = trainer.step(state, dict(batch_d))
    float(m["total_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = trainer.step(state, dict(batch_d))
    float(m["total_loss"])
    return (time.perf_counter() - t0) / iters


def roofline(trainer, state, batch_d, ms):
    """FLOPs / HBM bytes of the jitted GAN step from XLA's own post-fusion
    cost model, as achieved TF/s and GB/s vs the PERF.json measured peaks
    (same methodology as scripts/roofline.py's forward sections)."""
    import jax

    batch_d = {k: jax.device_put(v) for k, v in batch_d.items()}
    compiled = jax.jit(
        lambda s, b: trainer.train_step(s, b, eval_mode=False)
    ).lower(state, batch_d).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops, bytes_ = ca.get("flops"), ca.get("bytes accessed")
    peaks = {}
    perf_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PERF.json")
    if os.path.exists(perf_path):
        with open(perf_path) as f:
            peaks = json.load(f).get("peaks", {})
    mm = peaks.get("bf16_matmul_tflops_s", 153.4)
    hbm = peaks.get("hbm_copy_gb_s", 464.9)
    tfs = flops / (ms / 1e3) / 1e12
    gbs = bytes_ / (ms / 1e3) / 1e9
    return {"gflops": round(flops / 1e9, 1),
            "mbytes": round(bytes_ / 1e6, 1),
            "tflops_s": round(tfs, 1), "gb_s": round(gbs, 1),
            "pct_mxu_peak": round(100 * tfs / mm, 1),
            "pct_hbm_peak": round(100 * gbs / hbm, 1),
            "bound": "mxu" if tfs / mm >= gbs / hbm else "hbm"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--roofline", type=int, default=1,
                    help="1: include FLOPs/bytes roofline rows for the "
                         "baseline and fast configs")
    args = ap.parse_args()

    results = {}

    # 1. Phase breakdown at the baseline config.  NOTE: each phase is
    # timed with a single fenced call — through the axon tunnel these
    # carry ~100 ms of round-trip latency each, so treat them as relative
    # indications only; the looped variants below are the real numbers.
    trainer, state, batch_d = train_step_setup(32)
    bd = trainer.step_breakdown(state, batch_d)
    print("phase breakdown b32 f32-legacy (ms):",
          {k: round(v, 2) for k, v in bd.items()}, flush=True)
    results["phase_ms_b32"] = {k: round(v, 3) for k, v in bd.items()}

    # 2. Config levers at b32 + batch scaling at the winning config.
    variants = [
        ("b32_f32_legacy", 32, {}),
        ("b32_bf16", 32, {"bf16_compute": True}),
        ("b32_split", 32, {"crn_mode": "split"}),
        ("b32_bf16_split", 32, {"bf16_compute": True, "crn_mode": "split"}),
        ("b64_f32_legacy", 64, {}),
        ("b128_f32_legacy", 128, {}),
        ("b128_bf16_split", 128,
         {"bf16_compute": True, "crn_mode": "split"}),
    ]
    for name, batch, extra in variants:
        trainer, state, batch_d = train_step_setup(batch, **extra)
        dt = time_step(trainer, state, batch_d, args.iters)
        ips = batch / dt
        results[name] = {"ms": round(dt * 1000, 2), "img_s": round(ips, 1)}
        print(f"{name:18s}: {dt * 1000:7.2f} ms/step = {ips:7.1f} img/s",
              flush=True)
        if args.roofline and name in ("b32_f32_legacy", "b32_bf16_split",
                                      "b128_bf16_split"):
            try:
                results[name].update(roofline(trainer, state, batch_d,
                                              dt * 1000))
                print(f"  roofline: {results[name]}", flush=True)
            except Exception as e:  # pragma: no cover
                print(f"  (roofline unavailable: {e!r})", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
