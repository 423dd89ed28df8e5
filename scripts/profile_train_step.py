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

import numpy as np

from sg2im_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def make_batch(batch, num_objs=179, num_preds=7, O=16, T=24, hw=64):
    rng = np.random.RandomState(0)
    N = batch
    lo = rng.uniform(0, 0.5, (N, O, 2)).astype(np.float32)
    return {
        "imgs": rng.randn(N, hw, hw, 3).astype(np.float32),
        "objs": rng.randint(1, num_objs, (N, O)).astype(np.int32),
        "boxes": np.concatenate([lo, lo + 0.3], -1),
        "triples": np.stack(
            [rng.randint(0, 9, (N, T)), rng.randint(0, num_preds, (N, T)),
             rng.randint(0, 9, (N, T))], -1).astype(np.int32),
        "obj_mask": np.concatenate(
            [np.ones((N, 9), np.float32), np.zeros((N, O - 9), np.float32)],
            1),
        "triple_mask": np.ones((N, T), np.float32),
        "masks": (rng.rand(N, O, 16, 16) > 0.5).astype(np.float32),
    }


def build_trainer(batch, **cfg_extra):
    from sg2im_tpu.train.config import TrainConfig
    from sg2im_tpu.train.trainer import Trainer

    num_objs, num_preds = 179, 7
    vocab = {
        "object_idx_to_name": [f"o{i}" for i in range(num_objs)],
        "pred_idx_to_name": [f"p{i}" for i in range(num_preds)],
    }
    config = TrainConfig(dataset="coco", batch_size=batch,
                         image_size=(64, 64), pad_objects_to=16,
                         pad_triples_to=24, **cfg_extra)
    trainer = Trainer(config, vocab)
    state = trainer.init_state(seed=0)
    return trainer, state


def time_step(trainer, state, batch_d, iters):
    import jax

    batch_d = {k: jax.device_put(v) for k, v in batch_d.items()}
    state, m = trainer.step(state, dict(batch_d))
    float(m["total_loss"])  # compile + real sync through the tunnel
    state, m = trainer.step(state, dict(batch_d))
    float(m["total_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = trainer.step(state, dict(batch_d))
    float(m["total_loss"])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    results = {}

    # 1. Phase breakdown at the baseline config.
    trainer, state = build_trainer(32)
    bd = trainer.step_breakdown(state, make_batch(32))
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
        trainer, state = build_trainer(batch, **extra)
        dt = time_step(trainer, state, make_batch(batch), args.iters)
        ips = batch / dt
        results[name] = {"ms": round(dt * 1000, 2), "img_s": round(ips, 1)}
        print(f"{name:18s}: {dt * 1000:7.2f} ms/step = {ips:7.1f} img/s",
              flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
