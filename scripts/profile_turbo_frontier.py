"""TURBO selective-quantization frontier (VERDICT r4 weak-#2 / next-#3).

The round-4 turbo tier quantizes CRN stages s3/s4/s5 AND the output
head's 3x3 — its gate field sat at 40.15 dB u8, 0.15 dB above the 40 dB
north-star bar.  This sweep measures the fidelity-vs-throughput frontier
of SELECTIVE quantization (exempting the head 3x3 and/or the highest-res
stages — standard int8 practice exempts first/last layers) in ONE TPU
process:

  per config:  u8 PSNR vs the in-process torch reference, measured
               production-shaped (calibrate on half the gate graphs,
               score the STATIC serving program on all of them), and
               serving throughput (seeded rbg-noise path, b128, median
               of BENCH_REPEATS windows).

Writes the table to stdout and /tmp/turbo_frontier.json; the adopted
config is wired as the serve CLI / bench default and the frontier goes
into SERVING.md.

Usage: python scripts/profile_turbo_frontier.py  (run in background —
CLAUDE.md tunnel discipline)
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

CONFIGS = [
    # (name, quant_opts, note).  Since the round-5 adoption the ENGINE
    # default is {'max_res': 64} (the s5_exempt row below); every row
    # here spells its band out explicitly so re-runs measure the same
    # configs regardless of what the default is.
    ("turbo_r4", {"max_res": None}, "s3/s4/s5 + head 3x3 (round-4 tier)"),
    ("head_exempt", {"head": False, "max_res": None},
     "s3/s4/s5, head unquantized"),
    ("s5_exempt", {"max_res": 64},
     "s3/s4 only (head follows: unquantized) — ADOPTED as the default"),
    ("s3s4_only_head", {"max_res": 64, "head": True},
     "same as s5_exempt (head needs the last stage quantized)"),
]

# Round-5 element-reduction levers (VERDICT r4 #6), measured as extra
# engine kwargs on top of a base row.  noise_downsample changes the
# seeded-noise DISTRIBUTION (block-constant fxf tiles), not the zeros-
# noise output, so its zeros-path PSNR is bit-equal to its base row —
# throughput is the signal; the distribution change is the documented
# trade.  deprocess_on_device changes only the output encoding (u8 on
# chip, 4x less fetch).
EXTRA_ROWS = [
    # (name, base tier kw overlay, note)
    ("prod_nd2", {"noise_downsample": 2},
     "production + half-res noise draw (1/4 the random bits)"),
    ("prod_dod", {"deprocess_on_device": True},
     "production + on-device deprocess (uint8 fetch)"),
    ("turbo_nd2", {"quantize": "int8", "noise_downsample": 2},
     "turbo tier + half-res noise draw"),
]


def main():
    import jax
    import jax.numpy as jnp
    import torch

    from bench import flagship_config, flagship_setup, _median, _repeats
    from scripts.attrib_psnr import build_proxy

    from sg2im_tpu.ckpt.torch_compat import (
        torch04_semantics, zeros_randn_override)
    from sg2im_tpu.data.batching import GraphBatch
    from sg2im_tpu.data.transforms import imagenet_deprocess_batch
    from sg2im_tpu.inference import InferenceEngine
    from sg2im_tpu.utils.metrics import psnr

    print(f"backend: {jax.devices()[0].platform}", flush=True)

    # --- fidelity ground: the shared synthetic-flagship proxy ------------
    with torch04_semantics(randn_override=zeros_randn_override):
        model, vocab, model_kwargs, sgs = build_proxy("flagship")
        with torch.no_grad():
            ref_imgs, *_ = model.forward_json(json.loads(json.dumps(sgs)))
        ref_imgs = ref_imgs.permute(0, 2, 3, 1).numpy()
        ckpt = {"model_state": model.state_dict(),
                "model_kwargs": dict(model_kwargs, vocab=vocab),
                "args": {"dataset": "vg"}}
    ref_u8 = imagenet_deprocess_batch(ref_imgs)

    import tempfile

    # --- throughput rig: bench's serving-path inputs ----------------------
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    fwd, args = flagship_setup(batch)
    vocab_f, mk = flagship_config()
    gb = GraphBatch(objs=args[1], triples=args[2],
                    obj_mask=args[3], triple_mask=args[4])

    prod_kw = dict(compute_dtype=jnp.bfloat16)
    dp = os.environ.get("BENCH_DENSE_PRECISION", "high")
    if dp and dp != "highest":
        prod_kw["dense_precision"] = dp
    cm = os.environ.get("BENCH_CRN_MODE", "split")
    if cm and cm != "legacy":
        prod_kw["crn_mode"] = cm

    results = []
    with tempfile.TemporaryDirectory() as td:
        pt = os.path.join(td, "vg128_synth.pt")
        torch.save(ckpt, pt)

        # Non-quantized production engine once, for the baseline row.
        rows = [("production", "none", None, None)] + [
            (name, "int8", qo, None) for name, qo, _ in CONFIGS] + [
            (name, ("int8" if ov.get("quantize") else "none"), None, ov)
            for name, ov, _ in EXTRA_ROWS]
        for name, tier, qo, overlay in rows:
            kw = dict(prod_kw)
            if tier == "int8":
                kw.update(quantize="int8", noise_impl="rbg",
                          noise_dtype=jnp.bfloat16)
                if qo:
                    kw["quant_opts"] = qo
            if overlay:
                kw.update({k: v for k, v in overlay.items()
                           if k != "quantize"})
            u8 = raw = None
            if overlay is None:
                # fidelity (production-shaped: calibrate half, score
                # static).  EXTRA_ROWS skip it: their zeros-noise output
                # is bit-equal to their base row's (noise_downsample only
                # touches the seeded draw; deprocess_on_device only the
                # output encoding).
                eng_f = InferenceEngine.from_torch_checkpoint(pt, **{
                    k: v for k, v in kw.items()
                    if k not in ("noise_impl", "noise_dtype",
                                 "noise_downsample", "deprocess_on_device")})
                if tier == "int8":
                    eng_f.calibrate(sgs[: max(1, len(sgs) // 2)],
                                    noise="zeros")
                _, out = eng_f.generate(sgs, noise="zeros")
                got = np.asarray(out["imgs"], np.float32)[:len(sgs)]
                u8 = float(psnr(imagenet_deprocess_batch(got), ref_u8,
                                max_val=255.0))
                raw = float(psnr(got, ref_imgs, max_val=1.0))
                del eng_f

            # throughput (serving path, seeded in-program noise)
            eng = InferenceEngine(vocab_f, mk, args[0], **kw)
            float(eng.generate_batch(gb, seed=0)["imgs"].sum())  # cal+compile
            float(eng.generate_batch(gb, seed=1)["imgs"].sum())
            runs = []
            for r in range(_repeats()):
                t0 = time.perf_counter()
                for i in range(iters):
                    o = eng.generate_batch(gb, seed=r * iters + i + 2)
                float(o["imgs"].sum())
                runs.append(round(batch * iters / (time.perf_counter() - t0),
                                  1))
            ips = _median(runs)
            del eng
            results.append({"config": name, "quant_opts": qo,
                            "overlay": overlay,
                            "psnr_u8_db": (round(u8, 2)
                                           if u8 is not None else None),
                            "psnr_raw_db": (round(raw, 2)
                                            if raw is not None else None),
                            "img_s": round(ips, 1), "img_s_runs": runs})
            u8s = f"{u8:6.2f}" if u8 is not None else "  n/a "
            raws = f"{raw:6.2f}" if raw is not None else "  n/a "
            print(f"{name:16s} u8 {u8s} dB  raw {raws} dB  "
                  f"{ips:7.1f} img/s  {runs}", flush=True)

    base = next(r for r in results if r["config"] == "production")
    for r in results:
        r["vs_production_pct"] = round(
            (r["img_s"] / base["img_s"] - 1) * 100, 1)
    with open("/tmp/turbo_frontier.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
