"""Loader benchmark: decode backends and decoded-sample cache vs raw.

Measures, on the synthetic disk-backed COCO dataset (train_proof.py):
  1. single-thread RAW decode ms/image per backend (pil / native /
     native_fast — see data/decode.py; the 2.10 ms/image TRAIN_PROOF
     baseline is the pil number at --src_hw 64),
  2. single-thread CACHED read ms/image (memmap slice + triple synthesis),
  3. PaddedLoader throughput at ONE worker from the cache,
and compares against the device step rate (~1810 img/s for COCO-64 b32) —
the ``--cache_dir`` acceptance bar: one worker must feed the step rate.

``--src_hw 480`` builds production-sized source JPEGs (COCO images are
~640x480; the decode cost scales with SOURCE pixels, so the 64px default
understates what the native backends save on real data).

Usage: python scripts/loader_bench.py [--images 2048] [--out /tmp/loaderbench]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.train_proof import build_dataset


def rate(fn, n, warmup=20):
    for i in range(warmup):
        fn(i % n)
    t0 = time.perf_counter()
    cnt = max(200, min(n, 2000))
    for i in range(cnt):
        fn(i % n)
    dt = time.perf_counter() - t0
    return cnt / dt, dt / cnt * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=2048)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--out", default="/tmp/loaderbench")
    ap.add_argument("--step_rate", type=float, default=1810.0,
                    help="device img/s to compare against (COCO-64 b32)")
    ap.add_argument("--src_hw", type=int, default=64,
                    help="source JPEG side (480 ~ production COCO)")
    args = ap.parse_args()

    args.out = os.path.join(args.out, f"src{args.src_hw}")
    os.makedirs(args.out, exist_ok=True)
    if not os.path.exists(os.path.join(args.out, "instances.json")):
        print(f"building {args.images}-image disk dataset "
              f"(src {args.src_hw}px) ...")
        build_dataset(args.out, n_images=args.images, hw=args.src_hw)
    img_dir = os.path.join(args.out, "images")
    inst = os.path.join(args.out, "instances.json")
    stuff = os.path.join(args.out, "stuff.json")

    from sg2im_tpu.data.coco import CocoSceneGraphDataset
    from sg2im_tpu.data.loader import PaddedLoader

    kwargs = dict(image_dir=img_dir, instances_json=inst, stuff_json=stuff,
                  image_size=(64, 64), mask_size=16, seed=0)
    from sg2im_tpu.data.decode import resolve_decoder

    raw_ms = None
    for dec in ("pil", "native", "native_fast"):
        if dec != "pil" and resolve_decoder(dec) == "pil":
            print(f"raw decode [{dec}]: native decoder unavailable, skipped")
            continue
        ds = CocoSceneGraphDataset(decoder=dec, **kwargs)
        ips, ms = rate(ds.__getitem__, len(ds))
        rel = f"  ({raw_ms / ms:.2f}x pil)" if raw_ms else ""
        print(f"raw decode [{dec:11s}] (1 thread): {ms:6.3f} ms/img "
              f"= {ips:7.0f} img/s{rel}")
        if dec == "pil":
            raw_ds, raw_ips, raw_ms = ds, ips, ms
    n = len(raw_ds)

    t0 = time.perf_counter()
    cached_ds = CocoSceneGraphDataset(
        cache_dir=os.path.join(args.out, "cache"), **kwargs)
    build_s = time.perf_counter() - t0
    print(f"cache build: {build_s:.1f} s one-time ({n} samples)")

    c_ips, c_ms = rate(cached_ds.__getitem__, n)
    print(f"cached read    (1 thread): {c_ms:6.3f} ms/img "
          f"= {c_ips:7.0f} img/s  ({raw_ms / c_ms:.1f}x raw)")

    rows = [("cached", cached_ds, 1, False), ("raw", raw_ds, 1, False)]
    if resolve_decoder("native") == "native":
        nat = CocoSceneGraphDataset(decoder="native", **kwargs)
        # batch_decode: one GIL-free C++ pool call per batch vs per-sample
        # threaded decode (VERDICT r3 #7 — the variant must be >= the
        # threaded path at 1 core).
        rows += [("nat/sample", nat, 1, False), ("nat/batch", nat, 1, True),
                 ("nat/sample4", nat, 4, False), ("nat/batch4", nat, 4, True)]
    for name, ds, workers, bd in rows:
        loader = PaddedLoader(ds, batch_size=args.batch_size, O_max=16,
                              T_max=16, num_workers=workers, seed=0,
                              batch_decode=bd)
        it = iter(loader)
        next(it)  # warm the pool
        t0 = time.perf_counter()
        nb = 0
        for b in it:
            nb += 1
            if nb >= 40:
                break
        dt = time.perf_counter() - t0
        ips = nb * args.batch_size / dt
        verdict = ("OK >= step rate" if ips >= args.step_rate
                   else f"{ips / args.step_rate:.2f}x of step rate")
        print(f"PaddedLoader {name:7s} ({workers} worker): "
              f"{ips:7.0f} img/s   [{verdict} vs {args.step_rate:.0f}]")


if __name__ == "__main__":
    main()
