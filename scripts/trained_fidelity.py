"""Trained-weights fidelity loop (VERDICT r4 #1): the full circle
train -> native checkpoint -> export .pt -> convert back in -> PSNR gate
on LEARNED weights.

Every prior fidelity number rode an UNTRAINED synthetic checkpoint with a
box-head conditioning hack (scripts/attrib_psnr.py).  This script removes
that caveat: it fast-trains a real (small) generator on the disk-backed
learnable dataset (scripts/train_proof.py — category -> color task),
exports the learned generator to a reference-layout ``.pt`` via
``checkpoint_tools export``, and runs the ACTUAL north-star gate machinery
(``cli/verify_pretrained`` with ``--run_reference``: this framework's
engine vs the upstream torch ``Sg2ImModel.forward_json`` executed
in-process on the same ``.pt``) on scene graphs drawn from the trained
vocabulary.  Gate: deprocessed-u8 PSNR >= 40 dB (reference
``README.md:78-89``'s acceptance procedure).

Artifacts committed to the repo (so bench.py and the always-on test can
re-score the learned weights every round without re-training):
    artifacts/trained_coco64.pt          — the exported learned generator
    artifacts/trained_scene_graphs.json  — gate scene graphs (vocab-valid)
    TRAINED_FIDELITY.md                  — measurements + recipe

Usage:
    python scripts/trained_fidelity.py [--iters 3000] [--images 1024]
        [--out /tmp/trained_fidelity] [--skip_train]  # reuse existing run
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Small-but-real generator config: every flag below is a reference
# ``scripts/train.py`` flag; the scale is chosen so the committed ``.pt``
# stays a few MB and 3k iterations train in minutes through the tunnel.
MODEL_FLAGS = [
    "--embedding_dim", "64",
    "--gconv_dim", "64",
    "--gconv_hidden_dim", "256",
    "--gconv_num_layers", "3",
    "--refinement_network_dims", "256,128,64",
    "--mask_size", "16",
    "--mask_loss_weight", "0.1",
]


def make_scene_graphs(seed: int = 7, n_graphs: int = 8):
    """Deterministic gate scene graphs over the trained vocabulary
    (train_proof's categories: thing1..thing6 + ground).  Shapes mirror
    the training distribution (2-5 things + ground, geometric
    predicates), like the reference's figure_5/6 JSONs mirror VG."""
    rng = np.random.RandomState(seed)
    things = [f"thing{i}" for i in range(1, 7)]
    preds = ["left of", "right of", "above", "below"]
    graphs = []
    for _ in range(n_graphs):
        objs = [things[i] for i in
                rng.choice(6, size=rng.randint(2, 6), replace=False)]
        objs.append("ground")
        rels = []
        for i in range(len(objs) - 1):
            j = int(rng.randint(0, len(objs) - 1))
            if j == i:
                continue
            rels.append([i, preds[int(rng.randint(len(preds)))], j])
        # every thing stands above the ground plane
        rels.append([0, "above", len(objs) - 1])
        graphs.append({"objects": objs, "relationships": rels})
    return graphs


def run_training(out_dir: str, images: int, iters: int, batch: int,
                 workers: int):
    from scripts.train_proof import build_dataset

    from sg2im_tpu.cli.train import main as train_main

    print(f"building {images}-image disk dataset ...")
    img_dir, inst_path, stuff_path = build_dataset(out_dir, images)
    run_dir = os.path.join(out_dir, "run")
    os.makedirs(run_dir, exist_ok=True)
    flags = [
        "--dataset", "coco",
        "--batch_size", str(batch),
        "--image_size", "64,64",
        "--num_iterations", str(iters),
        "--print_every", "50",
        "--checkpoint_every", str(iters),
        "--loader_num_workers", str(workers),
        "--num_val_samples", str(2 * batch),
        "--coco_train_image_dir", img_dir,
        "--coco_val_image_dir", img_dir,
        "--coco_train_instances_json", inst_path,
        "--coco_val_instances_json", inst_path,
        "--coco_train_stuff_json", stuff_path,
        "--coco_val_stuff_json", stuff_path,
        "--output_dir", run_dir,
        "--seed", "0",
    ] + MODEL_FLAGS
    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            sys.__stdout__.write(s)
            return len(s)

    t0 = time.perf_counter()
    with contextlib.redirect_stdout(Tee()):
        rc = train_main(flags)
    wall = time.perf_counter() - t0
    assert rc == 0, "training failed"
    l1 = [float(line.split(":")[1]) for line in buf.getvalue().splitlines()
          if line.strip().startswith("[L1_pixel_loss]:")]
    return run_dir, wall, l1


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--out", default="/tmp/trained_fidelity")
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse an existing --out run (export+gate only)")
    ap.add_argument("--min_psnr", type=float, default=40.0)
    ap.add_argument("--cpu", action="store_true",
                    help="run on the CPU backend (plumbing dry-runs; the "
                         "committed artifact comes from a TPU run)")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.out, exist_ok=True)
    art_dir = os.path.join(REPO, "artifacts")
    os.makedirs(art_dir, exist_ok=True)

    run_dir = os.path.join(args.out, "run")
    wall, l1 = None, []
    if not args.skip_train:
        run_dir, wall, l1 = run_training(
            args.out, args.images, args.iters, args.batch_size, args.workers)

    ckpt_dir = os.path.join(run_dir, "checkpoint_state")
    assert os.path.isdir(ckpt_dir), f"no checkpoint at {ckpt_dir}"

    # Export the learned generator to a reference-layout .pt.
    from sg2im_tpu.cli.checkpoint_tools import export as ckpt_export

    pt_path = os.path.join(art_dir, "trained_coco64.pt")
    rc = ckpt_export(ckpt_dir, pt_path)
    assert rc == 0

    # Gate scene graphs over the trained vocab.
    sgs = make_scene_graphs()
    sg_path = os.path.join(art_dir, "trained_scene_graphs.json")
    with open(sg_path, "w") as f:
        json.dump(sgs, f, indent=1)

    # Run the actual gate CLI (engine vs in-process reference torch model,
    # both on the exported LEARNED .pt).
    from sg2im_tpu.cli.verify_pretrained import main as verify_main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = verify_main(["--checkpoint", pt_path,
                          "--scene_graphs_json", sg_path,
                          "--output_dir", os.path.join(args.out, "gate_out"),
                          "--min_psnr", str(args.min_psnr)])
    out = buf.getvalue()
    sys.stdout.write(out)
    result = json.loads([ln for ln in out.splitlines()
                         if ln.startswith("{")][-1])
    assert rc == 0, f"gate FAILED (rc={rc}): {result}"
    psnrs = result["psnr"]

    import jax

    report = os.path.join(REPO, "TRAINED_FIDELITY.md")
    l1_line = (f"{np.mean(l1[:3]):.4f} -> {np.mean(l1[-3:]):.4f}"
               if len(l1) >= 6 else "(training skipped — reused run)")
    with open(report, "w") as f:
        f.write(f"""# Trained-weights fidelity loop (scripts/trained_fidelity.py)

Date: {time.strftime('%Y-%m-%d')} — backend: {jax.devices()[0].platform}.
The full acceptance circle on LEARNED weights (VERDICT r4 #1): train ->
native checkpoint -> `checkpoint_tools export` .pt -> converter back in ->
`verify_pretrained` PSNR gate vs the upstream torch model run in-process
on the same .pt.  This removes the untrained-proxy caveat from the
fidelity story: the box/mask heads here emit TRAINED geometry (no
conditioning hack), and the reference forward is NaN-free on it.

| item | value |
|---|---|
| dataset | {args.images} disk JPEGs (train_proof category->color task, seed 0) |
| model | coco64, embed/gconv 64, hidden 256, 3 gconv layers, CRN (256,128,64), mask 16 |
| training | {args.iters} iters @ batch {args.batch_size}{f', wall {wall:.0f} s' if wall else ' (reused run)'} |
| L1 pixel loss | {l1_line} |
| exported artifact | `artifacts/trained_coco64.pt` ({os.path.getsize(pt_path) / 1e6:.1f} MB) |
| gate scene graphs | `artifacts/trained_scene_graphs.json` ({len(sgs)} graphs, trained vocab) |
| **gate (u8 PSNR vs reference)** | **{psnrs['ref_u8:ALL']:.2f} dB** (bar: {args.min_psnr:.0f} dB) |
| raw-space PSNR | {psnrs['ref_raw:ALL']:.2f} dB (max_val=1.0) |

Re-scored every round: `bench.py` emits `psnr_u8_db_trained` from the
committed artifact; `tests/test_inference.py::test_trained_artifact_gate`
runs the same comparison on the CPU backend in the default suite.

Recipe (deterministic, ~10 min on the tunnel TPU):
`python scripts/trained_fidelity.py`
""")
    print(f"wrote {report}")
    print(json.dumps({"psnr_u8_db_trained": round(psnrs["ref_u8:ALL"], 2),
                      "psnr_raw_db_trained": round(psnrs["ref_raw:ALL"], 2),
                      "pass": True}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
