"""run_model CLI: JSON scene graphs -> PNG images.

TPU-native replacement for reference ``scripts/run_model.py``.  Accepts the
reference's pretrained ``.pt`` checkpoints directly (converted on load).

Example:
    python -m sg2im_tpu.cli.run_model \
        --checkpoint sg2im-models/vg128.pt \
        --scene_graphs_json scene_graphs/figure_6_sheep.json \
        --output_dir outputs
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", default="sg2im-models/vg128.pt")
    parser.add_argument("--scene_graphs_json",
                        default="scene_graphs/figure_6_sheep.json")
    parser.add_argument("--output_dir", default="outputs")
    parser.add_argument("--draw_scene_graphs", type=int, default=0)
    # Layout-noise control (the reference samples torch.randn in forward,
    # sg2im/model.py:164-169, unseeded — so its outputs are run-to-run
    # nondeterministic.  We expose explicit control instead.)
    parser.add_argument("--noise", default="random",
                        choices=["random", "zeros"])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--layout_noise_npy", default=None,
                        help="Optional .npy (N, H, W, D) noise tensor for "
                             "bit-reproducible comparisons.")
    parser.add_argument("--bf16_compute", type=int, default=0,
                        help="bf16 CRN activation chain (+4%% throughput at "
                             "64 dB PSNR vs f32; default off for exact-f32 "
                             "reference numerics)")
    parser.add_argument("--dense_precision", default=None,
                        choices=["high", "highest"],
                        help="GCN/head Dense matmul precision: 'high' "
                             "(3-pass bf16, +5%% e2e at unchanged PSNR — "
                             "the serving mode bench.py measures) vs the "
                             "default parity-grade 'highest'")
    parser.add_argument("--crn_mode", default=None,
                        choices=["legacy", "split"],
                        help="CRN stage-conv formulation: 'split' (+5%% "
                             "e2e, exact up to sum reassociation — the "
                             "serving mode bench.py measures) vs the "
                             "default reference-shaped 'legacy'.  These "
                             "are the two production modes; the measured-"
                             "and-retired research modes (phase/"
                             "split_noise/packed, ARCHITECTURE §7) remain "
                             "available via the Sg2ImGenerator API only")
    parser.add_argument("--quantize", default=None,
                        choices=["int8"],
                        help="TURBO tier: run the high-res CRN stage convs "
                             "on the int8 MXU path (measured accuracy "
                             "trade for throughput — fidelity recorded in "
                             "SERVING.md/BENCH; no bit-parity contract). "
                             "Checkpoints are unaffected (weights "
                             "quantize in-program)")
    parser.add_argument("--calibration_file", default=None,
                        help="int8 tier: load activation scales saved by "
                             "serve --save_calibration (otherwise the "
                             "engine calibrates on the request batch "
                             "itself) — byte-reproducible turbo output "
                             "across runs and vs a server using the same "
                             "file")
    parser.add_argument("--noise_impl", default=None,
                        choices=["threefry", "rbg"],
                        help="PRNG for --noise random: 'rbg' (hardware "
                             "generator, 2.1x draw rate; deterministic "
                             "per seed+batch shape only) vs the default "
                             "threefry (bucket/mesh-stable seeded "
                             "reproducibility)")
    parser.add_argument("--deprocess_device", type=int, default=0,
                        help="fold deprocess (denorm + rescale + uint8) "
                             "into the serving program: 4x less "
                             "device->host traffic per request (default "
                             "0 = host deprocess, bit-exact reference "
                             "path)")
    return parser


def main(args=None):
    args = build_parser().parse_args(args)
    if not os.path.isfile(args.checkpoint):
        print(f'ERROR: Checkpoint file "{args.checkpoint}" not found')
        return 1
    os.makedirs(args.output_dir, exist_ok=True)

    from sg2im_tpu.inference import InferenceEngine
    from sg2im_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    compute_dtype = None
    if args.bf16_compute:
        import jax.numpy as jnp

        compute_dtype = jnp.bfloat16
    engine = InferenceEngine.from_torch_checkpoint(
        args.checkpoint, compute_dtype=compute_dtype,
        dense_precision=(None if args.dense_precision == "highest"
                         else args.dense_precision),
        crn_mode=(None if args.crn_mode == "legacy" else args.crn_mode),
        quantize=args.quantize,
        noise_impl=(None if args.noise_impl == "threefry"
                    else args.noise_impl),
        deprocess_on_device=bool(args.deprocess_device))
    if args.calibration_file:
        if args.quantize != "int8":
            print("ERROR: --calibration_file requires --quantize int8")
            return 1
        engine.load_calibration(args.calibration_file)

    with open(args.scene_graphs_json) as f:
        scene_graphs = json.load(f)
    if isinstance(scene_graphs, dict):
        scene_graphs = [scene_graphs]

    noise = args.noise if args.noise == "zeros" else None
    if args.layout_noise_npy:
        noise = np.load(args.layout_noise_npy)
    imgs, _ = engine.generate(scene_graphs, noise=noise, seed=args.seed)

    from PIL import Image

    for i in range(len(scene_graphs)):
        path = os.path.join(args.output_dir, "img%06d.png" % i)
        Image.fromarray(imgs[i]).save(path)
    print(f"Wrote {len(scene_graphs)} images to {args.output_dir}")

    if args.draw_scene_graphs == 1:
        from sg2im_tpu.utils.vis import draw_scene_graph, have_graphviz

        if not have_graphviz():
            print("WARNING: graphviz 'dot' not found; skipping scene graphs")
        else:
            for i, sg in enumerate(scene_graphs):
                sg_img = draw_scene_graph(sg["objects"], sg["relationships"])
                path = os.path.join(args.output_dir, "sg%06d.png" % i)
                Image.fromarray(sg_img).save(path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
