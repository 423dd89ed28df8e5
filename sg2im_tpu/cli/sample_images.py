"""sample_images CLI — bulk sampling over a val set for evaluation.

Flag-compatible port of reference ``scripts/sample_images.py:40-72``: loads
a checkpoint (reference ``.pt`` or our native store), rebuilds the dataset
from the checkpoint's own saved args (the args-travel-with-weights contract,
``sample_images.py:76-109``), and writes generated PNGs (+optionally GT
images, scene-graph renders, and an ``.npz`` of boxes/graphs).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from sg2im_tpu.utils.flags import bool_flag, int_tuple


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default="sg2im-models/vg64.pt")
    p.add_argument("--checkpoint_list", default=None)
    p.add_argument("--model_mode", default="eval",
                   choices=["train", "eval"])
    p.add_argument("--dataset", default="vg", choices=["coco", "vg"])
    p.add_argument("--image_size", default="64,64", type=int_tuple)
    p.add_argument("--batch_size", default=24, type=int)
    p.add_argument("--shuffle", default=False, type=bool_flag)
    p.add_argument("--loader_num_workers", default=4, type=int)
    p.add_argument("--num_samples", default=10000, type=int)
    p.add_argument("--save_gt_imgs", default=False, type=bool_flag)
    p.add_argument("--save_graphs", default=False, type=bool_flag)
    p.add_argument("--use_gt_boxes", default=False, type=bool_flag)
    p.add_argument("--use_gt_masks", default=False, type=bool_flag)
    p.add_argument("--save_layout", default=True, type=bool_flag)
    p.add_argument("--decoder", default="auto",
                   choices=["auto", "pil", "native", "native_fast"],
                   help="image decode backend (data/decode.py)")
    p.add_argument("--output_dir", default="output")
    p.add_argument("--vg_h5", default="datasets/vg/val.h5")
    p.add_argument("--vg_image_dir", default="datasets/vg/images")
    p.add_argument("--coco_image_dir",
                   default="datasets/coco/images/val2017")
    p.add_argument("--instances_json",
                   default="datasets/coco/annotations/instances_val2017.json")
    p.add_argument("--stuff_json",
                   default="datasets/coco/annotations/stuff_val2017.json")
    p.add_argument("--seed", default=0, type=int)
    return p


def _load_bundle(path):
    """Load reference .pt or native converted bundle."""
    from sg2im_tpu.ckpt.torch_convert import convert_checkpoint

    return convert_checkpoint(path)


def _build_dataset(args, ckpt_args, vocab):
    if args.dataset == "coco":
        from sg2im_tpu.data.coco import CocoSceneGraphDataset

        return CocoSceneGraphDataset(
            image_dir=args.coco_image_dir,
            instances_json=args.instances_json,
            stuff_json=args.stuff_json,
            stuff_only=ckpt_args.get("coco_stuff_only", True),
            image_size=tuple(args.image_size),
            mask_size=ckpt_args.get("mask_size", 16),
            max_samples=args.num_samples,
            min_object_size=ckpt_args.get("min_object_size", 0.02),
            min_objects_per_image=ckpt_args.get("min_objects_per_image", 3),
            instance_whitelist=ckpt_args.get("instance_whitelist"),
            stuff_whitelist=ckpt_args.get("stuff_whitelist"),
            # reference defaults this lookup to True for legacy ckpts
            # (sample_images.py:91)
            include_other=ckpt_args.get("coco_include_other", True),
            include_relationships=ckpt_args.get("include_relationships",
                                                True),
            decoder=args.decoder,
        )
    from sg2im_tpu.data.vg import VgSceneGraphDataset

    return VgSceneGraphDataset(
        vocab=vocab, h5_path=args.vg_h5, image_dir=args.vg_image_dir,
        image_size=tuple(args.image_size),
        max_objects=ckpt_args.get("max_objects_per_image", 10),
        max_samples=args.num_samples,
        use_orphaned_objects=ckpt_args.get("vg_use_orphaned_objects", True),
        include_relationships=ckpt_args.get("include_relationships", True),
        decoder=args.decoder,
    )


def run_checkpoint(args, checkpoint_path):
    import jax
    from sg2im_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from sg2im_tpu.data.loader import PaddedLoader
    from sg2im_tpu.data.transforms import imagenet_deprocess_batch
    from sg2im_tpu.models import Sg2ImGenerator
    from sg2im_tpu.utils.vis import draw_scene_graph, have_graphviz

    bundle = _load_bundle(checkpoint_path)
    vocab = bundle["vocab"]
    ckpt_args = bundle["args"] or {}
    model_kwargs = dict(bundle["model_kwargs"])
    model_kwargs["image_size"] = tuple(args.image_size)
    gen = Sg2ImGenerator(vocab=vocab, **model_kwargs)
    variables = bundle["generator"]

    dset = _build_dataset(args, ckpt_args, vocab)
    # Derive pad targets from the actual data caps (avoid silent triple
    # truncation in collate_padded).
    if args.dataset == "vg":
        max_objs = ckpt_args.get("max_objects_per_image", 10)
        rel_cap = int(dset.data["relationship_subjects"].shape[1])
        o_cap = max_objs + 2  # +__image__, +sampling quirk (vg.py:98-99)
        t_cap = rel_cap + max_objs + 1
    else:
        o_cap = 8 + 1
        t_cap = 8 + 8
    from sg2im_tpu.data.batching import round_up

    O_max = round_up(o_cap, 8)
    T_max = round_up(t_cap, 8)
    loader = PaddedLoader(dset, batch_size=args.batch_size, O_max=O_max,
                          T_max=T_max, shuffle=args.shuffle,
                          num_workers=args.loader_num_workers,
                          seed=args.seed, drop_last=False)

    train_mode = args.model_mode == "train"
    H, W = args.image_size
    noise_dim = model_kwargs.get("layout_noise_dim", 0) or 0

    def fwd(batch, noise, boxes_gt, masks_gt):
        out = gen.apply(variables, batch["objs"], batch["triples"],
                        batch["obj_mask"], batch["triple_mask"],
                        boxes_gt=boxes_gt, masks_gt=masks_gt,
                        train=train_mode, layout_noise=noise,
                        # train-mode BN writes batch stats; collect+discard
                        # (reference model_mode='train' samples with
                        # batch-stat normalization, sample_images.py:43)
                        mutable=(["batch_stats"] if train_mode
                                 and "batch_stats" in variables else False))
        if train_mode and "batch_stats" in variables:
            out, _ = out
        return out

    fwd = jax.jit(fwd)

    img_dir = os.path.join(args.output_dir, "img")
    os.makedirs(img_dir, exist_ok=True)
    if args.save_gt_imgs:
        os.makedirs(os.path.join(args.output_dir, "gt_img"), exist_ok=True)
    if args.save_graphs:
        os.makedirs(os.path.join(args.output_dir, "graphs"), exist_ok=True)

    from PIL import Image

    rng = jax.random.PRNGKey(args.seed)
    saved = 0
    save_graphs = args.save_graphs and have_graphviz()
    if args.save_graphs and not save_graphs:
        print("WARNING: --save_graphs requested but GraphViz 'dot' is not "
              "installed; skipping scene-graph renders")
    dump = {"boxes_pred": [], "boxes_gt": [], "objs": [], "obj_mask": [],
            "masks_pred": [], "masks_gt": []}
    for batch in loader:
        if saved >= args.num_samples:
            break
        N = batch["imgs"].shape[0]
        if N < args.batch_size:
            # Pad the final partial batch to the full size: a new batch
            # shape would trigger a second multi-minute jit compile for a
            # handful of images.  Pad rows carry zero masks; the save loop
            # below only writes the first N.
            pad = args.batch_size - N
            batch = {k: (np.concatenate(
                [v, np.zeros((pad,) + np.asarray(v).shape[1:],
                             np.asarray(v).dtype)])
                if v is not None else None) for k, v in batch.items()}
        noise = None
        if noise_dim > 0:
            rng, k = jax.random.split(rng)
            noise = jax.random.normal(
                k, (batch["imgs"].shape[0], H, W, noise_dim))
        boxes_gt = batch["boxes"] if args.use_gt_boxes else None
        masks_gt = (batch.get("masks") if args.use_gt_masks else None)
        imgs, boxes_pred, masks_pred, _ = fwd(batch, noise, boxes_gt,
                                              masks_gt)
        imgs_u8 = imagenet_deprocess_batch(np.asarray(imgs))
        gt_u8 = (imagenet_deprocess_batch(batch["imgs"])
                 if args.save_gt_imgs else None)
        for i in range(N):
            if saved >= args.num_samples:
                break
            Image.fromarray(imgs_u8[i]).save(
                os.path.join(img_dir, f"img{saved:06d}.png"))
            if gt_u8 is not None:
                Image.fromarray(gt_u8[i]).save(os.path.join(
                    args.output_dir, "gt_img", f"img{saved:06d}.png"))
            if save_graphs:
                om = batch["obj_mask"][i].astype(bool)
                tm = batch["triple_mask"][i].astype(bool)
                sg = draw_scene_graph(batch["objs"][i][om],
                                      batch["triples"][i][tm], vocab)
                Image.fromarray(sg).save(os.path.join(
                    args.output_dir, "graphs", f"sg{saved:06d}.png"))
            saved += 1
        dump["boxes_pred"].append(np.asarray(boxes_pred)[:N])
        dump["boxes_gt"].append(np.asarray(batch["boxes"])[:N])
        dump["objs"].append(np.asarray(batch["objs"])[:N])
        dump["obj_mask"].append(np.asarray(batch["obj_mask"])[:N])
        if masks_pred is not None:
            dump["masks_pred"].append(np.asarray(masks_pred)[:N])
        if batch.get("masks") is not None:
            dump["masks_gt"].append(np.asarray(batch["masks"])[:N])

    # Row i of every npz array corresponds to img%06d.png i — truncate to
    # the images actually saved (the last batch may overshoot num_samples).
    np.savez(os.path.join(args.output_dir, "data.npz"),
             **{k: np.concatenate(v)[:saved]
                for k, v in dump.items() if v})
    print(f"Saved {saved} images to {img_dir}")
    return saved


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.checkpoint_list is not None:
        with open(args.checkpoint_list) as f:
            checkpoints = [ln.strip() for ln in f if ln.strip()]
        base = args.output_dir
        for i, ck in enumerate(checkpoints):
            if os.path.isdir(ck):
                # Snapshot directories (reference sample_images.py:268-285):
                # run every snapshot_*.pt inside.
                for fn in sorted(os.listdir(ck)):
                    if "snapshot" not in fn:
                        continue
                    name = os.path.splitext(fn)[0].split("_")[-1]
                    args.output_dir = os.path.join(
                        base, f"result{i:03d}_{name}")
                    run_checkpoint(args, os.path.join(ck, fn))
            else:
                args.output_dir = os.path.join(base, f"result{i:03d}")
                run_checkpoint(args, ck)
    else:
        run_checkpoint(args, args.checkpoint)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
