"""train CLI — flag-compatible with reference ``scripts/train.py``.

Example (COCO 64x64 default config):
    python -m sg2im_tpu.cli.train --dataset coco --batch_size 32

All ~50 reference flags are accepted with identical names and defaults
(``scripts/train.py:47-140``); TPU-native extras are grouped at the end.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from collections import defaultdict

import numpy as np

from sg2im_tpu.train.config import TrainConfig
from sg2im_tpu.utils.flags import bool_flag, float_tuple, int_tuple, str_tuple


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    d = TrainConfig()
    p.add_argument("--dataset", default=d.dataset, choices=["vg", "coco"])
    p.add_argument("--batch_size", default=d.batch_size, type=int)
    p.add_argument("--num_iterations", default=d.num_iterations, type=int)
    p.add_argument("--learning_rate", default=d.learning_rate, type=float)
    p.add_argument("--eval_mode_after", default=d.eval_mode_after, type=int)
    p.add_argument("--image_size", default="64,64", type=int_tuple)
    p.add_argument("--num_train_samples", default=None, type=int)
    p.add_argument("--num_val_samples", default=d.num_val_samples, type=int)
    p.add_argument("--shuffle_val", default=True, type=bool_flag)
    p.add_argument("--loader_num_workers", default=4, type=int)
    p.add_argument("--cache_dir", default=None,
                   help="directory for the decoded-sample memmap cache "
                        "(data/cache.py): built on first run, then every "
                        "sample read skips JPEG/RLE decode entirely — one "
                        "loader worker feeds any step rate (beyond the "
                        "reference, which needs 4 decode workers)")
    p.add_argument("--include_relationships", default=True, type=bool_flag)
    p.add_argument("--decoder", default="auto",
                   choices=["auto", "pil", "native", "native_fast"],
                   help="image decode backend (data/decode.py): 'native' "
                        "is the C++ libjpeg/libpng + bit-exact-PIL-resize "
                        "path (~1.5x PIL, GIL-free), 'native_fast' adds "
                        "JPEG DCT prescaling (~3x, visually identical but "
                        "not bit-equal), 'auto' = native when it builds "
                        "and passes its bit-parity self-check")
    # VG
    p.add_argument("--vg_image_dir", default=d.vg_image_dir)
    p.add_argument("--train_h5", default=d.train_h5)
    p.add_argument("--val_h5", default=d.val_h5)
    p.add_argument("--vocab_json", default=d.vocab_json)
    p.add_argument("--max_objects_per_image", default=10, type=int)
    p.add_argument("--vg_use_orphaned_objects", default=True, type=bool_flag)
    # COCO
    p.add_argument("--coco_train_image_dir", default=d.coco_train_image_dir)
    p.add_argument("--coco_val_image_dir", default=d.coco_val_image_dir)
    p.add_argument("--coco_train_instances_json",
                   default=d.coco_train_instances_json)
    p.add_argument("--coco_train_stuff_json", default=d.coco_train_stuff_json)
    p.add_argument("--coco_val_instances_json",
                   default=d.coco_val_instances_json)
    p.add_argument("--coco_val_stuff_json", default=d.coco_val_stuff_json)
    p.add_argument("--instance_whitelist", default=None, type=str_tuple)
    p.add_argument("--stuff_whitelist", default=None, type=str_tuple)
    p.add_argument("--coco_include_other", default=False, type=bool_flag)
    p.add_argument("--min_object_size", default=0.02, type=float)
    p.add_argument("--min_objects_per_image", default=3, type=int)
    p.add_argument("--coco_stuff_only", default=True, type=bool_flag)
    # Generator
    p.add_argument("--mask_size", default=16, type=int)
    p.add_argument("--embedding_dim", default=128, type=int)
    p.add_argument("--gconv_dim", default=128, type=int)
    p.add_argument("--gconv_hidden_dim", default=512, type=int)
    p.add_argument("--gconv_num_layers", default=5, type=int)
    p.add_argument("--mlp_normalization", default="none")
    p.add_argument("--refinement_network_dims", default="1024,512,256,128,64",
                   type=int_tuple)
    p.add_argument("--normalization", default="batch")
    p.add_argument("--activation", default="leakyrelu-0.2")
    p.add_argument("--layout_noise_dim", default=32, type=int)
    p.add_argument("--use_boxes_pred_after", default=-1, type=int)
    # Losses
    p.add_argument("--mask_loss_weight", default=0.0, type=float)
    p.add_argument("--l1_pixel_loss_weight", default=1.0, type=float)
    p.add_argument("--bbox_pred_loss_weight", default=10.0, type=float)
    p.add_argument("--predicate_pred_loss_weight", default=0.0, type=float)
    # Discriminators
    p.add_argument("--discriminator_loss_weight", default=0.01, type=float)
    p.add_argument("--gan_loss_type", default="gan")
    p.add_argument("--d_clip", default=None, type=float,
                   help="WGAN weight clip bound applied to both D param "
                        "sets after each update (the reference parses but "
                        "never applies this flag; we implement the intent)")
    p.add_argument("--d_normalization", default="batch")
    p.add_argument("--d_padding", default="valid")
    p.add_argument("--d_activation", default="leakyrelu-0.2")
    p.add_argument("--d_obj_arch", default="C4-64-2,C4-128-2,C4-256-2")
    p.add_argument("--crop_size", default=32, type=int)
    p.add_argument("--d_obj_weight", default=1.0, type=float)
    p.add_argument("--ac_loss_weight", default=0.1, type=float)
    p.add_argument("--d_img_arch", default="C4-64-2,C4-128-2,C4-256-2")
    p.add_argument("--d_img_weight", default=1.0, type=float)
    # Output
    p.add_argument("--print_every", default=10, type=int)
    p.add_argument("--timing", default=False, type=bool_flag)
    p.add_argument("--checkpoint_every", default=10000, type=int)
    p.add_argument("--snapshot_every", default=-1, type=int,
                   help="also emit reference-layout snapshot_%%05dK.pt "
                        "generator checkpoints every N iterations "
                        "(consumable by sample_images snapshot dirs and "
                        "the upstream torch scripts; extension flag)")
    p.add_argument("--output_dir", default=os.getcwd())
    p.add_argument("--checkpoint_name", default="checkpoint")
    p.add_argument("--checkpoint_start_from", default=None)
    p.add_argument("--restore_from_checkpoint", default=False, type=bool_flag)
    # TPU-native extras
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--data_parallel", default=1, type=int,
                   help="devices along the 'data' mesh axis")
    p.add_argument("--multihost", default=False, type=bool_flag,
                   help="multi-host data parallelism: "
                        "jax.distributed.initialize() + per-host disjoint "
                        "loader shards + mesh over all global devices "
                        "(batch_size is the GLOBAL batch)")
    p.add_argument("--pad_objects_to", default=None, type=int)
    p.add_argument("--pad_triples_to", default=None, type=int)
    p.add_argument("--profile_dir", default=None,
                   help="jax.profiler trace output dir")
    p.add_argument("--bf16_compute", default=False, type=bool_flag,
                   help="bf16 CRN convs + bf16 inter-conv activation chain "
                        "(+4.3%% e2e inference on v5e at 64 dB PSNR vs f32; "
                        "train-mode BN stats stay f32)")
    p.add_argument("--crn_mode", default=None,
                   choices=["legacy", "split"],
                   help="CRN stage-conv formulation; 'split' avoids "
                        "materializing the per-stage concat (exact up to "
                        "sum reassociation — the fast-training mode, with "
                        "--bf16_compute); 'legacy' (default) keeps the "
                        "reference-shaped composition.  The retired "
                        "research modes (phase/split_noise/packed) are "
                        "library-only (ARCHITECTURE §7)")
    p.add_argument("--async_checkpoint", default=False, type=bool_flag,
                   help="overlap checkpoint disk writes with training: "
                        "the state is materialized off the device before "
                        "the step loop continues and the serialize+write "
                        "runs in the background (joined before any later "
                        "save/load and at interpreter exit).  The default "
                        "msgpack backend replaces atomically (crash keeps "
                        "the previous checkpoint); the orbax backend "
                        "rewrites its directory in place, and multi-host "
                        "orbax saves stay synchronous")
    p.add_argument("--tensorboard_dir", default=None,
                   help="also mirror the scalar stream as TensorBoard "
                        "events (train/* and eval/* tags; torch's event "
                        "writer, process 0 only)")
    p.add_argument("--log_jsonl", default=True, type=bool_flag,
                   help="append scalar records to <output_dir>/log.jsonl "
                        "(one JSON object per print/eval event — a "
                        "machine-readable mirror of the stdout stream for "
                        "dashboards; the in-checkpoint histories remain "
                        "the canonical record)")
    return p


def make_scalar_logger(config: TrainConfig, process_index: int = 0):
    """Append-mode JSONL scalar stream (``<output_dir>/log.jsonl``) and
    optional TensorBoard event mirror (``--tensorboard_dir``).

    TPU-native extension (the reference only prints to stdout,
    ``scripts/train.py:524-560``): one JSON object per print/eval event so
    dashboards can tail the run without parsing stdout or unpacking the
    checkpoint histories.  Appends across restarts — ``t`` identifies the
    step, so a resumed run continues the same stream.  No-op on non-zero
    processes under --multihost (metrics are already globally reduced).
    """
    if process_index != 0 or not (config.log_jsonl
                                  or config.tensorboard_dir):
        return lambda record: None
    path = os.path.join(config.output_dir, "log.jsonl")
    tb = None
    if config.tensorboard_dir:
        try:
            # torch's event writer (torch-cpu is a baked-in dependency);
            # scalars land under train/ and eval/ tags keyed by step t.
            from torch.utils.tensorboard import SummaryWriter

            tb = SummaryWriter(config.tensorboard_dir)
        except Exception as e:  # pragma: no cover — optional sink
            print(f"WARNING: --tensorboard_dir disabled ({e!r})")

    def write(record):
        if config.log_jsonl:
            with open(path, "a") as f:
                f.write(json.dumps(record) + "\n")
        if tb is not None:
            kind, t = record.get("kind", "train"), record.get("t", 0)
            for k, v in record.items():
                if k in ("kind", "t"):
                    continue
                if isinstance(v, (int, float)) and not isinstance(v, bool):
                    tb.add_scalar(f"{kind}/{k}", v, global_step=int(t))
            tb.flush()

    return write


def config_from_args(args) -> TrainConfig:
    fields = {f.name for f in dataclasses.fields(TrainConfig)}
    kw = {k: v for k, v in vars(args).items() if k in fields and v is not None}
    cfg = TrainConfig(**kw)
    # Auto-derive static pad targets from dataset caps (each flag
    # independently; explicit values are never clobbered).
    if cfg.dataset == "coco":
        o_cap = 8 + 1  # max_objects_per_image + __image__
        t_cap = 8 + 8  # one heuristic triple per object + __in_image__
    else:
        o_cap = cfg.max_objects_per_image + 1  # (+1 quirk-safe below)
        t_cap = 30 + cfg.max_objects_per_image + 1
    from sg2im_tpu.data.batching import round_up

    if args.pad_objects_to is None:
        cfg = dataclasses.replace(cfg, pad_objects_to=round_up(o_cap + 1, 8))
    if args.pad_triples_to is None:
        cfg = dataclasses.replace(cfg, pad_triples_to=round_up(t_cap, 8))
    return cfg


def check_args(config: TrainConfig):
    H, _ = config.image_size
    for _ in config.refinement_network_dims[1:]:
        H = H // 2
    if H == 0:
        raise ValueError("Too many layers in refinement network")


def build_datasets(config: TrainConfig):
    def cache_sub(split):
        # Separate subdir per split; processes share the same cache (the
        # build is process-0-idempotent: later readers see meta.json).
        if not config.cache_dir:
            return None
        return os.path.join(config.cache_dir, f"{config.dataset}_{split}")

    if config.dataset == "coco":
        from sg2im_tpu.data.coco import CocoSceneGraphDataset

        common = dict(
            stuff_only=config.coco_stuff_only,
            image_size=config.image_size,
            mask_size=config.mask_size,
            min_object_size=config.min_object_size,
            min_objects_per_image=config.min_objects_per_image,
            instance_whitelist=config.instance_whitelist,
            stuff_whitelist=config.stuff_whitelist,
            include_other=config.coco_include_other,
            include_relationships=config.include_relationships,
            seed=config.seed,  # reproducible for any loader_num_workers
            decoder=config.decoder,
        )
        train = CocoSceneGraphDataset(
            image_dir=config.coco_train_image_dir,
            instances_json=config.coco_train_instances_json,
            stuff_json=config.coco_train_stuff_json,
            max_samples=config.num_train_samples,
            cache_dir=cache_sub("train"), **common)
        val = CocoSceneGraphDataset(
            image_dir=config.coco_val_image_dir,
            instances_json=config.coco_val_instances_json,
            stuff_json=config.coco_val_stuff_json,
            max_samples=config.num_val_samples,
            cache_dir=cache_sub("val"), **common)
        assert train.vocab == val.vocab
        return train.vocab, train, val
    from sg2im_tpu.data.vg import VgSceneGraphDataset

    with open(config.vocab_json) as f:
        vocab = json.load(f)
    common = dict(
        vocab=vocab, image_dir=config.vg_image_dir,
        image_size=config.image_size,
        max_objects=config.max_objects_per_image,
        use_orphaned_objects=config.vg_use_orphaned_objects,
        include_relationships=config.include_relationships,
        seed=config.seed,  # reproducible for any loader_num_workers
        decoder=config.decoder)
    train = VgSceneGraphDataset(h5_path=config.train_h5,
                                max_samples=config.num_train_samples,
                                cache_dir=cache_sub("train"), **common)
    # Reference uses the FULL val split (build_vg_dsets deletes
    # max_samples, train.py:281); check_model caps the sweep instead.
    val = VgSceneGraphDataset(h5_path=config.val_h5,
                              cache_dir=cache_sub("val"), **common)
    return vocab, train, val


def main(argv=None):
    args = build_parser().parse_args(argv)
    config = config_from_args(args)
    check_args(config)

    shard = None
    if args.multihost:
        # Must run before any other backend touch (SURVEY §2.6 plan).
        import jax

        from sg2im_tpu.parallel.mesh import init_multihost

        proc, nproc = init_multihost()
        if config.batch_size % nproc:
            raise SystemExit(
                f"--batch_size {config.batch_size} (global) must divide by "
                f"process_count {nproc}")
        if nproc > 1:
            shard = (proc, nproc)
        import math

        ndev = len(jax.devices())
        n_data = math.gcd(config.batch_size, ndev)
        if n_data != ndev and nproc > 1:
            # A device-subset mesh can exclude entire hosts, leaving their
            # processes with no addressable shard of the global batch —
            # make_array_from_process_local_data cannot assemble that.
            raise SystemExit(
                f"--batch_size {config.batch_size} (global) must divide by "
                f"the {ndev} global devices under multi-process multihost "
                f"(a gcd subset mesh would strand hosts)")
        if n_data != ndev:
            print(f"multihost: batch_size {config.batch_size} not divisible "
                  f"by {ndev} devices; sharding over {n_data}")
        config = dataclasses.replace(config, data_parallel=n_data)
        print(f"multihost: process {proc}/{nproc}, {ndev} global devices "
              f"({jax.local_device_count()} local)")

    import jax  # after init_multihost: importing jax does not init the backend

    from sg2im_tpu.data.loader import PaddedLoader, prefetch_to_device
    from sg2im_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from sg2im_tpu.train.trainer import Trainer
    from sg2im_tpu.utils.timing import profile_trace, timeit

    warm_bundle = None
    if config.checkpoint_start_from:
        # Reference build_model (train.py:161-171) constructs the model from
        # the checkpoint's own kwargs+vocab, not from CLI flags — mirror
        # that by overriding the generator-shaping config fields first.
        from sg2im_tpu.ckpt.torch_convert import convert_checkpoint

        warm_bundle = convert_checkpoint(config.checkpoint_start_from)
        mk = warm_bundle["model_kwargs"]
        config = dataclasses.replace(
            config,
            image_size=tuple(mk.get("image_size", config.image_size)),
            embedding_dim=mk.get("embedding_dim", config.embedding_dim),
            gconv_dim=mk.get("gconv_dim", config.gconv_dim),
            gconv_hidden_dim=mk.get("gconv_hidden_dim",
                                    config.gconv_hidden_dim),
            gconv_num_layers=mk.get("gconv_num_layers",
                                    config.gconv_num_layers),
            mlp_normalization=mk.get("mlp_normalization",
                                     config.mlp_normalization),
            refinement_network_dims=tuple(mk.get(
                "refinement_dims", config.refinement_network_dims)),
            normalization=mk.get("normalization", config.normalization),
            activation=mk.get("activation", config.activation),
            mask_size=mk.get("mask_size") or 0,
            layout_noise_dim=mk.get("layout_noise_dim",
                                    config.layout_noise_dim),
        )

    vocab, train_ds, val_ds = build_datasets(config)
    if warm_bundle is not None:
        ck_vocab = warm_bundle["vocab"]
        if (len(ck_vocab["object_idx_to_name"])
                != len(vocab["object_idx_to_name"])):
            print("WARNING: checkpoint vocab size differs from dataset "
                  "vocab; using the checkpoint's (weights define it)")
        vocab = ck_vocab
    if args.pad_triples_to is None and config.dataset == "vg":
        # Don't trust the preprocess default of 30 rels: read the true cap
        # from the h5 (silent triple truncation would impoverish graphs).
        rel_cap = int(train_ds.data["relationship_subjects"].shape[1])
        t_cap = rel_cap + config.max_objects_per_image + 1
        from sg2im_tpu.data.batching import round_up

        config = dataclasses.replace(config,
                                     pad_triples_to=round_up(t_cap, 8))
    print(f"Training dataset has {len(train_ds)} images")
    # Under multihost each process loads global_batch/process_count samples
    # from its disjoint shard; shard_batch assembles the global batch.
    local_bs = (config.batch_size // shard[1] if shard is not None
                else config.batch_size)
    loader_kw = dict(batch_size=local_bs,
                     O_max=config.pad_objects_to,
                     T_max=config.pad_triples_to,
                     num_workers=config.loader_num_workers,
                     seed=config.seed, shard=shard)
    train_loader = PaddedLoader(train_ds, shuffle=True, **loader_kw)
    val_loader = PaddedLoader(val_ds, shuffle=config.shuffle_val, **loader_kw)

    trainer = Trainer(config, vocab)
    state = trainer.init_state(seed=config.seed)
    if warm_bundle is not None:
        repl = {"g_vars": warm_bundle["generator"]}
        if warm_bundle["d_obj"] is not None and state.d_obj_vars is not None:
            repl["d_obj_vars"] = warm_bundle["d_obj"]
        if warm_bundle["d_img"] is not None and state.d_img_vars is not None:
            repl["d_img_vars"] = warm_bundle["d_img"]
        state = state.replace(**repl)
        print(f"Warm-started from {config.checkpoint_start_from} "
              f"({sorted(repl)})")

    history = {"losses": defaultdict(list), "losses_ts": [],
               "checkpoint_ts": [], "train_iou": [], "val_iou": [],
               "val_losses": defaultdict(list)}
    # Per-eval triptych samples + batch tensors, persisted like the
    # reference checkpoint dict (train.py:611-661) — arrays live in a
    # msgpack sidecar, not meta.json.
    sample_history = {"train_samples": [], "train_batch_data": [],
                      "val_samples": [], "val_batch_data": []}
    os.makedirs(config.output_dir, exist_ok=True)
    log_scalars = make_scalar_logger(config, jax.process_index())
    ckpt_path = os.path.join(config.output_dir,
                             f"{config.checkpoint_name}_state")
    if config.restore_from_checkpoint and os.path.exists(ckpt_path):
        state, meta = trainer.load_checkpoint(ckpt_path, state)
        print(f"Restored checkpoint at t={int(state.step)}")
        if meta.get("extra"):
            for k, v in meta["extra"].items():
                if k in history:
                    history[k] = (defaultdict(list, v)
                                  if isinstance(v, dict) else v)
        for k, v in (meta.get("arrays") or {}).items():
            if k in sample_history:
                sample_history[k] = list(v)

    t = int(state.step)
    switched = 0 <= config.eval_mode_after < t
    with profile_trace(args.profile_dir):
        while t < config.num_iterations:
            train_iter = (iter(train_loader) if trainer.mesh is not None
                          else prefetch_to_device(iter(train_loader)))
            for batch in train_iter:
                if t >= config.num_iterations:
                    break
                if (not switched and config.eval_mode_after >= 0
                        and t >= config.eval_mode_after):
                    print("switching to eval mode")
                    state = trainer.reset_g_optimizer(state)
                    switched = True
                with timeit("step", config.timing) as tbox:
                    state, metrics = trainer.step(state, batch)
                    # Fence on the loss so the print covers device compute,
                    # not just dispatch (tunnel-safe host-scalar read).
                    tbox["sync"] = metrics["total_loss"]
                t += 1

                if t % config.print_every == 0:
                    print(f"t = {t} / {config.num_iterations}")
                    if config.timing:
                        # Per-phase device times (reference --timing
                        # forward/loss/backward, train.py:524-560).
                        for name, ms in trainer.step_breakdown(
                                state, batch).items():
                            print(f"  {name}: {ms:.2f}ms")
                    scalars = {}
                    for name, val in sorted(metrics.items()):
                        v = float(val)
                        print(f"  [{name}]: {v:.4f}")
                        history["losses"][name].append(v)
                        scalars[name] = v
                    history["losses_ts"].append(t)
                    log_scalars({"kind": "train", "t": t, **scalars})

                if t % config.checkpoint_every == 0:
                    print("checking on train")
                    t_losses, t_samples, t_bd, t_iou = trainer.check_model(
                        state, iter(train_loader),
                        num_samples=config.num_val_samples,
                        return_samples=True)
                    print("train iou:", t_iou)
                    history["train_iou"].append(t_iou)
                    sample_history["train_samples"].append(t_samples)
                    sample_history["train_batch_data"].append(t_bd)
                    print("checking on val")
                    val_losses, v_samples, v_bd, val_iou = \
                        trainer.check_model(
                            state, iter(val_loader),
                            num_samples=config.num_val_samples,
                            return_samples=True)
                    print("val iou:", val_iou)
                    history["checkpoint_ts"].append(t)
                    history["val_iou"].append(val_iou)
                    sample_history["val_samples"].append(v_samples)
                    sample_history["val_batch_data"].append(v_bd)
                    for k, v in val_losses.items():
                        history["val_losses"][k].append(v)
                    log_scalars({"kind": "eval", "t": t,
                                 "train_iou": float(t_iou),
                                 "val_iou": float(val_iou),
                                 **{f"val_{k}": float(v)
                                    for k, v in val_losses.items()}})
                    trainer.save_checkpoint(
                        state, ckpt_path,
                        extra={k: (dict(v) if isinstance(v, defaultdict)
                                   else v) for k, v in history.items()},
                        arrays=sample_history,
                        wait=not config.async_checkpoint)
                    print("Saved checkpoint to", ckpt_path)

                if (config.snapshot_every > 0
                        and t % config.snapshot_every == 0
                        and jax.process_index() == 0):
                    from sg2im_tpu.ckpt.torch_convert import (
                        export_torch_checkpoint)

                    # One naming scheme per run so sorted(listdir()) is
                    # chronological (sample_images consumes snapshot dirs
                    # in name order): reference-style K names when every
                    # snapshot lands on the 1K grid, exact-iteration names
                    # otherwise.
                    tag = (f"{t // 1000:05d}K"
                           if config.snapshot_every % 1000 == 0
                           else f"{t:07d}")
                    snap = os.path.join(config.output_dir,
                                        f"snapshot_{tag}.pt")
                    # _to_host, not device_get: under --multihost the
                    # replicated state spans non-addressable devices and
                    # plain device_get raises (same crash class ckpt/store
                    # handles); _to_host reads the local replica shard.
                    from sg2im_tpu.ckpt.store import _to_host

                    export_torch_checkpoint(
                        snap, jax.tree.map(_to_host, state.g_vars),
                        config.generator_kwargs(), vocab,
                        args=dataclasses.asdict(config))
                    print("Saved snapshot to", snap)
    from sg2im_tpu.ckpt.store import wait_pending

    wait_pending()  # --async_checkpoint: never exit mid-write
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
