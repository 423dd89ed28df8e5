"""CLI end-to-end tests: train on synthetic COCO, resume, sample_images."""

import json
import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

from tests.test_data import _fake_coco, _fake_vg

TINY_FLAGS = [
    "--dataset", "coco",
    "--batch_size", "2",
    "--image_size", "16,16",
    "--embedding_dim", "8",
    "--gconv_dim", "12",
    "--gconv_hidden_dim", "16",
    "--gconv_num_layers", "2",
    "--refinement_network_dims", "12,8",
    "--mask_size", "4",
    "--layout_noise_dim", "4",
    "--crop_size", "8",
    "--d_obj_arch", "C3-8-2",
    "--d_img_arch", "C3-8-2",
    "--print_every", "1",
    "--checkpoint_every", "2",
    "--loader_num_workers", "1",
    "--num_val_samples", "2",
]


@pytest.mark.skipif(
    not os.environ.get("SG2IM_RUN_MULTIHOST_PROOF"),
    reason="real 2-process multi-controller proof (~4 min on 1 CPU); "
           "opt in with SG2IM_RUN_MULTIHOST_PROOF=1")
def test_multihost_proof(tmp_path):
    """CI hook for scripts/multihost_proof.py (two actual processes joined
    via jax.distributed; see MULTIHOST_PROOF.md)."""
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rc = subprocess.call(
        [_sys.executable, os.path.join(repo, "scripts", "multihost_proof.py"),
         "--out", str(tmp_path), "--data_root",
         os.path.join(str(tmp_path), "data"),
         "--report", os.path.join(str(tmp_path), "report.md")],
        cwd=repo)
    assert rc == 0


def test_multihost_smoke_two_process(tmp_path):
    """Always-on minimal 2-process multi-controller smoke: REAL
    ``jax.distributed.initialize`` between two processes, per-host loader
    shards -> ``make_array_from_process_local_data`` global batches,
    sharded eval sweep, process-0 checkpoint write — 2 iterations on a
    16x16 config (2 virtual devices/process).  The full proof (4 iters,
    resume leg, MULTIHOST_PROOF.md) stays opt-in above; this variant
    exists so the distributed path has coverage in every plain
    ``pytest tests/`` run."""
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, SG2IM_PROOF_SMOKE="1")
    # The parent process only orchestrates; children set their own
    # XLA_FLAGS/platform. Drop any test-harness CPU pinning leakage.
    rc = subprocess.call(
        [_sys.executable, os.path.join(repo, "scripts", "multihost_proof.py"),
         "--out", str(tmp_path), "--data_root",
         os.path.join(str(tmp_path), "data"),
         "--report", os.path.join(str(tmp_path), "report.md")],
        cwd=repo, env=env)
    assert rc == 0


def test_train_cli_vg(tmp_path, capsys):
    """VG train path through the CLI (h5 + vocab.json + images): the COCO
    smoke covers the loop; this pins the VG dataset/pad wiring
    (pad_triples_to derived from the h5's true relationship cap)."""
    import json

    from sg2im_tpu.cli.train import main

    vocab, h5_path, img_dir = _fake_vg(str(tmp_path))
    vocab_json = os.path.join(tmp_path, "vocab.json")
    with open(vocab_json, "w") as f:
        json.dump(vocab, f)
    out_dir = os.path.join(tmp_path, "vgrun")
    flags = TINY_FLAGS + [
        "--dataset", "vg", "--train_h5", h5_path, "--val_h5", h5_path,
        "--vocab_json", vocab_json, "--vg_image_dir", img_dir,
        "--max_objects_per_image", "6", "--batch_size", "2",
        "--num_iterations", "2", "--checkpoint_every", "2",
        "--num_val_samples", "2", "--output_dir", out_dir]
    assert main(flags) == 0
    captured = capsys.readouterr().out
    assert "t = 2 / 2" in captured and "val iou:" in captured
    assert os.path.exists(
        os.path.join(out_dir, "checkpoint_state", "state.msgpack"))


def _coco_flags(tmp_path):
    img_dir, inst_path, stuff_path = _fake_coco(str(tmp_path))
    return TINY_FLAGS + [
        "--coco_train_image_dir", img_dir,
        "--coco_val_image_dir", img_dir,
        "--coco_train_instances_json", inst_path,
        "--coco_val_instances_json", inst_path,
        "--coco_train_stuff_json", stuff_path,
        "--coco_val_stuff_json", stuff_path,
    ]


def test_train_cli_and_resume(tmp_path, capsys):
    from sg2im_tpu.cli.train import main

    # out_dir deliberately NOT pre-created: the CLI must make it (a
    # snapshot before the first checkpoint crashed otherwise).
    out_dir = os.path.join(tmp_path, "run")
    tb_dir = os.path.join(tmp_path, "tb")
    flags = _coco_flags(tmp_path) + [
        "--num_iterations", "4", "--output_dir", out_dir,
        "--snapshot_every", "3", "--tensorboard_dir", tb_dir]
    assert main(flags) == 0
    captured = capsys.readouterr().out
    assert "t = 4 / 4" in captured
    assert "val iou:" in captured
    ckpt = os.path.join(out_dir, "checkpoint_state")
    assert os.path.exists(os.path.join(ckpt, "state.msgpack"))

    # --snapshot_every emits a reference-layout .pt readable by the
    # converter (and the sample_images snapshot-dir workflow).
    snap = os.path.join(out_dir, "snapshot_0000003.pt")
    assert os.path.exists(snap), os.listdir(out_dir)
    from sg2im_tpu.ckpt.torch_convert import convert_checkpoint

    bundle = convert_checkpoint(snap)
    assert bundle["generator"] is not None
    assert "compute_dtype" not in bundle["model_kwargs"]

    # Triptych samples + batch data persist per eval (reference
    # train.py:611-661 checkpoint keys).
    import flax.serialization as _ser

    with open(os.path.join(ckpt, "history.msgpack"), "rb") as f:
        arrays = _ser.msgpack_restore(f.read())
    assert set(arrays) == {"train_samples", "train_batch_data",
                           "val_samples", "val_batch_data"}
    assert len(arrays["val_samples"]) == 2  # evals at t=2 and t=4
    trip = arrays["val_samples"][0]
    for key in ("gt_img", "gt_box_gt_mask", "gt_box_pred_mask",
                "pred_box_pred_mask"):
        img = trip[key]
        assert img.dtype == np.uint8 and img.shape == (2, 16, 16, 3)
    bd = arrays["val_batch_data"][0]
    assert bd["boxes_pred"].shape == bd["boxes_gt"].shape
    assert {"objs", "triples", "obj_mask", "triple_mask",
            "masks_gt", "masks_pred"} <= set(bd)

    # --log_jsonl (default on) mirrors the stdout scalars to a
    # machine-readable stream: one record per print (kind=train) and per
    # eval (kind=eval, with IoUs + val losses).
    log_path = os.path.join(out_dir, "log.jsonl")
    with open(log_path) as f:
        records = [json.loads(line) for line in f]
    train_recs = [r for r in records if r["kind"] == "train"]
    eval_recs = [r for r in records if r["kind"] == "eval"]
    assert [r["t"] for r in train_recs] == [1, 2, 3, 4]  # print_every=1
    assert "total_loss" in train_recs[0]
    assert [r["t"] for r in eval_recs] == [2, 4]  # checkpoint_every=2

    # --tensorboard_dir mirrors the same scalars as TB events (train/*
    # and eval/* tags at the right steps).  The sink is optional — on
    # hosts without the tensorboard package the CLI warns and skips it,
    # so only assert when the reader is importable.
    try:
        from tensorboard.backend.event_processing.event_accumulator \
            import EventAccumulator
    except ImportError:
        EventAccumulator = None
    if EventAccumulator is not None and os.listdir(tb_dir):
        acc = EventAccumulator(tb_dir)
        acc.Reload()
        tags = set(acc.Tags()["scalars"])
        assert "train/total_loss" in tags and "eval/val_iou" in tags
        steps = [e.step for e in acc.Scalars("train/total_loss")]
        assert steps == [1, 2, 3, 4]
    assert {"train_iou", "val_iou", "val_total_loss"} <= set(eval_recs[0])

    # Resume and run 2 more iterations.
    flags2 = _coco_flags(tmp_path) + [
        "--num_iterations", "6", "--output_dir", out_dir,
        "--restore_from_checkpoint", "1"]
    assert main(flags2) == 0
    captured = capsys.readouterr().out
    assert "Restored checkpoint at t=4" in captured
    assert "t = 6 / 6" in captured

    # The scalar stream appends across the restart (t identifies steps).
    with open(log_path) as f:
        records = [json.loads(line) for line in f]
    assert [r["t"] for r in records if r["kind"] == "train"] == \
        [1, 2, 3, 4, 5, 6]


def test_sample_images_cli(tmp_path, monkeypatch):
    import torch.nn.functional as F

    orig = F.grid_sample
    monkeypatch.setattr(
        F, "grid_sample",
        lambda i, g, **kw: orig(i, g, align_corners=True))

    from sg2im.model import Sg2ImModel

    vocab, h5_path, img_dir = _fake_vg(str(tmp_path))
    torch.manual_seed(0)
    kwargs = dict(image_size=(16, 16), embedding_dim=8, gconv_dim=12,
                  gconv_hidden_dim=16, gconv_num_layers=2,
                  refinement_dims=(12, 8), mask_size=4, layout_noise_dim=4)
    model = Sg2ImModel(vocab=vocab, **kwargs)
    ckpt_path = os.path.join(tmp_path, "m.pt")
    torch.save({"model_state": model.state_dict(),
                "model_kwargs": dict(kwargs, vocab=vocab),
                "args": {"dataset": "vg", "max_objects_per_image": 6}},
               ckpt_path)

    from sg2im_tpu.cli.sample_images import main

    out_dir = os.path.join(tmp_path, "samples")
    rc = main([
        "--checkpoint", ckpt_path, "--dataset", "vg",
        "--image_size", "16,16", "--batch_size", "2", "--num_samples", "4",
        "--vg_h5", h5_path, "--vg_image_dir", img_dir,
        "--output_dir", out_dir, "--save_gt_imgs", "1",
        "--use_gt_boxes", "1", "--loader_num_workers", "1",
    ])
    assert rc == 0
    imgs = sorted(os.listdir(os.path.join(out_dir, "img")))
    assert len(imgs) == 4
    assert os.path.exists(os.path.join(out_dir, "gt_img", "img000000.png"))
    data = np.load(os.path.join(out_dir, "data.npz"))
    assert data["boxes_pred"].shape[0] >= 4


def test_export_native_to_torch(tmp_path, monkeypatch):
    """Native train checkpoint -> reference .pt -> loads in upstream model."""
    import torch.nn.functional as F

    orig = F.grid_sample
    monkeypatch.setattr(F, "grid_sample",
                        lambda i, g, **kw: orig(i, g, align_corners=True))

    from sg2im_tpu.cli.train import main as train_main

    out_dir = os.path.join(tmp_path, "run")
    os.makedirs(out_dir)
    flags = _coco_flags(tmp_path) + [
        "--num_iterations", "2", "--output_dir", out_dir]
    assert train_main(flags) == 0

    from sg2im_tpu.cli.checkpoint_tools import main as tools_main

    pt_path = os.path.join(tmp_path, "exported.pt")
    assert tools_main(["export", os.path.join(out_dir, "checkpoint_state"),
                       pt_path]) == 0

    from sg2im.model import Sg2ImModel

    ckpt = torch.load(pt_path, weights_only=False)
    model = Sg2ImModel(**ckpt["model_kwargs"])
    missing, unexpected = model.load_state_dict(ckpt["model_state"],
                                                strict=False)
    assert not unexpected, unexpected
    assert all(k.endswith("num_batches_tracked") for k in missing), missing
    model.eval()
    with torch.no_grad():
        img, *_ = model(torch.tensor([1, 2, 0]),
                        torch.tensor([[0, 1, 1], [0, 0, 2], [1, 0, 2]]),
                        torch.zeros(3, dtype=torch.long))
    assert img.shape[-2:] == (16, 16)


def test_sample_images_train_mode(tmp_path, monkeypatch):
    """--model_mode train (batch-stat normalization) must not crash."""
    import torch.nn.functional as F

    orig = F.grid_sample
    monkeypatch.setattr(F, "grid_sample",
                        lambda i, g, **kw: orig(i, g, align_corners=True))

    from sg2im.model import Sg2ImModel

    vocab, h5_path, img_dir = _fake_vg(str(tmp_path))
    torch.manual_seed(0)
    kwargs = dict(image_size=(16, 16), embedding_dim=8, gconv_dim=12,
                  gconv_hidden_dim=16, gconv_num_layers=2,
                  refinement_dims=(12, 8), mask_size=4, layout_noise_dim=4)
    model = Sg2ImModel(vocab=vocab, **kwargs)
    ckpt_path = os.path.join(tmp_path, "m.pt")
    torch.save({"model_state": model.state_dict(),
                "model_kwargs": dict(kwargs, vocab=vocab),
                "args": {"dataset": "vg", "max_objects_per_image": 6}},
               ckpt_path)

    from sg2im_tpu.cli.sample_images import main

    out_dir = os.path.join(tmp_path, "samples_train")
    rc = main(["--checkpoint", ckpt_path, "--dataset", "vg",
               "--image_size", "16,16", "--batch_size", "2",
               "--num_samples", "2", "--vg_h5", h5_path,
               "--vg_image_dir", img_dir, "--output_dir", out_dir,
               "--model_mode", "train", "--loader_num_workers", "1"])
    assert rc == 0
    assert len(os.listdir(os.path.join(out_dir, "img"))) == 2


def test_checkpoint_start_from_warm_start(tmp_path, monkeypatch, capsys):
    """--checkpoint_start_from loads reference .pt weights into the
    generator before training (reference train.py:161-171)."""
    import torch.nn.functional as F

    orig = F.grid_sample
    monkeypatch.setattr(F, "grid_sample",
                        lambda i, g, **kw: orig(i, g, align_corners=True))

    from sg2im.model import Sg2ImModel

    # Vocab matching the synthetic COCO fixture (ids 0..90 -> 91 names).
    from sg2im_tpu.cli.train import build_parser, config_from_args, \
        build_datasets

    flags = _coco_flags(tmp_path)
    args = build_parser().parse_args(
        flags + ["--num_iterations", "1", "--output_dir", str(tmp_path)])
    config = config_from_args(args)
    vocab, _, _ = build_datasets(config)

    torch.manual_seed(3)
    ref = Sg2ImModel(vocab=vocab, **config.generator_kwargs())
    ckpt_path = os.path.join(tmp_path, "warm.pt")
    torch.save({"model_state": ref.state_dict(),
                "model_kwargs": dict(config.generator_kwargs(), vocab=vocab),
                "args": {}}, ckpt_path)

    from sg2im_tpu.cli.train import main

    out_dir = os.path.join(tmp_path, "warm_run")
    os.makedirs(out_dir)
    rc = main(flags + ["--num_iterations", "1", "--output_dir", out_dir,
                       "--checkpoint_start_from", ckpt_path])
    assert rc == 0
    assert "Warm-started from" in capsys.readouterr().out


def test_multihost_flag_single_process(tmp_path, capsys):
    """--multihost on one process degrades to the plain mesh path (the
    distributed runtime has no coordinator here) and still trains."""
    from sg2im_tpu.cli.train import main

    out_dir = os.path.join(tmp_path, "mh")
    os.makedirs(out_dir)
    flags = _coco_flags(tmp_path) + [
        "--num_iterations", "2", "--output_dir", out_dir, "--multihost", "1"]
    assert main(flags) == 0
    out = capsys.readouterr().out
    assert "multihost: process 0/1" in out
    assert "t = 2 / 2" in out


def test_multihost_simulated_two_host_coverage(tmp_path):
    """Simulated 2-host split through the cli's own loader construction:
    per-host loaders (shard=(k,2), local batch = global//2) jointly cover
    exactly the batches the single-host loader yields (VERDICT #5)."""
    from sg2im_tpu.cli.train import build_datasets, build_parser, \
        config_from_args
    from sg2im_tpu.data.loader import PaddedLoader

    flags = _coco_flags(tmp_path) + ["--batch_size", "2"]
    config = config_from_args(build_parser().parse_args(flags))
    _, train_ds, _ = build_datasets(config)

    def loader(shard, bs):
        return PaddedLoader(train_ds, batch_size=bs,
                            O_max=config.pad_objects_to,
                            T_max=config.pad_triples_to,
                            num_workers=1, seed=config.seed, shuffle=True,
                            shard=shard)

    global_imgs = np.concatenate(
        [b["imgs"] for b in loader(None, 2)])
    host_imgs = np.concatenate(
        [b["imgs"] for k in range(2) for b in loader((k, 2), 1)])
    assert host_imgs.shape == global_imgs.shape
    a = sorted(np.abs(global_imgs).sum(axis=(1, 2, 3)).tolist())
    b = sorted(np.abs(host_imgs).sum(axis=(1, 2, 3)).tolist())
    np.testing.assert_allclose(a, b, rtol=1e-6)
