"""Checkpoint introspection & slimming CLIs.

Equivalents of reference ``scripts/print_args.py`` and
``scripts/strip_checkpoint.py`` that work on both reference ``.pt``
checkpoints and this framework's native stores.

Usage:
    python -m sg2im_tpu.cli.checkpoint_tools print_args CKPT
    python -m sg2im_tpu.cli.checkpoint_tools strip IN.pt OUT.pt \
        [--keep_discriminators 1]
    python -m sg2im_tpu.cli.checkpoint_tools clean IN.pt OUT.pt
    python -m sg2im_tpu.cli.checkpoint_tools export NATIVE_CKPT_DIR OUT.pt
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _load_any(path):
    if os.path.isdir(path):  # native store
        meta_path = os.path.join(path, "meta.json")
        with open(meta_path) as f:
            meta = json.load(f)
        return {"args": (meta.get("config") or {}), "_native": True}
    from sg2im_tpu.ckpt.torch_convert import load_reference_checkpoint

    return load_reference_checkpoint(path)


def print_args(path: str):
    """Print the training args stored in a checkpoint (reference
    ``scripts/print_args.py``)."""
    ckpt = _load_any(path)
    args = ckpt.get("args") or {}
    for k in sorted(args):
        print(f"{k}: {args[k]}")
    return 0


def _require_pt(ckpt, subcommand: str):
    """strip/clean operate on .pt dicts; a native store has no
    model_state here, so proceeding would write a weightless .pt while
    printing success."""
    if ckpt.get("_native"):
        print(f"ERROR: {subcommand} operates on .pt checkpoints; for a "
              f"native checkpoint directory use "
              f"'checkpoint_tools export DIR OUT.pt' first")
        return False
    return True


def strip(in_path: str, out_path: str, keep_discriminators: bool = True):
    """Strip a .pt checkpoint down to inference essentials (reference
    ``scripts/strip_checkpoint.py:54-63``: keep args/model_state/
    model_kwargs [+ discriminator pairs])."""
    import torch

    ckpt = _load_any(in_path)
    if not _require_pt(ckpt, "strip"):
        return 1
    keep = ["args", "model_state", "model_kwargs"]
    if keep_discriminators:
        keep += ["d_img_state", "d_img_kwargs", "d_obj_state", "d_obj_kwargs"]
    out = {k: v for k, v in ckpt.items() if k in keep}
    torch.save(out, out_path)
    print(f"Wrote stripped checkpoint to {out_path} "
          f"(kept {sorted(out.keys())})")
    return 0


def clean(in_path: str, out_path: str):
    """Remove deprecated model kwargs from a .pt checkpoint (reference
    ``scripts/strip_old_args.py:31-35``)."""
    import torch

    from sg2im_tpu.ckpt.torch_convert import DEPRECATED_MODEL_KWARGS

    ckpt = _load_any(in_path)
    if not _require_pt(ckpt, "clean"):
        return 1
    kw = dict(ckpt.get("model_kwargs") or {})
    removed = [k for k in DEPRECATED_MODEL_KWARGS if k in kw]
    for k in removed:
        del kw[k]
    ckpt["model_kwargs"] = kw
    torch.save(ckpt, out_path)
    print(f"Wrote {out_path} (removed deprecated kwargs: {removed})")
    return 0


def export(native_dir: str, out_path: str):
    """Export a native training checkpoint's generator back to a
    reference-layout .pt (loadable by the upstream Sg2ImModel)."""
    # Host-side tool: pin jax to CPU so the template init doesn't trigger a
    # multi-minute TPU compile (no device compute is needed here).
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

    from sg2im_tpu.ckpt.store import load_checkpoint
    from sg2im_tpu.ckpt.torch_convert import export_torch_checkpoint
    from sg2im_tpu.train.config import TrainConfig
    from sg2im_tpu.train.trainer import Trainer

    import json as _json
    import os as _os

    with open(_os.path.join(native_dir, "meta.json")) as f:
        meta = _json.load(f)
    cfg_dict = meta.get("config") or {}
    vocab = meta.get("vocab")
    fields = {f2.name for f2 in __import__("dataclasses").fields(TrainConfig)}
    config = TrainConfig(**{k: (tuple(v) if isinstance(v, list) else v)
                            for k, v in cfg_dict.items() if k in fields})
    trainer = Trainer(config, vocab)
    state, _ = trainer.load_checkpoint(native_dir)
    export_torch_checkpoint(out_path, state.g_vars,
                            config.generator_kwargs(), vocab,
                            args=cfg_dict)
    print(f"Exported generator to {out_path}")
    return 0


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    pa = sub.add_parser("print_args")
    pa.add_argument("checkpoint")
    ps = sub.add_parser("strip")
    ps.add_argument("input_checkpoint")
    ps.add_argument("output_checkpoint")
    ps.add_argument("--keep_discriminators", type=int, default=1)
    pc = sub.add_parser("clean")
    pc.add_argument("input_checkpoint")
    pc.add_argument("output_checkpoint")
    pe = sub.add_parser("export")
    pe.add_argument("native_dir")
    pe.add_argument("output_checkpoint")
    args = p.parse_args(argv)
    if args.cmd == "print_args":
        return print_args(args.checkpoint)
    if args.cmd == "clean":
        return clean(args.input_checkpoint, args.output_checkpoint)
    if args.cmd == "export":
        return export(args.native_dir, args.output_checkpoint)
    return strip(args.input_checkpoint, args.output_checkpoint,
                 bool(args.keep_discriminators))


if __name__ == "__main__":
    raise SystemExit(main())
