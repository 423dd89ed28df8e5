"""Per-section fidelity attribution for the bench PSNR proxy (VERDICT r3 #1).

Runs the exact flagship-scale (vg128) synthetic-checkpoint comparison that
``bench.measure_psnr_vs_reference`` scores, but instruments EVERY section of
both frameworks — GCN output, boxes/masks/rel heads, composed layout, each
CRN stage, final image — and reports the per-section divergence, so the
end-to-end PSNR can be attributed to the section where error enters (a
parity leak) or to multiplicative amplification through later sections
(proxy conditioning).

Reference: torch model hooked in-process (``sg2im/model.py:108-171``
section boundaries). Ours: ``flax capture_intermediates`` on the same
converted checkpoint.

Usage:  python scripts/attrib_psnr.py [flagship|tiny|trained]
Env:    ATTRIB_TPU=1 runs our side on the default backend (TPU under axon)
        instead of CPU; default CPU (fast iteration, isolates conditioning
        from TPU-precision effects).  ATTRIB_PROD=1 runs our side in the
        PRODUCTION serving mode (bf16 chain + Dense 'high' + split CRN)
        instead of the f32 parity mode.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch


def _apply_env_config():
    """Env-driven jax.config for STANDALONE runs — called from main()
    only, never at import (this module is imported by bench.py and the
    test suite, where mutating global config would change the host
    process's backend/precision)."""
    import jax

    if os.environ.get("ATTRIB_TPU", "0") not in ("1",):
        jax.config.update("jax_platforms", "cpu")
    if os.environ.get("ATTRIB_MATMUL_PRECISION"):
        # Diagnostic: raise the DEFAULT matmul/conv precision (the
        # model's explicit Dense/geometry HIGHEST pins are unaffected;
        # this moves the CRN/mask-head convs, deliberately default).
        jax.config.update("jax_default_matmul_precision",
                          os.environ["ATTRIB_MATMUL_PRECISION"])


def relerr(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30))


def psnr_of(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = float(((a - b) ** 2).mean())
    rng = float(b.max() - b.min()) or 1.0
    return 10.0 * np.log10(rng * rng / max(mse, 1e-30))


def build_proxy(scale: str):
    """(torch model, vocab, model_kwargs, scene graphs) — mirrors
    bench.measure_psnr_vs_reference's setup bit-for-bit at 'flagship';
    'tiny' reproduces the test-scale config of tests/test_inference.py."""
    sys.path.insert(0, "/root/reference")
    import torch.nn as tnn

    from sg2im.model import Sg2ImModel

    if scale == "flagship":
        num_objs, num_preds = 179, 46
        model_kwargs = dict(
            image_size=(128, 128), embedding_dim=128, gconv_dim=128,
            gconv_hidden_dim=512, gconv_num_layers=5,
            refinement_dims=(1024, 512, 256, 128, 64),
            normalization="batch", activation="leakyrelu-0.2",
            mask_size=16, layout_noise_dim=32)
    else:
        num_objs, num_preds = 5, 4
        model_kwargs = dict(
            image_size=(32, 32), embedding_dim=16, gconv_dim=24,
            gconv_hidden_dim=32, gconv_num_layers=2,
            refinement_dims=(16, 8), normalization="batch",
            activation="leakyrelu-0.2", mask_size=4,
            mlp_normalization="none", layout_noise_dim=6)
    names = ["__image__"] + [f"o{i}" for i in range(1, num_objs)]
    preds = ["__in_image__"] + [f"p{i}" for i in range(1, num_preds)]
    vocab = {
        "object_idx_to_name": names,
        "object_name_to_idx": {n: i for i, n in enumerate(names)},
        "pred_idx_to_name": preds,
        "pred_name_to_idx": {n: i for i, n in enumerate(preds)},
    }
    m = min(num_objs - 1, 14)
    pm = num_preds - 1
    sgs = [
        {"objects": [f"o{1 + i % m}" for i in range(3)],
         "relationships": [[0, f"p{1 + 0 % pm}", 1], [2, f"p{1 + 1 % pm}", 0]]},
        {"objects": [f"o{1 + (3 + i) % m}" for i in range(4)],
         "relationships": [[0, f"p{1 + 2 % pm}", 1], [1, f"p{1 + 3 % pm}", 2],
                           [3, f"p{1 + 4 % pm}", 0]]},
        {"objects": [f"o{1 + (7 + i) % m}" for i in range(2)],
         "relationships": [[0, f"p{1 + 5 % pm}", 1]]},
        {"objects": [f"o{1 + (9 + i) % m}" for i in range(5)],
         "relationships": [[0, f"p{1 + 6 % pm}", 4], [1, f"p{1 + 7 % pm}", 2],
                           [2, f"p{1 + 8 % pm}", 3]]},
    ]
    torch.manual_seed(0)
    model = Sg2ImModel(vocab=vocab, **model_kwargs)
    # Same box-head conditioning hack as bench.measure_psnr_vs_reference:
    # untrained final-ReLU heads otherwise emit degenerate boxes.
    box_linears = [mm for mm in model.box_net if isinstance(mm, tnn.Linear)]
    with torch.no_grad():
        box_linears[-1].weight.mul_(0.01)
        box_linears[-1].bias.copy_(torch.tensor([0.15, 0.2, 0.85, 0.8]))
    model.eval()
    return model, vocab, model_kwargs, sgs


def run_reference(model, sgs):
    """Forward the torch reference with per-section hooks. Returns dict of
    numpy arrays (flat object axis; NCHW->NHWC transposed)."""
    cap = {}

    def hook(name, transform=None):
        def fn(mod, inp, out):
            t = out
            if transform is not None:
                t = transform(t)
            cap[name] = t.detach().numpy() if torch.is_tensor(t) else t
        return fn

    hooks = [
        model.gconv.register_forward_hook(
            hook("gcn_layer0", lambda o: o[0])),
        model.gconv_net.register_forward_hook(
            hook("gcn_out", lambda o: o[0])),
        model.box_net.register_forward_hook(hook("boxes_pred")),
        model.mask_net.register_forward_hook(
            hook("mask_scores", lambda o: o.squeeze(1))),
        model.rel_aux_net.register_forward_hook(hook("rel_scores")),
        model.refinement_net.register_forward_pre_hook(
            lambda mod, inp: cap.__setitem__(
                "layout_plus_noise",
                inp[0].detach().permute(0, 2, 3, 1).numpy())),
    ]
    for i, mod in enumerate(model.refinement_net.refinement_modules):
        hooks.append(mod.register_forward_hook(hook(
            f"crn_stage{i}",
            lambda o: o.detach().permute(0, 2, 3, 1))))
    with torch.no_grad():
        imgs, boxes, masks, rel = model.forward_json(
            json.loads(json.dumps(sgs)))
    for h in hooks:
        h.remove()
    cap["img"] = imgs.permute(0, 2, 3, 1).numpy()
    assert not np.isnan(cap["img"]).any(), "reference forward NaN'd"
    return cap


def run_ours(ckpt_path, sgs, n_stages, **engine_kw):
    """Forward our converted model with capture_intermediates; returns the
    same section dict, flattened to the reference's flat-object order."""
    import jax
    import jax.numpy as jnp

    from sg2im_tpu.ckpt.torch_convert import convert_checkpoint
    from sg2im_tpu.data.scene_graphs import encode_scene_graphs
    from sg2im_tpu.models import Sg2ImGenerator

    bundle = convert_checkpoint(ckpt_path)
    mk = dict(bundle["model_kwargs"])
    mk.update(engine_kw)
    vocab = bundle["vocab"]
    gen = Sg2ImGenerator(vocab=vocab, **mk)
    batch = encode_scene_graphs(sgs, vocab, align=8)
    H, W = mk["image_size"]
    noise = jnp.zeros((batch.objs.shape[0], H, W, mk["layout_noise_dim"]),
                      jnp.float32)

    @jax.jit
    def fwd(variables, objs, triples, obj_mask, triple_mask, noise):
        return gen.apply(
            variables, objs, triples, obj_mask, triple_mask,
            train=False, layout_noise=noise,
            capture_intermediates=lambda mdl, name: name == "__call__",
        )

    (out, inter) = fwd(
        bundle["generator"], jnp.asarray(batch.objs),
        jnp.asarray(batch.triples), jnp.asarray(batch.obj_mask),
        jnp.asarray(batch.triple_mask), noise)
    imgs, boxes, masks, rel = out
    inter = jax.tree.map(np.asarray, inter["intermediates"])

    obj_sel = np.asarray(batch.obj_mask).reshape(-1) > 0  # (N*O,)
    tri_sel = np.asarray(batch.triple_mask).reshape(-1) > 0

    def flat_obj(x):  # (N, O, ...) -> (O_flat, ...) in reference order
        x = np.asarray(x)
        return x.reshape((-1,) + x.shape[2:])[obj_sel]

    def flat_tri(x):
        x = np.asarray(x)
        return x.reshape((-1,) + x.shape[2:])[tri_sel]

    cap = {}
    cap["gcn_layer0"] = flat_obj(inter["gconv"]["__call__"][0][0])
    cap["gcn_out"] = flat_obj(inter["gconv_net"]["__call__"][0][0])
    cap["boxes_pred"] = flat_obj(boxes)
    # MaskNet output is pre-sigmoid scores on the flattened (N*O) axis.
    ms = inter["mask_net"]["__call__"][0]
    cap["mask_scores"] = ms.reshape(ms.shape[0], ms.shape[1],
                                    ms.shape[2])[obj_sel] \
        if ms.ndim == 4 and ms.shape[-1] == 1 else None
    if cap["mask_scores"] is None:
        cap["mask_scores"] = np.squeeze(ms, -1)[obj_sel]
    cap["rel_scores"] = flat_tri(rel)
    # Recompute the composed layout exactly as the model does (f32 path).
    from sg2im_tpu.ops.layout import masks_to_layout

    lay = masks_to_layout(
        jnp.asarray(inter["gconv_net"]["__call__"][0][0]),
        jnp.asarray(boxes), jnp.asarray(masks),
        jnp.asarray(batch.obj_mask), H, W,
        compute_dtype=mk.get("compute_dtype"))
    cap["layout_plus_noise"] = np.concatenate(
        [np.asarray(lay), np.asarray(noise)], axis=-1)
    for i in range(n_stages):
        cap[f"crn_stage{i}"] = np.asarray(
            inter["refinement_net"][f"refinement_modules_{i}"]
            ["__call__"][0])
    cap["img"] = np.asarray(imgs)
    return cap


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "flagship"
    _apply_env_config()
    import tempfile

    import jax

    from sg2im_tpu.ckpt.torch_compat import (
        torch04_semantics, zeros_randn_override)

    with torch04_semantics(randn_override=zeros_randn_override):
        model, vocab, model_kwargs, sgs = build_proxy(scale)
        ref = run_reference(model, sgs)
        ckpt = {"model_state": model.state_dict(),
                "model_kwargs": dict(model_kwargs, vocab=vocab),
                "args": {"dataset": "vg"}}
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "synth.pt")
            torch.save(ckpt, path)
            n_stages = len(model_kwargs["refinement_dims"])
            engine_kw = {}
            if os.environ.get("ATTRIB_PROD", "0") == "1":
                import jax.numpy as jnp

                engine_kw = dict(compute_dtype=jnp.bfloat16,
                                 dense_precision="high", crn_mode="split")
            ours = run_ours(path, sgs, n_stages, **engine_kw)

    order = (["gcn_layer0", "gcn_out", "boxes_pred", "mask_scores",
              "rel_scores", "layout_plus_noise"]
             + [f"crn_stage{i}"
                for i in range(len(model_kwargs["refinement_dims"]))]
             + ["img"])
    print(f"\nscale={scale} backend={jax.devices()[0].platform} "
          f"(ours) vs torch-CPU reference")
    print(f"{'section':<20}{'relerr':>12}{'maxabs':>12}{'psnr(dB)':>10}"
          f"{'amp':>8}")
    prev = None
    rows = {}
    for k in order:
        if k not in ref or ours.get(k) is None:
            continue
        r, o = ref[k], ours[k]
        assert r.shape == o.shape, (k, r.shape, o.shape)
        e = relerr(o, r)
        amp = e / prev if prev and prev > 0 else float("nan")
        rows[k] = {"relerr": e, "psnr": psnr_of(o, r)}
        print(f"{k:<20}{e:>12.3e}{np.abs(o - r).max():>12.3e}"
              f"{psnr_of(o, r):>10.2f}{amp:>8.2f}")
        prev = e
    print(json.dumps({"scale": scale,
                      "backend": jax.devices()[0].platform,
                      "sections": {k: round(v["relerr"], 10)
                                   for k, v in rows.items()},
                      "img_psnr": round(rows["img"]["psnr"], 2)}))


if __name__ == "__main__":
    main()
