"""End-to-end inference pipeline tests: .pt checkpoint -> engine -> PNGs,
with PSNR fidelity vs the reference model run on the same inputs."""

import json
import os
import sys

import numpy as np
import pytest
import torch
import torch.nn.functional as F

sys.path.insert(0, "/root/reference")

from sg2im_tpu.data.batching import padded_to_flat
from sg2im_tpu.data.scene_graphs import encode_scene_graphs
from sg2im_tpu.data.transforms import imagenet_deprocess_batch
from sg2im_tpu.inference import InferenceEngine
from sg2im_tpu.utils.metrics import psnr

VOCAB = {
    "object_idx_to_name": ["__image__", "sheep", "grass", "sky", "tree"],
    "object_name_to_idx": {"__image__": 0, "sheep": 1, "grass": 2,
                           "sky": 3, "tree": 4},
    "pred_idx_to_name": ["__in_image__", "by", "above", "standing on"],
    "pred_name_to_idx": {"__in_image__": 0, "by": 1, "above": 2,
                         "standing on": 3},
}

SCENE_GRAPHS = [
    {"objects": ["sheep", "grass", "sky"],
     "relationships": [[0, "standing on", 1], [2, "above", 0]]},
    {"objects": ["sheep", "sheep", "grass", "tree"],
     "relationships": [[0, "by", 1], [0, "standing on", 2],
                       [3, "above", 2]]},
]

MODEL_KWARGS = dict(
    image_size=(32, 32),
    embedding_dim=16,
    gconv_dim=24,
    gconv_hidden_dim=32,
    gconv_num_layers=2,
    refinement_dims=(16, 8),
    normalization="batch",
    activation="leakyrelu-0.2",
    mask_size=4,
    mlp_normalization="none",
    layout_noise_dim=6,
)


@pytest.fixture()
def torch04_semantics():
    # Shared shim (sg2im_tpu.ckpt.torch_compat): align_corners=True
    # grid_sample + zeroed layout noise so reference and TPU paths are
    # comparable.
    from sg2im_tpu.ckpt.torch_compat import (
        torch04_semantics as t04, zeros_randn_override)

    with t04(randn_override=zeros_randn_override):
        yield


def _make_reference_checkpoint(tmp_path):
    from sg2im.model import Sg2ImModel

    torch.manual_seed(11)
    model = Sg2ImModel(vocab=VOCAB, **MODEL_KWARGS)
    model.eval()
    ckpt = {
        "model_state": model.state_dict(),
        "model_kwargs": dict(MODEL_KWARGS, vocab=VOCAB,
                             # exercise deprecated-kwarg tolerance
                             vec_noise_dim=0),
        "args": {"dataset": "vg"},
    }
    # DataParallel-prefix tolerance: save with 'module.' prefixes.
    ckpt["model_state"] = {f"module.{k}": v
                           for k, v in ckpt["model_state"].items()}
    path = os.path.join(tmp_path, "tiny_vg.pt")
    torch.save(ckpt, path)
    return model, path


def test_encode_scene_graphs_matches_reference(torch04_semantics):
    from sg2im.model import Sg2ImModel

    torch.manual_seed(1)
    model = Sg2ImModel(vocab=VOCAB, **MODEL_KWARGS)
    sgs_ref = json.loads(json.dumps(SCENE_GRAPHS))  # deep copy (ref mutates)
    objs_ref, triples_ref, o2i_ref = model.encode_scene_graphs(sgs_ref)

    batch = encode_scene_graphs(SCENE_GRAPHS, VOCAB)
    objs, triples, o2i = padded_to_flat(batch)
    np.testing.assert_array_equal(objs, objs_ref.numpy())
    np.testing.assert_array_equal(triples, triples_ref.numpy())
    np.testing.assert_array_equal(o2i, o2i_ref.numpy())


def test_engine_psnr_vs_reference(tmp_path, torch04_semantics):
    ref_model, ckpt_path = _make_reference_checkpoint(tmp_path)

    sgs_ref = json.loads(json.dumps(SCENE_GRAPHS))
    with torch.no_grad():
        ref_imgs, *_ = ref_model.forward_json(sgs_ref)
    ref_imgs = ref_imgs.permute(0, 2, 3, 1).numpy()
    ref_u8 = imagenet_deprocess_batch(ref_imgs)

    engine = InferenceEngine.from_torch_checkpoint(ckpt_path)
    got_u8, out = engine.generate(SCENE_GRAPHS, noise="zeros")

    raw_psnr = psnr(np.asarray(out["imgs"]), ref_imgs, max_val=1.0)
    assert raw_psnr > 40, f"raw-space PSNR too low: {raw_psnr:.1f} dB"
    u8_psnr = psnr(got_u8, ref_u8)
    assert u8_psnr > 40, f"uint8 PSNR too low: {u8_psnr:.1f} dB"


def test_run_model_cli(tmp_path, torch04_semantics):
    _, ckpt_path = _make_reference_checkpoint(tmp_path)
    sg_path = os.path.join(tmp_path, "sg.json")
    with open(sg_path, "w") as f:
        json.dump(SCENE_GRAPHS, f)
    out_dir = os.path.join(tmp_path, "out")

    from sg2im_tpu.cli.run_model import main

    rc = main(["--checkpoint", ckpt_path, "--scene_graphs_json", sg_path,
               "--output_dir", out_dir, "--noise", "zeros"])
    assert rc == 0
    pngs = sorted(os.listdir(out_dir))
    assert pngs == ["img000000.png", "img000001.png"]
    from PIL import Image

    img = np.asarray(Image.open(os.path.join(out_dir, "img000000.png")))
    assert img.shape == (32, 32, 3)

    # --bf16_compute perf mode: runs, and stays close to the f32 output.
    out_bf16 = os.path.join(tmp_path, "out_bf16")
    rc = main(["--checkpoint", ckpt_path, "--scene_graphs_json", sg_path,
               "--output_dir", out_bf16, "--noise", "zeros",
               "--bf16_compute", "1"])
    assert rc == 0
    img_b = np.asarray(Image.open(os.path.join(out_bf16, "img000000.png")))
    from sg2im_tpu.utils.metrics import psnr

    assert psnr(img_b, img) > 35  # u8-space; deprocess rescale amplifies


def test_engine_batch_bucketing(tmp_path, torch04_semantics):
    """Different graph counts within a bucket share one compiled program
    and per-graph outputs are unaffected by bucket padding."""
    _, ckpt_path = _make_reference_checkpoint(tmp_path)
    engine = InferenceEngine.from_torch_checkpoint(ckpt_path)

    imgs3, out3 = engine.generate(
        SCENE_GRAPHS + [SCENE_GRAPHS[0]], noise="zeros")
    imgs1, out1 = engine.generate(SCENE_GRAPHS[0], noise="zeros")
    assert imgs3.shape[0] == 3 and imgs1.shape[0] == 1
    # Graph 0 produces the same image regardless of batch company.
    np.testing.assert_allclose(np.asarray(out1["imgs"][0]),
                               np.asarray(out3["imgs"][0]), atol=1e-5)


def test_engine_object_pad_invariance(tmp_path, torch04_semantics):
    """The OBJECT/TRIPLE pad dimension must not leak into outputs: the
    same graphs padded to different O/T buckets (pad_align 4 vs 16)
    render identical images (masked GCN pooling, masked layout compose,
    per-row heads — SURVEY hard-part #2 at full-generator level)."""
    _, ckpt_path = _make_reference_checkpoint(tmp_path)
    small = InferenceEngine.from_torch_checkpoint(ckpt_path, pad_align=4)
    big = InferenceEngine.from_torch_checkpoint(ckpt_path, pad_align=16)
    imgs_s, out_s = small.generate(SCENE_GRAPHS, noise="zeros")
    imgs_b, out_b = big.generate(SCENE_GRAPHS, noise="zeros")
    # Different padded shapes actually exercised:
    assert out_s["boxes"].shape[1] != out_b["boxes"].shape[1]
    np.testing.assert_allclose(np.asarray(out_s["imgs"]),
                               np.asarray(out_b["imgs"]), atol=2e-5)
    n_real = [len(sg["objects"]) + 1 for sg in SCENE_GRAPHS]
    for i, n in enumerate(n_real):
        np.testing.assert_allclose(np.asarray(out_s["boxes"][i][:n]),
                                   np.asarray(out_b["boxes"][i][:n]),
                                   atol=2e-5)


def test_engine_warmup_precompiles_buckets(tmp_path, torch04_semantics):
    """warmup() compiles the serving program per batch bucket; later
    requests landing in a warmed bucket reuse the cached executable
    (no new trace) and the warmup graph does not perturb outputs."""
    _, ckpt_path = _make_reference_checkpoint(tmp_path)
    engine = InferenceEngine.from_torch_checkpoint(ckpt_path)

    shapes = engine.warmup(batch_sizes=(1, 3))
    assert [s[0] for s in shapes] == [1, 4]  # power-of-two buckets
    assert all(s[1] % engine.pad_align == 0 for s in shapes)
    n_compiled = engine._fwd._cache_size()
    assert n_compiled >= 2

    # Real requests in the warmed buckets: no additional compilation.
    imgs1, _ = engine.generate(SCENE_GRAPHS[0], noise="zeros")
    imgs3, _ = engine.generate(SCENE_GRAPHS + [SCENE_GRAPHS[0]],
                               noise="zeros")
    assert imgs1.shape[0] == 1 and imgs3.shape[0] == 3
    assert engine._fwd._cache_size() == n_compiled

    # Output identical to a fresh (unwarmed) engine.
    fresh = InferenceEngine.from_torch_checkpoint(ckpt_path)
    f1, _ = fresh.generate(SCENE_GRAPHS[0], noise="zeros")
    np.testing.assert_array_equal(np.asarray(imgs1), np.asarray(f1))


def test_engine_sharded_generation(tmp_path, torch04_semantics):
    """Sharded (8-way 'data' mesh) generation matches single-device."""
    import jax

    from sg2im_tpu.parallel.mesh import make_mesh

    _, ckpt_path = _make_reference_checkpoint(tmp_path)
    single = InferenceEngine.from_torch_checkpoint(ckpt_path)
    sharded = InferenceEngine.from_torch_checkpoint(
        ckpt_path, mesh=make_mesh(n_data=8))

    want, _ = single.generate(SCENE_GRAPHS, noise="zeros")
    got, _ = sharded.generate(SCENE_GRAPHS, noise="zeros")
    assert got.shape == want.shape
    np.testing.assert_allclose(got.astype(np.int32), want.astype(np.int32),
                               atol=1)


def test_engine_seeded_noise_matches_explicit(tmp_path, torch04_semantics):
    """noise=None draws the layout noise INSIDE the jitted program
    (_fwd_seeded) — it must be bit-identical to explicitly uploading
    jax.random.normal(PRNGKey(seed), ...) (the pre-round-3 eager path and
    the serve batcher's merged-noise contract)."""
    import jax

    _, ckpt_path = _make_reference_checkpoint(tmp_path)
    engine = InferenceEngine.from_torch_checkpoint(ckpt_path)
    H, W = engine.model_kwargs["image_size"]
    nd = engine.model_kwargs["layout_noise_dim"]
    # two graphs -> bucket n_pad == 2 == n_real, so the explicit draw
    # covers exactly the rows the in-program draw generates
    sgs = SCENE_GRAPHS[:2]
    assert len(sgs) == 2
    for seed in (0, 7, (1 << 31) - 1):
        explicit = np.asarray(jax.random.normal(
            jax.random.PRNGKey(seed), (2, H, W, nd), dtype=np.float32))
        _, out_e = engine.generate(sgs, noise=explicit)
        _, out_s = engine.generate(sgs, noise=None, seed=seed)
        np.testing.assert_array_equal(np.asarray(out_s["imgs"]),
                                      np.asarray(out_e["imgs"]))
    # different seeds actually change the output
    _, a = engine.generate(sgs, noise=None, seed=0)
    _, b = engine.generate(sgs, noise=None, seed=7)
    assert np.abs(np.asarray(a["imgs"]) - np.asarray(b["imgs"])).max() > 0


def test_engine_device_noise_bucket_padding(tmp_path, torch04_semantics):
    """A device-resident noise array from a bucket-padded caller
    (shape[0] < padded N) must be padded ON DEVICE (same result as the
    host-array path, no D2H round trip), and shape[0] > N must raise a
    clear error instead of passing through into a shape failure
    (ADVICE r3: inference.py device-array fast path)."""
    import jax

    _, ckpt_path = _make_reference_checkpoint(tmp_path)
    engine = InferenceEngine.from_torch_checkpoint(ckpt_path)
    H, W = engine.model_kwargs["image_size"]
    nd = engine.model_kwargs["layout_noise_dim"]
    sgs = [SCENE_GRAPHS[0]] * 3  # pads to bucket 4
    noise3 = jax.random.normal(jax.random.PRNGKey(5), (3, H, W, nd),
                               dtype=np.float32)
    _, out_dev = engine.generate(sgs, noise=noise3)  # jax.Array, 3 < 4
    _, out_np = engine.generate(sgs, noise=np.asarray(noise3))
    np.testing.assert_array_equal(np.asarray(out_dev["imgs"]),
                                  np.asarray(out_np["imgs"]))
    for bad in (noise3[:2].repeat(3, 0), np.asarray(noise3).repeat(3, 0)):
        with pytest.raises(ValueError, match="exceeds the padded"):
            engine.generate(sgs, noise=bad)


def test_engine_seeded_noise_bucket_stable(tmp_path, torch04_semantics):
    """A graph's seeded render must not depend on the BATCH bucket it
    lands in: normal(key, (n_pad, ...)) row i is the same for any n_pad
    >= i+1 (partitionable threefry, the JAX default).  This is the
    row-stability contract the serve coalescer's pinned-seed
    reproducibility rides on."""
    _, ckpt_path = _make_reference_checkpoint(tmp_path)
    engine = InferenceEngine.from_torch_checkpoint(ckpt_path)
    sg = SCENE_GRAPHS[0]
    # bucket 1 vs bucket 4 (3 graphs pad to 4), same seed
    _, solo = engine.generate([sg], noise=None, seed=9)
    _, batched = engine.generate([sg] + SCENE_GRAPHS, noise=None, seed=9)
    np.testing.assert_array_equal(np.asarray(solo["imgs"][0]),
                                  np.asarray(batched["imgs"][0]))


def test_engine_seeded_noise_sharded_matches_single(tmp_path,
                                                    torch04_semantics):
    """In-program noise under the 8-way data mesh: partitionable threefry
    makes the draw sharding-invariant, so mesh == single-device."""
    from sg2im_tpu.parallel.mesh import make_mesh

    _, ckpt_path = _make_reference_checkpoint(tmp_path)
    single = InferenceEngine.from_torch_checkpoint(ckpt_path)
    sharded = InferenceEngine.from_torch_checkpoint(
        ckpt_path, mesh=make_mesh(n_data=8))
    # 8 graphs -> n_pad 8 == mesh size (every device holds a real row)
    sgs = (SCENE_GRAPHS * 4)[:8]
    want, w_out = single.generate(sgs, noise=None, seed=3)
    got, g_out = sharded.generate(sgs, noise=None, seed=3)
    np.testing.assert_allclose(np.asarray(g_out["imgs"]),
                               np.asarray(w_out["imgs"]), atol=2e-5)


def test_engine_deprocess_on_device(tmp_path, torch04_semantics):
    """deprocess_on_device folds denorm + per-image rescale + uint8 into
    the serving program; the fetched uint8 matches the host deprocess
    path to <=1 (XLA may fuse the denorm multiply-add; everything else
    is identical f32 math) and padding rows don't perturb the per-image
    min/max rescale."""
    _, ckpt_path = _make_reference_checkpoint(tmp_path)
    host = InferenceEngine.from_torch_checkpoint(ckpt_path)
    dev = InferenceEngine.from_torch_checkpoint(
        ckpt_path, deprocess_on_device=True)

    want, _ = host.generate(SCENE_GRAPHS, noise="zeros")
    got, out = dev.generate(SCENE_GRAPHS, noise="zeros")
    assert got.dtype == np.uint8 and got.shape == want.shape
    assert "imgs_u8" in out
    np.testing.assert_allclose(got.astype(np.int32), want.astype(np.int32),
                               atol=1)
    # bucket padding: a single graph (padded batch) rescales per image
    got1, _ = dev.generate(SCENE_GRAPHS[0], noise="zeros")
    np.testing.assert_allclose(got1[0].astype(np.int32),
                               got[0].astype(np.int32), atol=1)
    # deprocess=False still returns the raw float path
    raw, _ = dev.generate(SCENE_GRAPHS, noise="zeros", deprocess=False)
    assert raw.dtype != np.uint8


def test_run_model_cli_deprocess_device(tmp_path, torch04_semantics):
    """--deprocess_device writes PNGs matching the host-deprocess run."""
    _, ckpt_path = _make_reference_checkpoint(tmp_path)
    sg_path = os.path.join(tmp_path, "sg.json")
    with open(sg_path, "w") as f:
        json.dump(SCENE_GRAPHS, f)

    from PIL import Image

    from sg2im_tpu.cli.run_model import main

    out_host = os.path.join(tmp_path, "out_host")
    out_dev = os.path.join(tmp_path, "out_dev")
    assert main(["--checkpoint", ckpt_path, "--scene_graphs_json", sg_path,
                 "--output_dir", out_host, "--noise", "zeros"]) == 0
    assert main(["--checkpoint", ckpt_path, "--scene_graphs_json", sg_path,
                 "--output_dir", out_dev, "--noise", "zeros",
                 "--deprocess_device", "1"]) == 0
    a = np.asarray(Image.open(os.path.join(out_host, "img000000.png")))
    b = np.asarray(Image.open(os.path.join(out_dev, "img000000.png")))
    np.testing.assert_allclose(b.astype(np.int32), a.astype(np.int32),
                               atol=1)


def test_verify_pretrained_cli(tmp_path, capsys):
    """One-shot north-star gate: .pt + scene graphs -> PSNR vs the
    reference model run in-process; >40 dB on the synthetic checkpoint.
    (No torch04_semantics fixture: the CLI applies its own shims.)"""
    _, ckpt_path = _make_reference_checkpoint(tmp_path)
    sg_path = os.path.join(tmp_path, "sg.json")
    with open(sg_path, "w") as f:
        json.dump(SCENE_GRAPHS, f)
    out_dir = os.path.join(tmp_path, "verify_out")

    from sg2im_tpu.cli.verify_pretrained import main

    rc = main(["--checkpoint", ckpt_path, "--scene_graphs_json", sg_path,
               "--output_dir", out_dir, "--run_reference", "1",
               "--reference_repo", "/root/reference"])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(lines[-1])
    assert summary["pass"]
    assert summary["psnr"]["ref_raw:ALL"] > 40
    assert sorted(os.listdir(out_dir)) == ["img000000.png", "img000001.png"]


def test_verify_pretrained_golden_workflow_sheep_layout(tmp_path):
    """Pre-stages the north-star golden workflow end to end: the REAL
    ``scene_graphs/figure_6_sheep.json`` (7 graphs) driven through
    ``verify_pretrained --golden_dir`` against a directory laid out
    EXACTLY like the reference's shipped goldens
    (``/root/reference/images/sheep``: ``img00000{0-6}.png`` plus
    ``sg00000{0-6}.png`` files that image discovery must ignore).  Proves
    the file discovery / deprocess / PSNR path so that the day real
    ``vg128.pt`` weights appear the acceptance run is the one README
    command with ``--golden_dir <sg2im>/images/sheep``."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sheep_json = os.path.join(repo, "scene_graphs", "figure_6_sheep.json")
    ref_golden_dir = "/root/reference/images/sheep"
    with open(sheep_json) as f:
        sgs = json.load(f)
    assert len(sgs) == 7

    # Checkpoint with the vocab the real sheep graphs need (the real
    # vg128 vocab is much larger; discovery/deprocess/PSNR don't care).
    obj_names, pred_names = set(), set()
    for sg in sgs:
        obj_names.update(sg["objects"])
        for _s, p, _o in sg["relationships"]:
            pred_names.add(p)
    names = ["__image__"] + sorted(obj_names)
    preds = ["__in_image__"] + sorted(pred_names)
    vocab = {
        "object_idx_to_name": names,
        "object_name_to_idx": {n: i for i, n in enumerate(names)},
        "pred_idx_to_name": preds,
        "pred_name_to_idx": {n: i for i, n in enumerate(preds)},
    }
    kw = dict(image_size=(64, 64), embedding_dim=16, gconv_dim=24,
              gconv_hidden_dim=32, gconv_num_layers=2,
              refinement_dims=(24, 16, 8), normalization="batch",
              activation="leakyrelu-0.2", mask_size=4,
              mlp_normalization="none", layout_noise_dim=6)
    from sg2im.model import Sg2ImModel

    torch.manual_seed(3)
    model = Sg2ImModel(vocab=vocab, **kw)
    ckpt_path = os.path.join(tmp_path, "sheep_vocab.pt")
    torch.save({"model_state": model.state_dict(),
                "model_kwargs": dict(kw, vocab=vocab), "args": {}},
               ckpt_path)

    from PIL import Image

    from sg2im_tpu.cli.verify_pretrained import main

    # Staging run: render the 7 graphs (rc=1 — nothing to compare yet;
    # images are written before the comparison step).
    out1 = os.path.join(tmp_path, "staging")
    rc = main(["--checkpoint", ckpt_path, "--scene_graphs_json", sheep_json,
               "--output_dir", out1, "--run_reference", "0"])
    assert rc == 1
    assert sorted(os.listdir(out1)) == ["img%06d.png" % i for i in range(7)]

    # Golden dir mirroring the reference layout byte-for-byte in structure:
    # same filenames, same count, sg*.png present as discovery decoys.
    golden = os.path.join(tmp_path, "golden")
    os.makedirs(golden)
    for i in range(7):
        arr = np.asarray(Image.open(
            os.path.join(out1, "img%06d.png" % i)))
        Image.fromarray(arr).save(os.path.join(golden, "img%06d.png" % i))
        sg_png = os.path.join(ref_golden_dir, "sg%06d.png" % i)
        Image.open(sg_png).save(os.path.join(golden, "sg%06d.png" % i))
    assert sorted(os.listdir(golden)) == sorted(os.listdir(ref_golden_dir))

    # Acceptance-shaped run: real JSON + sheep-layout golden dir.
    out2 = os.path.join(tmp_path, "accept")
    rc = main(["--checkpoint", ckpt_path, "--scene_graphs_json", sheep_json,
               "--output_dir", out2, "--golden_dir", golden,
               "--run_reference", "0"])
    assert rc == 0
    assert sorted(os.listdir(out2)) == ["img%06d.png" % i for i in range(7)]


def test_verify_pretrained_cli_golden_dir(tmp_path):
    """Golden-PNG mode: comparing against the CLI's own outputs must be a
    perfect match; against corrupted goldens it must fail with rc=2."""
    _, ckpt_path = _make_reference_checkpoint(tmp_path)
    sg_path = os.path.join(tmp_path, "sg.json")
    with open(sg_path, "w") as f:
        json.dump(SCENE_GRAPHS, f)
    out_dir = os.path.join(tmp_path, "out1")

    from sg2im_tpu.cli.verify_pretrained import main

    rc = main(["--checkpoint", ckpt_path, "--scene_graphs_json", sg_path,
               "--output_dir", out_dir, "--golden_dir", out_dir,
               "--run_reference", "0"])
    assert rc == 0  # self-comparison: inf dB

    from PIL import Image

    bad_dir = os.path.join(tmp_path, "bad_golden")
    os.makedirs(bad_dir)
    for name in os.listdir(out_dir):
        arr = np.asarray(Image.open(os.path.join(out_dir, name)))
        Image.fromarray(255 - arr).save(os.path.join(bad_dir, name))
    rc = main(["--checkpoint", ckpt_path, "--scene_graphs_json", sg_path,
               "--output_dir", os.path.join(tmp_path, "out2"),
               "--golden_dir", bad_dir, "--run_reference", "0"])
    assert rc == 2


def test_trained_artifact_gate(tmp_path):
    """Always-on re-score of the committed LEARNED checkpoint (VERDICT r4
    #1): ``artifacts/trained_coco64.pt`` was trained end-to-end by
    ``scripts/trained_fidelity.py`` and exported through the converter;
    the real gate CLI (engine vs in-process torch reference, shared zero
    noise) must clear 40 dB u8 on it — the full train -> export ->
    convert-back -> gate circle on learned weights, no untrained-proxy
    conditioning hack.  Skips only on fresh clones without the artifact."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pt = os.path.join(repo, "artifacts", "trained_coco64.pt")
    sg = os.path.join(repo, "artifacts", "trained_scene_graphs.json")
    if not (os.path.exists(pt) and os.path.exists(sg)):
        pytest.skip("trained artifact not present")

    from sg2im_tpu.cli.verify_pretrained import main

    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["--checkpoint", pt, "--scene_graphs_json", sg,
                   "--output_dir", os.path.join(tmp_path, "gate_out"),
                   "--min_psnr", "40"])
    out = buf.getvalue()
    lines = [ln for ln in out.splitlines() if ln.startswith("{")]
    assert lines, f"gate CLI printed no JSON:\n{out}"
    result = json.loads(lines[-1])
    assert rc == 0, f"trained-weights gate failed: {result}"
    assert result["psnr"]["ref_u8:ALL"] >= 40.0
