"""Misc coverage: checkpoint tools CLI, GCN padding equivalence against the
reference graph module, vis rendering, utils."""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")


def test_gcn_padding_invariance_vs_reference():
    """GraphTripleConv on a padded batch == reference flat GCN per image."""
    from sg2im.graph import GraphTripleConv as RefGC

    from sg2im_tpu.ckpt.torch_convert import convert_state_dict
    from sg2im_tpu.nn.graph import GraphTripleConv

    torch.manual_seed(0)
    ref = RefGC(input_dim=8, output_dim=12, hidden_dim=16, pooling="avg")
    ref.eval()

    def mapper(parts):
        return [parts[0], f"layer{parts[1]}"]

    variables = convert_state_dict(ref.state_dict(), mapper)

    rng = np.random.RandomState(0)
    # Two images, different graph sizes, padded to O=5/T=6.
    sizes = [(3, 4), (4, 2)]
    obj_vecs = rng.randn(2, 5, 8).astype(np.float32)
    pred_vecs = rng.randn(2, 6, 8).astype(np.float32)
    edges = rng.randint(0, 3, (2, 6, 2)).astype(np.int32)
    tmask = np.zeros((2, 6), np.float32)
    for n, (O, T) in enumerate(sizes):
        tmask[n, :T] = 1
        edges[n, :T] = rng.randint(0, O, (T, 2))

    gc = GraphTripleConv(input_dim=8, output_dim=12, hidden_dim=16,
                         pooling="avg")
    new_obj, new_pred = gc.apply(
        variables, jnp.asarray(obj_vecs), jnp.asarray(pred_vecs),
        jnp.asarray(edges), jnp.asarray(tmask))

    for n, (O, T) in enumerate(sizes):
        with torch.no_grad():
            ro, rp = ref(
                torch.from_numpy(obj_vecs[n, :O]),
                torch.from_numpy(pred_vecs[n, :T]),
                torch.from_numpy(edges[n, :T].astype(np.int64)))
        np.testing.assert_allclose(np.asarray(new_obj[n, :O]), ro.numpy(),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_pred[n, :T]), rp.numpy(),
                                   atol=1e-5)


def test_checkpoint_tools_cli(tmp_path, capsys):
    from sg2im.model import Sg2ImModel

    vocab = {"object_idx_to_name": ["__image__", "a"],
             "object_name_to_idx": {"__image__": 0, "a": 1},
             "pred_idx_to_name": ["__in_image__"],
             "pred_name_to_idx": {"__in_image__": 0}}
    kw = dict(image_size=(16, 16), embedding_dim=4, gconv_dim=4,
              gconv_hidden_dim=8, gconv_num_layers=1,
              refinement_dims=(8, 4), mask_size=None, layout_noise_dim=0)
    torch.manual_seed(0)
    m = Sg2ImModel(vocab=vocab, **kw)
    in_path = os.path.join(tmp_path, "full.pt")
    torch.save({"model_state": m.state_dict(),
                "model_kwargs": dict(kw, vocab=vocab),
                "args": {"dataset": "vg", "batch_size": 32},
                "losses": {"junk": [1, 2, 3]},
                "d_obj_state": {}, "d_obj_kwargs": {}}, in_path)

    from sg2im_tpu.cli.checkpoint_tools import main

    assert main(["print_args", in_path]) == 0
    out = capsys.readouterr().out
    assert "batch_size: 32" in out and "dataset: vg" in out

    out_path = os.path.join(tmp_path, "stripped.pt")
    assert main(["strip", in_path, out_path]) == 0
    stripped = torch.load(out_path, weights_only=False)
    assert set(stripped.keys()) == {"args", "model_state", "model_kwargs",
                                    "d_obj_state", "d_obj_kwargs"}
    assert "losses" not in stripped

    # Stripped checkpoints still convert + run.
    from sg2im_tpu.inference import InferenceEngine

    engine = InferenceEngine.from_torch_checkpoint(out_path)
    imgs, _ = engine.generate({"objects": ["a"], "relationships": []})
    assert imgs.shape == (1, 16, 16, 3)


def test_draw_scene_graph_and_layout(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from sg2im_tpu.utils.vis import (
        draw_layout,
        draw_scene_graph,
        have_graphviz,
    )

    vocab = {"object_idx_to_name": ["__image__", "cat", "dog"],
             "pred_idx_to_name": ["__in_image__", "by"]}
    plt.figure()
    draw_layout(vocab, [1, 2, 0],
                np.array([[0.1, 0.1, 0.5, 0.5], [0.4, 0.4, 0.9, 0.9],
                          [0, 0, 1, 1]], np.float32),
                np.random.RandomState(0).rand(3, 8, 8), show_boxes=True)
    out = os.path.join(tmp_path, "layout.png")
    plt.savefig(out)
    assert os.path.getsize(out) > 1000

    if have_graphviz():
        img = draw_scene_graph(["cat", "dog"], [[0, "by", 1]])
        assert img.ndim == 3 and img.shape[2] == 3


def test_utils():
    from sg2im_tpu.utils import LossManager, jaccard, psnr

    lm = LossManager()
    lm.add_loss(jnp.asarray(2.0), "a", 0.5)
    lm.add_loss(jnp.asarray(3.0), "b")
    assert float(lm.total_loss) == 4.0
    assert dict(lm.items()) == {"a": 1.0, "b": 3.0}

    a = np.zeros((4, 4, 3), np.uint8)
    b = a.copy()
    b[0, 0, 0] = 10
    assert psnr(a, a) == float("inf")
    assert 30 < psnr(a, b) < 100

    boxes = jnp.asarray([[0.0, 0.0, 1.0, 1.0], [0.0, 0.0, 0.5, 0.5]])
    iou = float(jaccard(boxes, boxes))
    assert abs(iou - 2.0) < 1e-6

    # 0/0 guard: a padded row (zero GT) with a degenerate all-zero
    # prediction must contribute 0, not NaN (NaN*mask poisons the sum).
    zero = jnp.zeros((1, 4))
    gt = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    both = jnp.concatenate([gt, zero])
    masked = float(jaccard(jnp.zeros((2, 4)), both,
                           mask=jnp.asarray([1.0, 0.0])))
    assert masked == 0.0 and masked == masked  # finite, not NaN


def test_dense_precision_knob_plumbs():
    """dense_precision='high' is a TPU serving knob (3-pass bf16 dots);
    on the CPU test backend precision does not change numerics, so this
    pins the kwarg plumbing end-to-end: same params tree, identical
    outputs vs the HIGHEST default here, real effect measured on TPU by
    bench.py (psnr_db_vs_reference at +5% e2e)."""
    import jax

    from sg2im_tpu.models import Sg2ImGenerator

    vocab = {"object_idx_to_name": ["__image__", "a", "b"],
             "pred_idx_to_name": ["__in_image__", "p"]}
    kw = dict(image_size=(16, 16), embedding_dim=8, gconv_dim=12,
              gconv_hidden_dim=16, gconv_num_layers=2,
              refinement_dims=(12, 8), mask_size=4, layout_noise_dim=4)
    objs = jnp.asarray([[1, 2, 0]])
    triples = jnp.asarray([[[0, 1, 1], [0, 0, 2], [1, 0, 2]]])
    om = jnp.ones((1, 3))
    tm = jnp.ones((1, 3))
    noise = jnp.zeros((1, 16, 16, 4))
    outs = {}
    for name, extra in (("hi", {}), ("high", {"dense_precision": "high"})):
        gen = Sg2ImGenerator(vocab=vocab, **kw, **extra)
        v = gen.init({"params": jax.random.PRNGKey(0)}, objs, triples, om,
                     tm, train=False, layout_noise=noise)
        outs[name] = gen.apply(v, objs, triples, om, tm, train=False,
                               layout_noise=noise)[0]
    np.testing.assert_array_equal(np.asarray(outs["hi"]),
                                  np.asarray(outs["high"]))


def test_masked_losses_edge_cases():
    from sg2im_tpu.losses import cross_entropy, masked_mean

    # Broadcast (size-1) mask axes: denominator must count broadcast
    # elements, matching the numerator's broadcast.
    got = float(masked_mean(jnp.full((2, 3), 2.0),
                            mask=jnp.asarray([[1.0], [0.0]])))
    assert abs(got - 2.0) < 1e-6

    # Out-of-range labels on masked rows (e.g. a -1 padding convention)
    # must not NaN the mean (take_along_axis fills OOR with NaN).
    logits = jnp.zeros((2, 3, 5))
    labels = jnp.asarray([[0, 1, 7], [2, -1, 0]])
    mask = jnp.asarray([[1.0, 1.0, 0.0], [1.0, 0.0, 1.0]])
    ce = float(cross_entropy(logits, labels, mask))
    assert ce == ce  # finite
    assert abs(ce - float(np.log(5.0))) < 1e-5  # uniform logits

    # Masked NaN entries in the loss tensor itself must not leak through.
    x = jnp.asarray([[1.0, float("nan")]])
    assert float(masked_mean(x, mask=jnp.asarray([[1.0, 0.0]]))) == 1.0
