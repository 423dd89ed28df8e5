"""End-to-end numerical parity: reference torch models vs converted flax models.

Strategy (SURVEY.md §7 step 2-3): instantiate the *reference* torch modules
with random weights, run them in eval mode under torch-0.4 grid_sample
semantics (align_corners=True monkeypatch — modern torch changed the
default), convert the state_dict with our converter, and require the flax
forward to match to float32 tolerance.  This proves converter fidelity and
module-for-module numerical equivalence without any pretrained download.
"""

import sys

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from sg2im_tpu.ckpt.torch_convert import (
    convert_ac_discriminator_state,
    convert_generator_state,
    convert_patch_discriminator_state,
)
from sg2im_tpu.models import (
    AcCropDiscriminator,
    PatchDiscriminator,
    Sg2ImGenerator,
)

VOCAB = {
    "object_idx_to_name": ["__image__", "cat", "dog", "sky"],
    "object_name_to_idx": {"__image__": 0, "cat": 1, "dog": 2, "sky": 3},
    "pred_idx_to_name": ["__in_image__", "left of", "above"],
    "pred_name_to_idx": {"__in_image__": 0, "left of": 1, "above": 2},
}


@pytest.fixture(autouse=True)
def _torch04_grid_sample():
    """Pin torch-0.4 grid_sample semantics for the reference code (shared
    shim, sg2im_tpu.ckpt.torch_compat)."""
    from sg2im_tpu.ckpt.torch_compat import torch04_semantics

    with torch04_semantics():
        torch.manual_seed(0)
        yield


def _randomize_bn_stats(module):
    """Fill BN running stats with nontrivial values so conversion is tested."""
    g = torch.Generator().manual_seed(7)
    for m in module.modules():
        if hasattr(m, "running_mean") and m.running_mean is not None:
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.3)
            m.running_var.copy_(
                torch.rand(m.running_var.shape, generator=g) * 1.5 + 0.3)


# Flat (reference) inputs: 2 images, 7 objects total.
FLAT_OBJS = np.array([1, 2, 0, 3, 1, 2, 0], np.int64)
FLAT_TRIPLES = np.array(
    [
        [0, 1, 1], [0, 0, 2], [1, 0, 2],          # image 0 (objects 0..2)
        [3, 2, 4], [4, 1, 5], [3, 0, 6], [5, 0, 6],  # image 1 (objects 3..6)
    ],
    np.int64,
)
FLAT_O2I = np.array([0, 0, 0, 1, 1, 1, 1], np.int64)
FLAT_BOXES = np.array(
    [
        [0.1, 0.2, 0.5, 0.7], [0.4, 0.1, 0.9, 0.6], [0.0, 0.0, 1.0, 1.0],
        [0.2, 0.3, 0.6, 0.9], [0.5, 0.05, 0.95, 0.5], [0.1, 0.5, 0.45, 0.95],
        [0.0, 0.0, 1.0, 1.0],
    ],
    np.float32,
)


def _padded_inputs(O_max=5, T_max=6):
    """Pad the flat fixture to (N=2, O_max, T_max) with within-image indices."""
    N = 2
    objs = np.zeros((N, O_max), np.int32)
    obj_mask = np.zeros((N, O_max), bool)
    boxes = np.zeros((N, O_max, 4), np.float32)
    triples = np.zeros((N, T_max, 3), np.int32)
    triple_mask = np.zeros((N, T_max), bool)
    offsets = [0, 3]
    counts = [3, 4]
    for n in range(N):
        off, c = offsets[n], counts[n]
        objs[n, :c] = FLAT_OBJS[off:off + c]
        obj_mask[n, :c] = True
        boxes[n, :c] = FLAT_BOXES[off:off + c]
        rows = [t for t in FLAT_TRIPLES if off <= t[0] < off + c]
        for j, (s, p, o) in enumerate(rows):
            triples[n, j] = [s - off, p, o - off]
            triple_mask[n, j] = True
    return objs, triples, obj_mask, triple_mask, boxes


GEN_KWARGS = dict(
    image_size=(16, 16),
    embedding_dim=16,
    gconv_dim=24,
    gconv_hidden_dim=32,
    gconv_num_layers=3,
    refinement_dims=(16, 8),
    normalization="batch",
    activation="leakyrelu-0.2",
    mask_size=4,
    mlp_normalization="none",
    layout_noise_dim=0,
)


def _build_reference_generator(**overrides):
    from sg2im.model import Sg2ImModel

    kw = dict(GEN_KWARGS, **overrides)
    model = Sg2ImModel(vocab=VOCAB, **kw)
    model.eval()
    _randomize_bn_stats(model)
    return model, kw


def _run_reference_generator(model, boxes_gt=None, masks_gt=None):
    with torch.no_grad():
        img, boxes_pred, masks_pred, rel_scores = model(
            torch.from_numpy(FLAT_OBJS),
            torch.from_numpy(FLAT_TRIPLES),
            torch.from_numpy(FLAT_O2I),
            boxes_gt=None if boxes_gt is None else torch.from_numpy(boxes_gt),
            masks_gt=None if masks_gt is None else torch.from_numpy(masks_gt),
        )
    return (
        img.permute(0, 2, 3, 1).numpy(),
        boxes_pred.numpy(),
        None if masks_pred is None else masks_pred.numpy(),
        rel_scores.numpy(),
    )


def _scatter_per_image(flat, O_max=5):
    """(O_total, ...) -> (2, O_max, ...) using the fixture's image split."""
    out = np.zeros((2, O_max) + flat.shape[1:], flat.dtype)
    out[0, :3] = flat[:3]
    out[1, :4] = flat[3:]
    return out


@pytest.mark.parametrize("overrides", [
    {},
    {"normalization": "instance"},
    {"mask_size": 0},
    {"gconv_num_layers": 1},
    {"gconv_num_layers": 0},
    {"gconv_pooling": "sum"},
    {"mlp_normalization": "batch"},
])
def test_generator_parity(overrides):
    ref, kw = _build_reference_generator(**overrides)
    want_img, want_boxes, want_masks, want_rel = _run_reference_generator(
        ref, boxes_gt=FLAT_BOXES)

    variables = convert_generator_state(ref.state_dict())
    gen = Sg2ImGenerator(vocab=VOCAB, **{
        k: (v if k != "mask_size" else (v or None)) for k, v in kw.items()})
    objs, triples, obj_mask, triple_mask, boxes = _padded_inputs()
    got_img, got_boxes, got_masks, got_rel = gen.apply(
        variables, jnp.asarray(objs), jnp.asarray(triples),
        jnp.asarray(obj_mask), jnp.asarray(triple_mask),
        boxes_gt=jnp.asarray(_scatter_per_image(FLAT_BOXES)),
        train=False,
    )
    got_img = np.asarray(got_img)
    np.testing.assert_allclose(got_img, want_img, atol=2e-4)

    pb = _scatter_per_image(want_boxes)
    np.testing.assert_allclose(
        np.asarray(got_boxes) * _scatter_per_image(
            np.ones((7, 1), np.float32)),
        pb, atol=1e-4)

    if want_masks is not None:
        pm = _scatter_per_image(want_masks)
        np.testing.assert_allclose(
            np.asarray(got_masks) * _scatter_per_image(
                np.ones((7, 1), np.float32))[..., None],
            pm, atol=1e-4)

    # rel_scores: image 0 has 3 triples, image 1 has 4.
    got_rel = np.asarray(got_rel)
    np.testing.assert_allclose(got_rel[0, :3], want_rel[:3], atol=1e-4)
    np.testing.assert_allclose(got_rel[1, :4], want_rel[3:], atol=1e-4)


def test_generator_masks_gt_path():
    ref, kw = _build_reference_generator()
    rng = np.random.RandomState(3)
    masks_gt = (rng.rand(7, 4, 4) > 0.5).astype(np.float32)
    want_img, *_ = _run_reference_generator(ref, boxes_gt=FLAT_BOXES,
                                            masks_gt=masks_gt)
    variables = convert_generator_state(ref.state_dict())
    gen = Sg2ImGenerator(vocab=VOCAB, **kw)
    objs, triples, obj_mask, triple_mask, _ = _padded_inputs()
    got_img, *_ = gen.apply(
        variables, jnp.asarray(objs), jnp.asarray(triples),
        jnp.asarray(obj_mask), jnp.asarray(triple_mask),
        boxes_gt=jnp.asarray(_scatter_per_image(FLAT_BOXES)),
        masks_gt=jnp.asarray(_scatter_per_image(masks_gt)),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(got_img), want_img, atol=2e-4)


def test_patch_discriminator_parity():
    from sg2im.discriminators import PatchDiscriminator as RefPatchD

    ref = RefPatchD(arch="C4-64-2,C4-128-2", normalization="batch",
                    activation="leakyrelu-0.2", padding="valid")
    ref.eval()
    _randomize_bn_stats(ref)
    rng = np.random.RandomState(4)
    imgs = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(imgs)).permute(0, 2, 3, 1).numpy()

    variables = convert_patch_discriminator_state(ref.state_dict())
    mine = PatchDiscriminator(arch="C4-64-2,C4-128-2", normalization="batch",
                              activation="leakyrelu-0.2", padding="valid")
    got = mine.apply(variables, jnp.asarray(imgs.transpose(0, 2, 3, 1)),
                     train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_ac_crop_discriminator_parity():
    from sg2im.discriminators import AcCropDiscriminator as RefAcD

    ref = RefAcD(vocab=VOCAB, arch="C4-32-2,C4-64-2", normalization="none",
                 activation="relu", padding="valid", object_size=16)
    ref.eval()
    rng = np.random.RandomState(5)
    imgs = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want_scores, want_ac = ref(
            torch.from_numpy(imgs), torch.from_numpy(FLAT_OBJS),
            torch.from_numpy(FLAT_BOXES), torch.from_numpy(FLAT_O2I))

    variables = convert_ac_discriminator_state(ref.state_dict())
    mine = AcCropDiscriminator(vocab=VOCAB, arch="C4-32-2,C4-64-2",
                               normalization="none", activation="relu",
                               padding="valid", object_size=16)
    objs, _, obj_mask, _, boxes = _padded_inputs()
    got_scores, got_logits = mine.apply(
        variables, jnp.asarray(imgs.transpose(0, 2, 3, 1)),
        jnp.asarray(_scatter_per_image(FLAT_BOXES)), train=False)
    got_scores = np.asarray(got_scores)
    np.testing.assert_allclose(got_scores[0, :3], want_scores[:3].numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(got_scores[1, :4], want_scores[3:].numpy(),
                               atol=2e-4)

    # AC loss parity via masked cross-entropy over real objects.
    from sg2im_tpu.losses import cross_entropy

    got_ac = cross_entropy(jnp.asarray(got_logits), jnp.asarray(objs),
                           jnp.asarray(obj_mask))
    np.testing.assert_allclose(float(got_ac), float(want_ac), atol=2e-4)


def test_init_tree_matches_converted_tree():
    """Freshly-initialized flax params must have identical tree structure and
    shapes to the converted reference state (guards naming drift)."""
    ref, kw = _build_reference_generator()
    converted = convert_generator_state(ref.state_dict())
    gen = Sg2ImGenerator(vocab=VOCAB, **kw)
    objs, triples, obj_mask, triple_mask, boxes = _padded_inputs()
    variables = gen.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(objs), jnp.asarray(triples), jnp.asarray(obj_mask),
        jnp.asarray(triple_mask), boxes_gt=jnp.asarray(boxes), train=False,
    )
    want = jax.tree.structure(variables["params"])
    got = jax.tree.structure(converted["params"])
    assert want == got, f"param tree mismatch:\n{want}\nvs\n{got}"
    shapes_w = jax.tree.map(lambda a: a.shape, variables["params"])
    shapes_g = jax.tree.map(lambda a: np.asarray(a).shape, converted["params"])
    assert shapes_w == shapes_g


def test_torch_roundtrip_export():
    """torch -> flax -> torch: state_dicts must round-trip exactly, and the
    re-imported reference model must produce identical outputs."""
    from sg2im_tpu.ckpt.torch_convert import (
        convert_variables_to_torch_state,
    )

    ref, kw = _build_reference_generator()
    variables = convert_generator_state(ref.state_dict())
    back = convert_variables_to_torch_state(variables)

    orig = ref.state_dict()
    missing = set(orig) - set(back) - {
        k for k in orig if k.endswith("num_batches_tracked")}
    assert not missing, f"missing keys: {sorted(missing)[:5]}"
    for k, v in back.items():
        np.testing.assert_array_equal(v.numpy(), orig[k].numpy(), err_msg=k)

    # Load into a fresh reference model and compare outputs.
    from sg2im.model import Sg2ImModel

    torch.manual_seed(123)
    fresh = Sg2ImModel(vocab=VOCAB, **kw)
    fresh.load_state_dict(back, strict=False)
    fresh.eval()
    _randomize_bn_stats_noop = None
    want = _run_reference_generator(ref, boxes_gt=FLAT_BOXES)[0]
    got = _run_reference_generator(fresh, boxes_gt=FLAT_BOXES)[0]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_patch_discriminator_residual_arch_parity():
    """R (residual) blocks in a discriminator arch convert correctly
    (regression: converter used to collapse cnn.{i}.net.{j} paths)."""
    from sg2im.discriminators import PatchDiscriminator as RefPatchD

    torch.manual_seed(9)
    arch = "C3-16-1,R,C3-32-2"
    ref = RefPatchD(arch=arch, normalization="batch",
                    activation="leakyrelu-0.2", padding="same")
    ref.eval()
    _randomize_bn_stats(ref)
    rng = np.random.RandomState(10)
    imgs = rng.randn(2, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(imgs)).permute(0, 2, 3, 1).numpy()

    variables = convert_patch_discriminator_state(ref.state_dict())
    mine = PatchDiscriminator(arch=arch, normalization="batch",
                              activation="leakyrelu-0.2", padding="same")
    got = mine.apply(variables, jnp.asarray(imgs.transpose(0, 2, 3, 1)),
                     train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_fused_upsample_conv_phase_equals_legacy():
    """The phase-factored conv0 (Pallas CRN formulation) must match the
    materialized upsample+concat+conv3x3 composition exactly (same params,
    additions merely reassociate)."""
    import jax
    import jax.numpy as jnp

    from sg2im_tpu.nn.crn import FusedUpsampleConv

    rng = np.random.RandomState(0)
    for (R, cl, cf, co) in [(4, 5, 3, 7), (8, 160, 128, 64), (3, 2, 1, 4)]:
        layout = jnp.asarray(rng.randn(2, 2 * R, 2 * R, cl), jnp.float32)
        feats = jnp.asarray(rng.randn(2, R, R, cf), jnp.float32)
        legacy = FusedUpsampleConv(cl, cf, co, mode="legacy")
        phase = FusedUpsampleConv(cl, cf, co, mode="phase")
        variables = legacy.init(jax.random.PRNGKey(0), layout, feats)
        a = legacy.apply(variables, layout, feats)
        b = phase.apply(variables, layout, feats)
        scale = float(jnp.abs(a).max())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5 * max(scale, 1.0), rtol=0)


def test_fused_upsample_conv_split_equals_legacy():
    """'split' conv0 (per-branch convs summed, concat never materialized)
    must match legacy on the same params (channel contraction distributes;
    sums merely reassociate)."""
    import jax
    import jax.numpy as jnp

    from sg2im_tpu.nn.crn import FusedUpsampleConv

    rng = np.random.RandomState(0)
    for (R, cl, cf, co) in [(4, 5, 3, 7), (8, 160, 128, 64), (3, 2, 1, 4)]:
        layout = jnp.asarray(rng.randn(2, 2 * R, 2 * R, cl), jnp.float32)
        feats = jnp.asarray(rng.randn(2, R, R, cf), jnp.float32)
        legacy = FusedUpsampleConv(cl, cf, co, mode="legacy")
        split = FusedUpsampleConv(cl, cf, co, mode="split")
        variables = legacy.init(jax.random.PRNGKey(0), layout, feats)
        a = legacy.apply(variables, layout, feats)
        b = split.apply(variables, layout, feats)
        scale = float(jnp.abs(a).max())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5 * max(scale, 1.0), rtol=0)


def test_refinement_network_split_mode_matches_legacy():
    import jax
    import jax.numpy as jnp

    from sg2im_tpu.nn.crn import RefinementNetwork

    rng = np.random.RandomState(1)
    layout = jnp.asarray(rng.randn(2, 16, 16, 6), jnp.float32)
    legacy = RefinementNetwork(dims=(6, 10, 8), normalization="batch")
    split = RefinementNetwork(dims=(6, 10, 8), normalization="batch",
                              conv0_mode="split")
    variables = legacy.init(jax.random.PRNGKey(0), layout)
    a = legacy.apply(variables, layout)
    b = split.apply(variables, layout)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-4, rtol=0)


def test_fused_upsample_conv_split_separate_noise_equals_legacy():
    """Split conv0 with the trailing noise channels supplied separately
    (own kernel slice) must match legacy on concat(layout, noise)."""
    import jax
    import jax.numpy as jnp

    from sg2im_tpu.nn.crn import FusedUpsampleConv

    rng = np.random.RandomState(2)
    for (R, cl, cn, cf, co) in [(4, 5, 2, 3, 7), (8, 128, 32, 128, 64)]:
        layout = jnp.asarray(rng.randn(2, 2 * R, 2 * R, cl), jnp.float32)
        noise = jnp.asarray(rng.randn(2, 2 * R, 2 * R, cn), jnp.float32)
        feats = jnp.asarray(rng.randn(2, R, R, cf), jnp.float32)
        cat = jnp.concatenate([layout, noise], axis=-1)
        legacy = FusedUpsampleConv(cl + cn, cf, co, mode="legacy")
        split = FusedUpsampleConv(cl + cn, cf, co, mode="split",
                                  noise_dim=cn)
        variables = legacy.init(jax.random.PRNGKey(0), cat, feats)
        a = legacy.apply(variables, cat, feats)
        b = split.apply(variables, layout, feats, noise=noise)
        scale = float(jnp.abs(a).max())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5 * max(scale, 1.0), rtol=0)
        # Equal-resolution degradation (first stage) too.
        feats_eq = jnp.asarray(rng.randn(2, 2 * R, 2 * R, cf), jnp.float32)
        a = legacy.apply(variables, cat, feats_eq)
        b = split.apply(variables, layout, feats_eq, noise=noise)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5 * max(scale, 1.0), rtol=0)


def test_refinement_network_separate_noise_matches_concat():
    """The noise-as-own-pyramid path (split mode) must match legacy on
    the concatenated input — concat never materialized, same params."""
    import jax
    import jax.numpy as jnp

    from sg2im_tpu.nn.crn import RefinementNetwork

    rng = np.random.RandomState(3)
    layout = jnp.asarray(rng.randn(2, 16, 16, 4), jnp.float32)
    noise = jnp.asarray(rng.randn(2, 16, 16, 2), jnp.float32)
    cat = jnp.concatenate([layout, noise], axis=-1)
    legacy = RefinementNetwork(dims=(6, 10, 8), normalization="batch")
    split = RefinementNetwork(dims=(6, 10, 8), normalization="batch",
                              conv0_mode="split")
    variables = legacy.init(jax.random.PRNGKey(0), cat)
    a = legacy.apply(variables, cat)
    b = split.apply(variables, layout, noise=noise)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-4, rtol=0)


def test_generator_split_modes_match_legacy_with_noise():
    """Full generator: crn_mode='split' (concat noise, per-stage split
    conv0) AND crn_mode='split_noise' (noise rides its own pyramid +
    conv0 kernel slice; the full-res concat never materialized) vs
    'legacy' — same params, same provided noise."""
    import jax
    import jax.numpy as jnp

    from sg2im_tpu.models import Sg2ImGenerator

    vocab = {"object_idx_to_name": [f"o{i}" for i in range(7)],
             "pred_idx_to_name": [f"p{i}" for i in range(3)]}
    kw = dict(image_size=(32, 32), embedding_dim=8, gconv_dim=8,
              gconv_hidden_dim=16, gconv_num_layers=2,
              refinement_dims=(12, 8), normalization="batch",
              mask_size=4, layout_noise_dim=4)
    rng = np.random.RandomState(4)
    objs = jnp.asarray(rng.randint(0, 7, (2, 5)), jnp.int32)
    triples = jnp.asarray(np.stack([rng.randint(0, 5, (2, 6)),
                                    rng.randint(0, 3, (2, 6)),
                                    rng.randint(0, 5, (2, 6))], -1),
                          jnp.int32)
    obj_mask = jnp.ones((2, 5), jnp.float32)
    triple_mask = jnp.ones((2, 6), jnp.float32)
    noise = jnp.asarray(rng.randn(2, 32, 32, 4), jnp.float32)

    legacy = Sg2ImGenerator(vocab=vocab, **kw)
    variables = legacy.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        objs, triples, obj_mask, triple_mask, train=False,
        layout_noise=noise)
    a = legacy.apply(variables, objs, triples, obj_mask, triple_mask,
                     train=False, layout_noise=noise)[0]
    for mode in ("split", "split_noise"):
        variant = Sg2ImGenerator(vocab=vocab, crn_mode=mode, **kw)
        b = variant.apply(variables, objs, triples, obj_mask, triple_mask,
                          train=False, layout_noise=noise)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=0, err_msg=mode)


def test_refinement_network_phase_mode_matches_legacy():
    import jax
    import jax.numpy as jnp

    from sg2im_tpu.nn.crn import RefinementNetwork

    rng = np.random.RandomState(1)
    layout = jnp.asarray(rng.randn(2, 16, 16, 6), jnp.float32)
    legacy = RefinementNetwork(dims=(6, 10, 8), normalization="batch")
    phase = RefinementNetwork(dims=(6, 10, 8), normalization="batch",
                              conv0_mode="phase")
    variables = legacy.init(jax.random.PRNGKey(0), layout)
    a = legacy.apply(variables, layout)
    b = phase.apply(variables, layout)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-4, rtol=0)


@pytest.mark.parametrize("normalization", ["batch", "instance"])
@pytest.mark.parametrize("compute_dtype", [None, "bf16"])
def test_refinement_network_packed_mode_matches_legacy(normalization,
                                                       compute_dtype):
    """'packed' mode (space-to-depth stages + packed head) must reproduce
    the legacy CRN exactly (additions reassociate only) on the same
    params, in eval and train mode, with an identical variable tree."""
    import jax
    import jax.numpy as jnp

    from sg2im_tpu.nn.crn import RefinementNetwork

    dt = jnp.bfloat16 if compute_dtype else None
    rng = np.random.RandomState(3)
    layout = jnp.asarray(rng.randn(2, 32, 32, 6), jnp.float32)
    kw = dict(dims=(6, 12, 10, 8), normalization=normalization,
              compute_dtype=dt)
    legacy = RefinementNetwork(**kw)
    # packed_min_res=8: stages at 16^2 and 32^2 run packed, the 8^2 stage
    # legacy — exercises the mixed chain + packed head.
    packed = RefinementNetwork(**kw, conv0_mode="packed", packed_min_res=8)
    variables = legacy.init(jax.random.PRNGKey(0), layout)
    tree_p = jax.eval_shape(
        lambda: packed.init(jax.random.PRNGKey(0), layout))
    assert (jax.tree.map(lambda a: (a.shape, a.dtype), tree_p)
            == jax.tree.map(lambda a: (a.shape, jnp.asarray(a).dtype),
                            variables))

    a = legacy.apply(variables, layout)
    b = packed.apply(variables, layout)
    if dt is None:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=0)
    else:
        # bf16 chains accumulate rounding differently per formulation;
        # gate fidelity (vs the f32 legacy reference), not bit-equality.
        from sg2im_tpu.utils.metrics import psnr

        ref = np.asarray(RefinementNetwork(
            **dict(kw, compute_dtype=None)).apply(variables, layout))
        rng_ = float(ref.max() - ref.min())
        db_legacy = psnr(np.asarray(a), ref, max_val=rng_)
        db_packed = psnr(np.asarray(b), ref, max_val=rng_)
        assert db_packed > 40, f"packed bf16 fidelity {db_packed:.1f} dB"
        assert db_packed > db_legacy - 6, (db_packed, db_legacy)

    if normalization == "batch" and dt is None:
        # Train mode: batch stats computed in the packed domain must match
        # the fine-grid stats exactly.
        a, mut_a = legacy.apply(variables, layout, train=True,
                                mutable=["batch_stats"])
        b, mut_b = packed.apply(variables, layout, train=True,
                                mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=0)
        for la, lb in zip(jax.tree.leaves(mut_a["batch_stats"]),
                          jax.tree.leaves(mut_b["batch_stats"])):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       atol=1e-4, rtol=0)


@pytest.mark.parametrize("normalization", ["batch", "instance"])
def test_generator_bf16_compute_fidelity(normalization):
    """compute_dtype=bf16 (perf mode: bf16 CRN convs + bf16 inter-conv
    activation chain) must stay within the PSNR>=40 dB fidelity gate of the
    f32 path on identical params/inputs, in eval AND train mode, and must
    keep params/batch_stats in f32."""
    import jax
    import jax.numpy as jnp

    from sg2im_tpu.models import Sg2ImGenerator
    from sg2im_tpu.utils.metrics import psnr

    kw = dict(GEN_KWARGS, normalization=normalization, image_size=(32, 32),
              refinement_dims=(16, 12, 8), layout_noise_dim=4)
    gen_f32 = Sg2ImGenerator(vocab=VOCAB, **kw)
    gen_bf16 = Sg2ImGenerator(vocab=VOCAB, compute_dtype=jnp.bfloat16, **kw)

    objs, triples, obj_mask, triple_mask, boxes = _padded_inputs()
    args = (jnp.asarray(objs), jnp.asarray(triples), jnp.asarray(obj_mask),
            jnp.asarray(triple_mask))
    noise = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 4))
    apply_kw = dict(boxes_gt=jnp.asarray(_scatter_per_image(FLAT_BOXES)),
                    layout_noise=noise)

    variables = gen_f32.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        *args, train=False, **apply_kw)
    # The bf16 model must share the identical (f32) variable tree.
    tree_bf16 = jax.eval_shape(
        lambda: gen_bf16.init(
            {"params": jax.random.PRNGKey(0),
             "noise": jax.random.PRNGKey(1)},
            *args, train=False, **apply_kw))
    assert (jax.tree.map(lambda a: (a.shape, a.dtype), tree_bf16)
            == jax.tree.map(lambda a: (a.shape, jnp.asarray(a).dtype),
                            variables))

    img_f32 = gen_f32.apply(variables, *args, train=False, **apply_kw)[0]
    img_bf16 = gen_bf16.apply(variables, *args, train=False, **apply_kw)[0]
    assert img_bf16.dtype == jnp.float32  # output head returns f32
    lo, hi = float(img_f32.min()), float(img_f32.max())
    db = psnr(np.asarray(img_bf16), np.asarray(img_f32), max_val=hi - lo)
    assert db > 40, f"bf16 eval fidelity too low: {db:.1f} dB"

    # Train mode: runs, finite, and batch_stats stay f32.
    out, mut = gen_bf16.apply(
        variables, *args, train=True, **apply_kw,
        rngs={"noise": jax.random.PRNGKey(3)}, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(out[0])).all()
    if normalization == "batch":
        for leaf in jax.tree.leaves(mut["batch_stats"]):
            assert leaf.dtype == jnp.float32
