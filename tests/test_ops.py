"""Kernel-layer parity tests.

Every sampling/layout/crop op is verified against PyTorch CPU with
align_corners=True + zeros padding — the exact semantics of torch 0.4
``F.grid_sample`` that the reference relied on (SURVEY.md §2.2 fidelity note).
The torch pipelines below re-create the reference's *behavior* from its
documented math (grid construction, tile-expand, scatter-add) to serve as an
independent oracle.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from sg2im_tpu import ops


def _torch_boxes_to_grid(boxes, H, W):
    """Oracle grid: X=(linspace(0,1,W)-x0)/(x1-x0), scaled to [-1,1]."""
    O = boxes.shape[0]
    x0 = boxes[:, 0].view(O, 1, 1)
    y0 = boxes[:, 1].view(O, 1, 1)
    ww = (boxes[:, 2] - boxes[:, 0]).view(O, 1, 1)
    hh = (boxes[:, 3] - boxes[:, 1]).view(O, 1, 1)
    X = ((torch.linspace(0, 1, W).view(1, 1, W) - x0) / ww).expand(O, H, W)
    Y = ((torch.linspace(0, 1, H).view(1, H, 1) - y0) / hh).expand(O, H, W)
    return torch.stack([X, Y], dim=3) * 2 - 1


def _torch_layout(vecs, boxes, masks, obj_to_img, N, H, W, pooling="sum"):
    """Oracle layout pipeline (tile/mask-mul, grid_sample, index_add)."""
    O, D = vecs.shape
    grid = _torch_boxes_to_grid(boxes, H, W)
    if masks is None:
        img_in = vecs.view(O, D, 1, 1).expand(O, D, 8, 8)
    else:
        M = masks.shape[1]
        img_in = vecs.view(O, D, 1, 1) * masks.float().view(O, 1, M, M)
    sampled = F.grid_sample(img_in.contiguous(), grid, align_corners=True,
                            padding_mode="zeros", mode="bilinear")
    out = torch.zeros(N, D, H, W)
    out.index_add_(0, obj_to_img, sampled)
    if pooling == "avg":
        counts = torch.zeros(N).index_add_(0, obj_to_img, torch.ones(O))
        out = out / counts.clamp(min=1).view(N, 1, 1, 1)
    return out


def _fixture():
    """The reference's own layout smoke fixture (sg2im/layout.py:165-235)."""
    vecs = np.array(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
        np.float32,
    )
    boxes = np.array(
        [
            [0.25, 0.125, 0.5, 0.875],
            [0, 0, 1, 0.25],
            [0.6125, 0, 0.875, 1],
            [0, 0.8, 1, 1.0],
            [0.25, 0.125, 0.5, 0.875],
            [0.6125, 0, 0.875, 1],
        ],
        np.float32,
    )
    obj_to_img = np.array([0, 0, 0, 1, 1, 1], np.int64)
    return vecs, boxes, obj_to_img


@pytest.mark.parametrize("pooling", ["sum", "avg"])
def test_boxes_to_layout_matches_torch(pooling):
    vecs, boxes, o2i = _fixture()
    want = _torch_layout(
        torch.from_numpy(vecs), torch.from_numpy(boxes), None,
        torch.from_numpy(o2i), 2, 64, 64, pooling,
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(
        ops.boxes_to_layout_flat(jnp.asarray(vecs), jnp.asarray(boxes),
                                 jnp.asarray(o2i), 64, pooling=pooling,
                                 num_imgs=2)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_masks_to_layout_matches_torch():
    rng = np.random.RandomState(0)
    vecs, boxes, o2i = _fixture()
    masks = (rng.rand(6, 5, 5) > 0.4).astype(np.float32)
    want = _torch_layout(
        torch.from_numpy(vecs), torch.from_numpy(boxes),
        torch.from_numpy(masks), torch.from_numpy(o2i), 2, 48, 32,
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(
        ops.masks_to_layout_flat(jnp.asarray(vecs), jnp.asarray(boxes),
                                 jnp.asarray(masks), jnp.asarray(o2i),
                                 48, 32, num_imgs=2)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_layout_random_boxes_out_of_bounds():
    """Boxes partially outside [0,1] and random vecs still match torch."""
    rng = np.random.RandomState(1)
    O, D = 7, 12
    vecs = rng.randn(O, D).astype(np.float32)
    lo = rng.uniform(-0.3, 0.8, (O, 2)).astype(np.float32)
    sz = rng.uniform(0.05, 0.7, (O, 2)).astype(np.float32)
    boxes = np.concatenate([lo, lo + sz], 1).astype(np.float32)
    o2i = rng.randint(0, 3, O).astype(np.int64)
    want = _torch_layout(
        torch.from_numpy(vecs), torch.from_numpy(boxes), None,
        torch.from_numpy(o2i), 3, 32, 32,
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(
        ops.boxes_to_layout_flat(jnp.asarray(vecs), jnp.asarray(boxes),
                                 jnp.asarray(o2i), 32, num_imgs=3)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_degenerate_box_is_zero_not_nan():
    vecs = jnp.ones((1, 3))
    boxes = jnp.array([[0.5, 0.2, 0.5, 0.8]])  # zero width
    out = ops.boxes_to_layout_flat(vecs, boxes, jnp.array([0]), 16, num_imgs=1)
    assert np.isfinite(np.asarray(out)).all()


def test_padded_matches_flat():
    """Padding invariance: padded-batch layout == flat ragged layout."""
    rng = np.random.RandomState(2)
    vecs, boxes, o2i = _fixture()
    flat = np.asarray(
        ops.boxes_to_layout_flat(jnp.asarray(vecs), jnp.asarray(boxes),
                                 jnp.asarray(o2i), 32, num_imgs=2)
    )
    # Pad to (N=2, O=5) with garbage in the padding slots.
    O_max = 5
    pv = rng.randn(2, O_max, 3).astype(np.float32)
    pb = rng.rand(2, O_max, 4).astype(np.float32)
    pm = np.zeros((2, O_max), bool)
    for n in range(2):
        idx = np.where(o2i == n)[0]
        pv[n, : len(idx)] = vecs[idx]
        pb[n, : len(idx)] = boxes[idx]
        pm[n, : len(idx)] = True
    padded = np.asarray(
        ops.boxes_to_layout(jnp.asarray(pv), jnp.asarray(pb),
                            jnp.asarray(pm), 32)
    )
    np.testing.assert_allclose(padded, flat, atol=1e-5)


def test_grid_sample_matches_torch_random_grid():
    rng = np.random.RandomState(3)
    img = rng.randn(2, 9, 11, 4).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, (2, 5, 7, 2)).astype(np.float32)
    want = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2), torch.from_numpy(grid),
        align_corners=True, padding_mode="zeros", mode="bilinear",
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(ops.grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def _torch_crop(feats, bbox, HH, WW):
    """Oracle for crop_bbox cudnn backend (sg2im/bilinear.py:103-132)."""
    N = feats.shape[0]
    b = 2 * bbox - 1
    xs = torch.stack(
        [torch.linspace(float(b[i, 0]), float(b[i, 2]), WW) for i in range(N)]
    )
    ys = torch.stack(
        [torch.linspace(float(b[i, 1]), float(b[i, 3]), HH) for i in range(N)]
    )
    X = xs.view(N, 1, WW).expand(N, HH, WW)
    Y = ys.view(N, HH, 1).expand(N, HH, WW)
    grid = torch.stack([X, Y], dim=3)
    return F.grid_sample(feats, grid, align_corners=True,
                         padding_mode="zeros", mode="bilinear")


def test_crop_bbox_matches_torch():
    rng = np.random.RandomState(4)
    feats = rng.randn(3, 16, 20, 5).astype(np.float32)
    lo = rng.uniform(-0.1, 0.7, (3, 2)).astype(np.float32)
    sz = rng.uniform(0.1, 0.6, (3, 2)).astype(np.float32)
    bbox = np.concatenate([lo, lo + sz], 1).astype(np.float32)
    want = _torch_crop(
        torch.from_numpy(feats).permute(0, 3, 1, 2), torch.from_numpy(bbox),
        8, 12,
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(ops.crop_bbox(jnp.asarray(feats), jnp.asarray(bbox), 8, 12))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_crop_bbox_batch_cross_image():
    """Boxes referencing out-of-order images (reference __main__ fixture
    pattern, sg2im/bilinear.py:298: box_to_feats=[1,0,1])."""
    rng = np.random.RandomState(5)
    feats = rng.randn(2, 12, 12, 3).astype(np.float32)
    bbox = np.array(
        [[0, 0, 1, 1], [0.25, 0.25, 0.75, 0.75], [0, 0, 0.5, 0.5]], np.float32
    )
    b2f = np.array([1, 0, 1])
    got = np.asarray(
        ops.crop_bbox_batch(jnp.asarray(feats), jnp.asarray(bbox),
                            jnp.asarray(b2f), 8)
    )
    for i in range(3):
        want = _torch_crop(
            torch.from_numpy(feats[b2f[i]][None]).permute(0, 3, 1, 2),
            torch.from_numpy(bbox[i][None]), 8, 8,
        ).permute(0, 2, 3, 1).numpy()[0]
        np.testing.assert_allclose(got[i], want, atol=2e-5)


def test_crop_padded_matches_flat():
    rng = np.random.RandomState(6)
    imgs = rng.randn(2, 10, 10, 3).astype(np.float32)
    boxes = rng.rand(2, 4, 2).astype(np.float32)
    boxes = np.concatenate([boxes * 0.5, boxes * 0.5 + 0.4], -1)
    padded = np.asarray(
        ops.crop_bbox_padded(jnp.asarray(imgs), jnp.asarray(boxes), 6)
    )
    flat_boxes = boxes.reshape(-1, 4)
    b2f = np.repeat(np.arange(2), 4)
    flat = np.asarray(
        ops.crop_bbox_batch(jnp.asarray(imgs), jnp.asarray(flat_boxes),
                            jnp.asarray(b2f), 6)
    )
    np.testing.assert_allclose(padded.reshape(-1, 6, 6, 3), flat, atol=1e-5)


def test_tensor_linspace():
    start = jnp.asarray(np.array([[0.0, 1.0], [2.0, -1.0]], np.float32))
    end = jnp.asarray(np.array([[1.0, 0.0], [4.0, 3.0]], np.float32))
    out = np.asarray(ops.tensor_linspace(start, end, 5))
    assert out.shape == (2, 2, 5)
    np.testing.assert_allclose(out[0, 0], [0, 0.25, 0.5, 0.75, 1.0], atol=1e-6)
    np.testing.assert_allclose(out[1, 1], [-1, 0, 1, 2, 3], atol=1e-6)


def test_uncrop_roundtrip_center():
    """uncrop(crop(x)) restores interior pixels for an axis-aligned box."""
    yy, xx = np.mgrid[0:16, 0:16].astype(np.float32) / 15.0
    img = np.stack([yy, xx], -1)[None]  # smooth ramps survive interpolation
    bbox = np.array([[0.25, 0.25, 0.75, 0.75]], np.float32)
    crops = ops.crop_bbox(jnp.asarray(img), jnp.asarray(bbox), 32, backend="border")
    out = np.asarray(ops.uncrop_bbox(crops, jnp.asarray(bbox), 16))
    # Outside the box: fill value.
    assert (out[0, 0, 0] == 0).all()
    # Interior should be close to the original.
    np.testing.assert_allclose(out[0, 6:10, 6:10], img[0, 6:10, 6:10], atol=0.5)


def test_box_transforms_roundtrip():
    rng = np.random.RandomState(8)
    anchors = np.abs(rng.randn(5, 4)).astype(np.float32) + 0.2
    boxes = np.abs(rng.randn(5, 4)).astype(np.float32) + 0.2
    t = ops.invert_box_transform(jnp.asarray(anchors), jnp.asarray(boxes))
    back = ops.apply_box_transform(jnp.asarray(anchors), t)
    np.testing.assert_allclose(np.asarray(back), boxes, atol=1e-4)
    c = ops.extents_to_centers(jnp.asarray(boxes))
    e = ops.centers_to_extents(c)
    np.testing.assert_allclose(np.asarray(e), boxes, atol=1e-5)


def test_layout_fuzz_adversarial_boxes():
    """Inverted (x1<x0), degenerate (zero-size), and far-out-of-frame boxes
    all match torch grid_sample semantics (or are finite where torch NaNs
    from 0/0 are implementation-defined)."""
    rng = np.random.RandomState(11)
    for trial in range(5):
        O, D = 6, 4
        vecs = rng.randn(O, D).astype(np.float32)
        boxes = rng.uniform(-1.5, 1.5, (O, 4)).astype(np.float32)
        boxes[0] = [0.8, 0.2, 0.3, 0.6]      # inverted x
        boxes[1] = [0.5, 0.5, 0.5, 0.9]      # zero width
        boxes[2] = [-5.0, -5.0, -4.0, -4.0]  # fully out of frame
        o2i = np.zeros(O, np.int64)
        want = _torch_layout(
            torch.from_numpy(vecs), torch.from_numpy(boxes), None,
            torch.from_numpy(o2i), 1, 16, 16,
        ).permute(0, 2, 3, 1).numpy()
        got = np.asarray(ops.boxes_to_layout_flat(
            jnp.asarray(vecs), jnp.asarray(boxes), jnp.asarray(o2i), 16,
            num_imgs=1))
        finite = np.isfinite(want)
        np.testing.assert_allclose(got[finite], want[finite], atol=1e-4)
        assert np.isfinite(got).all()
