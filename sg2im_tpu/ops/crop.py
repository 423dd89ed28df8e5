"""Differentiable batched bbox cropping for the object discriminator.

The reference (``sg2im/bilinear.py:28-132``) groups boxes by source image in
a *Python loop* (``bilinear.py:76-87``), concatenates, runs cuDNN
``F.grid_sample``, and inverse-permutes.  On TPU the loop disappears: the
crop grid is a per-box separable linspace (``tensor_linspace``,
``bilinear.py:126-127``), so each crop is two tent-weight matmuls against the
source image, batched over (image, object) with static shapes.

Coordinate math parity with reference ``crop_bbox`` (cudnn backend,
``bilinear.py:103-132``): boxes mapped [0,1]→[-1,1], endpoints linspaced
*inclusively*, align_corners=True pixel mapping, zeros padding.  This
simplifies to ``src_x(xx) = (x0 + (x1-x0)·xx/(WW-1)) · (W-1)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sg2im_tpu.ops.sampling import (
    bilinear_sample_border,
    tensor_linspace,
    tent_weights,
)


def _crop_weights(boxes, HH: int, WW: int, H: int, W: int):
    """Tent weights for cropping: wy (..., HH, H), wx (..., WW, W)."""
    x0, y0 = boxes[..., 0], boxes[..., 1]
    x1, y1 = boxes[..., 2], boxes[..., 3]
    sx = tensor_linspace(x0, x1, WW) * (W - 1)
    sy = tensor_linspace(y0, y1, HH) * (H - 1)
    return tent_weights(sy, H), tent_weights(sx, W)


def crop_bbox(feats, bbox, HH: int, WW: int | None = None,
              backend: str = "separable"):
    """Differentiable per-image crops: crops[i] is bbox[i] cut from feats[i].

    NHWC analogue of reference ``crop_bbox`` (``sg2im/bilinear.py:103-132``).

    Args:
      feats: (B, H, W, C).
      bbox: (B, 4) boxes [x0, y0, x1, y1] in [0, 1].
      HH, WW: output crop resolution.
      backend: 'separable' (MXU tent matmuls; matches reference 'cudnn'
        zeros-padding numerics) or 'border' (gather path matching the
        reference 'jj' backend's clamp semantics, ``bilinear.py:129``).

    Returns:
      (B, HH, WW, C) crops.
    """
    WW = HH if WW is None else WW
    B, H, W, C = feats.shape
    if backend == "border":
        x0, y0 = bbox[..., 0], bbox[..., 1]
        x1, y1 = bbox[..., 2], bbox[..., 3]
        X = jnp.broadcast_to(tensor_linspace(x0, x1, WW)[:, None, :], (B, HH, WW))
        Y = jnp.broadcast_to(tensor_linspace(y0, y1, HH)[:, :, None], (B, HH, WW))
        return bilinear_sample_border(feats, X, Y)
    wy, wx = _crop_weights(bbox, HH, WW, H, W)
    t = jnp.einsum("byh,bhwc->bywc", wy, feats, precision="highest")
    return jnp.einsum("bywc,bxw->byxc", t, wx, precision="highest")


def crop_bbox_batch(feats, bbox, bbox_to_feats, HH: int, WW: int | None = None):
    """Flat API matching reference ``crop_bbox_batch``
    (``sg2im/bilinear.py:28-59``): crops[b] cuts bbox[b] from
    feats[bbox_to_feats[b]].

    The reference's per-image Python loop + inverse permutation
    (``bilinear.py:69-100``) is replaced by one gather + batched separable
    sampling.

    Args:
      feats: (N, H, W, C); bbox: (B, 4); bbox_to_feats: (B,) int in [0, N).

    Returns:
      (B, HH, WW, C).
    """
    WW = HH if WW is None else WW
    src = jnp.take(feats, bbox_to_feats, axis=0)  # (B, H, W, C)
    return crop_bbox(src, bbox, HH, WW)


def crop_bbox_padded(imgs, boxes, HH: int, WW: int | None = None):
    """Padded-batch crops — the compiled hot path for AcCropDiscriminator.

    Args:
      imgs: (N, H, W, C) images.
      boxes: (N, O, 4) per-image padded boxes.

    Returns:
      (N, O, HH, WW, C); padding slots produce garbage and must be masked by
      the caller's loss (degenerate [0,0,0,0] pad boxes actually produce the
      top-left texel everywhere, which is harmless once masked).
    """
    WW = HH if WW is None else WW
    N, H, W, C = imgs.shape
    wy, wx = _crop_weights(boxes, HH, WW, H, W)  # (N, O, HH, H), (N, O, WW, W)
    t = jnp.einsum("noyh,nhwc->noywc", wy, imgs, precision="highest")
    return jnp.einsum("noywc,noxw->noyxc", t, wx, precision="highest")


def uncrop_bbox(feats, bbox, H: int, W: int | None = None, fill_value=0.0):
    """Inverse of crop: paste each crop back into its box position.

    NHWC analogue of reference ``uncrop_bbox`` (``sg2im/bilinear.py:136-188``):
    border-clamped bilinear sampling of the crop at inverse-warped coords,
    with everything outside the box set to ``fill_value``.

    Args:
      feats: (B, HH, WW, C) crops; bbox: (B, 4) target boxes in [0, 1].

    Returns:
      (B, H, W, C).
    """
    W = H if W is None else W
    B = feats.shape[0]
    x0, y0 = bbox[..., 0], bbox[..., 1]
    x1, y1 = bbox[..., 2], bbox[..., 3]
    tx = jnp.linspace(0.0, 1.0, W, dtype=feats.dtype)
    ty = jnp.linspace(0.0, 1.0, H, dtype=feats.dtype)
    X = (tx[None, :] - x0[:, None]) / (x1 - x0)[:, None]  # (B, W)
    Y = (ty[None, :] - y0[:, None]) / (y1 - y0)[:, None]  # (B, H)
    out_mask = ((X < 0) | (X > 1))[:, None, :] | ((Y < 0) | (Y > 1))[:, :, None]
    Xg = jnp.broadcast_to(X[:, None, :], (B, H, W))
    Yg = jnp.broadcast_to(Y[:, :, None], (B, H, W))
    out = bilinear_sample_border(feats, Xg, Yg)
    return jnp.where(out_mask[..., None], jnp.asarray(fill_value, out.dtype), out)
