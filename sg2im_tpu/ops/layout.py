"""Scene layout composition — the #1 hot op, reformulated for the MXU.

The reference (``sg2im/layout.py``) composes layouts by materializing an
``(O, D, H, W)`` tensor (every object vector tiled to full image resolution),
bilinearly warping it into each object's box with cuDNN ``F.grid_sample``
(``layout.py:53``), and scatter-adding over ``obj_to_img``
(``layout.py:131-148``).

TPU-first reformulation.  The warped input is rank-1 along the channel axis:
``grid_sample(vec ⊗ mask) = vec ⊗ grid_sample(mask)``.  And the box-warped
sampling grid (``layout.py:94-128``) is separable, so the mask warp is two
tent-weight matmuls (see ``sg2im_tpu.ops.sampling``).  The whole op becomes:

    warp[o]    = Wy[o] @ mask[o] @ Wx[o]^T          # (H, W), MXU
    layout[n]  = warp_n.reshape(O, H*W)^T @ vecs_n  # (H*W, D), MXU

This removes the O×D×H×W intermediate entirely (O× less HBM traffic), turns
the scatter-add into a dense matmul over the padded object axis, and keeps
every FLOP on the systolic array.  ``boxes_to_layout`` is the special case
``mask = ones(8, 8)`` (the reference tiles vectors to 8×8 before sampling,
``layout.py:52``), for which the warp further factors into an outer product
of 1-D weight sums.

Numerics match torch-0.4 ``F.grid_sample`` align_corners=True + zeros
padding bit-for-bit in f32 (verified against torch in tests/test_layout.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sg2im_tpu.ops.sampling import separable_sample, tent_weights


def box_warp_coords(boxes, out_size: int, in_size: int, axis: int):
    """Source pixel coords for one axis of the box warp.

    Mirrors the grid math of reference ``sg2im/layout.py:94-128``:
    ``t = linspace(0, 1, out)``, ``u = (t - lo) / (hi - lo)`` in [0, 1],
    normalized to [-1, 1], then align_corners=True mapping onto ``in_size``
    texels — which simplifies to ``u * (in_size - 1)``.

    Args:
      boxes: (..., 4) boxes [x0, y0, x1, y1] in [0, 1] image space.
      out_size: output resolution along this axis.
      in_size: source (mask/tile) resolution along this axis.
      axis: 0 for x (width), 1 for y (height).

    Returns:
      (..., out_size) float source coordinates.
    """
    lo = boxes[..., 0 + axis]
    hi = boxes[..., 2 + axis]
    t = jnp.linspace(0.0, 1.0, out_size, dtype=boxes.dtype)
    u = (t - lo[..., None]) / (hi - lo)[..., None]
    return u * (in_size - 1)


def box_warp_weights(boxes, out_h: int, out_w: int, in_h: int, in_w: int):
    """Tent-weight matrices (Wy, Wx) for warping an (in_h, in_w) source into
    box positions of an (out_h, out_w) canvas.

    Returns:
      wy: (..., out_h, in_h), wx: (..., out_w, in_w).
    """
    sy = box_warp_coords(boxes, out_h, in_h, axis=1)
    sx = box_warp_coords(boxes, out_w, in_w, axis=0)
    return tent_weights(sy, in_h), tent_weights(sx, in_w)


def mask_warp(boxes, masks, H: int, W: int):
    """Warp per-object masks into their boxes on an (H, W) canvas.

    Args:
      boxes: (..., 4) boxes in [0, 1].
      masks: (..., M, M) soft masks.

    Returns:
      (..., H, W) warp coefficients (grid_sample of the mask).
    """
    M_h, M_w = masks.shape[-2:]
    wy, wx = box_warp_weights(boxes, H, W, M_h, M_w)
    return separable_sample(masks, wy, wx)


def box_warp(boxes, H: int, W: int, tile: int = 8):
    """Warp coefficients for the boxes-only path.

    Equivalent to ``mask_warp`` with an all-ones (tile, tile) mask — the
    reference expands vectors to 8×8 before sampling (``layout.py:52``) so
    box interiors get coefficient 1 with bilinearly blurred edges.  Factors
    into an outer product of summed tent weights: no M-matmuls needed.
    """
    wy, wx = box_warp_weights(boxes, H, W, tile, tile)
    return wy.sum(-1)[..., :, None] * wx.sum(-1)[..., None, :]


def _compose(warp, vecs, obj_mask, pooling: str):
    """layout[n] = sum_o warp[n, o] * vecs[n, o]  — batched MXU matmul.

    Args:
      warp: (N, O, H, W) warp coefficients (f32, or bf16 in the
        compute_dtype serving mode — products still accumulate in f32 via
        preferred_element_type).
      vecs: (N, O, D) object vectors.
      obj_mask: (N, O) validity mask (padding slots contribute nothing) or
        None.
      pooling: 'sum' (default, reference ``layout.py:30``) or 'avg'
        (divide by per-image object count, ``layout.py:150-158``).

    Returns:
      (N, H, W, D) layout, NHWC, f32.
    """
    N, O, H, W = warp.shape
    if obj_mask is not None:
        warp = warp * obj_mask[:, :, None, None].astype(warp.dtype)
    flat = warp.reshape(N, O, H * W)
    out = jnp.einsum("noP,nod->nPd", flat, vecs.astype(flat.dtype),
                     precision="highest",
                     preferred_element_type=jnp.float32,
                     ).reshape(N, H, W, -1)
    if pooling == "avg":
        if obj_mask is None:
            counts = jnp.full((N,), O, dtype=out.dtype)
        else:
            counts = obj_mask.astype(out.dtype).sum(-1)
        out = out / jnp.maximum(counts, 1.0)[:, None, None, None]
    elif pooling != "sum":
        raise ValueError(f'Invalid pooling "{pooling}"')
    return out


def boxes_to_layout(vecs, boxes, obj_mask, H: int, W: int | None = None,
                    pooling: str = "sum", compute_dtype=None):
    """Padded-batch layout composition from boxes only.

    Args:
      vecs: (N, O, D) object vectors.
      boxes: (N, O, 4) boxes [x0, y0, x1, y1] in [0, 1].
      obj_mask: (N, O) bool/int validity mask, or None if all slots real.
      H, W: output resolution.
      compute_dtype: e.g. bf16 — narrows the (N, O, H, W) warp
        intermediate (the compose's dominant HBM tensor; tent weights are
        still constructed in f32, and the compose accumulates in f32).
        Only set when the consumer is the bf16 CRN chain.

    Returns:
      (N, H, W, D) layout.  NHWC analogue of reference
      ``boxes_to_layout`` (``sg2im/layout.py:30-63``).
    """
    W = H if W is None else W
    warp = box_warp(boxes, H, W)
    if compute_dtype is not None:
        warp = warp.astype(compute_dtype)
    return _compose(warp, vecs, obj_mask, pooling)


def masks_to_layout(vecs, boxes, masks, obj_mask, H: int, W: int | None = None,
                    pooling: str = "sum", backend: str = "auto",
                    compute_dtype=None):
    """Padded-batch layout composition modulated by per-object masks.

    NHWC analogue of reference ``masks_to_layout`` (``sg2im/layout.py:66-91``).

    Args:
      vecs: (N, O, D); boxes: (N, O, 4); masks: (N, O, M, M);
      obj_mask: (N, O) or None.
      backend: 'auto' (XLA unless SG2IM_TPU_FORCE_PALLAS=1 opts into the
        fused kernel on TPU — see pallas_available), 'xla', 'pallas',
        'pallas-v2', or 'pallas-interpret' (for CPU testing).
      compute_dtype: e.g. bf16 — narrows the (N, O, H, W) warp
        intermediate (see boxes_to_layout; XLA path only).
    """
    from sg2im_tpu.ops.pallas.layout_kernel import (
        fused_layout_compose,
        fused_layout_compose_v2,
        pallas_available,
    )

    W = H if W is None else W
    masks = masks.astype(vecs.dtype)
    valid = ("auto", "xla", "pallas", "pallas-interpret", "pallas-v2")
    if backend not in valid:
        raise ValueError(f'Invalid backend "{backend}"; one of {valid}')
    use_pallas = backend in ("pallas", "pallas-interpret", "pallas-v2") or (
        backend == "auto" and pallas_available(H, W))
    if use_pallas:
        v = vecs if obj_mask is None else (
            vecs * obj_mask[..., None].astype(vecs.dtype))
        if backend == "pallas-v2":
            out = fused_layout_compose_v2(boxes, masks, v, H, W, False)
        else:
            M_h, M_w = masks.shape[-2:]
            wy, wx = box_warp_weights(boxes, H, W, M_h, M_w)
            out = fused_layout_compose(
                wy, wx, masks, v, backend == "pallas-interpret")
        return _apply_avg(out, obj_mask, pooling, vecs.shape[1])
    warp = mask_warp(boxes, masks, H, W)
    if compute_dtype is not None:
        # The cast fuses into the producing matmul's epilogue, so the
        # stored intermediate is half-width (536 -> 268 MB at vg128/b128).
        warp = warp.astype(compute_dtype)
    return _compose(warp, vecs, obj_mask, pooling)


def _apply_avg(out, obj_mask, pooling: str, num_objs: int):
    if pooling == "sum":
        return out
    if pooling != "avg":
        raise ValueError(f'Invalid pooling "{pooling}"')
    if obj_mask is None:
        # All slots real — same counts=O convention as _compose, so the
        # fused and XLA backends behave identically for identical args.
        counts = jnp.full((out.shape[0],), float(num_objs), out.dtype)
    else:
        counts = jnp.maximum(obj_mask.astype(out.dtype).sum(-1), 1.0)
    return out / counts[:, None, None, None]


def boxes_to_layout_flat(vecs, boxes, obj_to_img, H: int, W: int | None = None,
                         pooling: str = "sum", num_imgs: int | None = None):
    """Flat (ragged) API matching the reference signature exactly —
    ``sg2im/layout.py:30``: vecs (O, D), boxes (O, 4), obj_to_img (O,).

    Used for parity testing and single-graph inference; the padded API above
    is the compiled hot path.
    """
    W = H if W is None else W
    N = int(num_imgs) if num_imgs is not None else int(obj_to_img.max()) + 1
    warp = box_warp(boxes, H, W)  # (O, H, W)
    return _compose_flat(warp, vecs, obj_to_img, N, pooling)


def masks_to_layout_flat(vecs, boxes, masks, obj_to_img, H: int,
                         W: int | None = None, pooling: str = "sum",
                         num_imgs: int | None = None):
    """Flat API matching reference ``masks_to_layout`` (``sg2im/layout.py:66``)."""
    W = H if W is None else W
    N = int(num_imgs) if num_imgs is not None else int(obj_to_img.max()) + 1
    warp = mask_warp(boxes, masks.astype(vecs.dtype), H, W)
    return _compose_flat(warp, vecs, obj_to_img, N, pooling)


def _compose_flat(warp, vecs, obj_to_img, N: int, pooling: str):
    O, H, W = warp.shape
    onehot = jax.nn.one_hot(obj_to_img, N, dtype=vecs.dtype)  # (O, N)
    vec_n = onehot[:, :, None] * vecs[:, None, :]  # (O, N, D)
    out = jnp.einsum("ond,oP->nPd", vec_n, warp.reshape(O, H * W),
                     precision="highest")
    out = out.reshape(N, H, W, -1)
    if pooling == "avg":
        counts = jnp.maximum(onehot.sum(0), 1.0)
        out = out / counts[:, None, None, None]
    elif pooling != "sum":
        raise ValueError(f'Invalid pooling "{pooling}"')
    return out
