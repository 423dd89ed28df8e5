"""Differentiable spatial ops — the kernel layer.

TPU-first reformulations of reference ``sg2im/{layout,bilinear,box_utils}.py``:
separable tent-weight sampling (MXU matmuls instead of gathers), dense
one-hot composition (matmul instead of scatter-add), static padded shapes.
"""

from sg2im_tpu.ops.boxes import (
    apply_box_transform,
    centers_to_extents,
    extents_to_centers,
    invert_box_transform,
)
from sg2im_tpu.ops.crop import (
    crop_bbox,
    crop_bbox_batch,
    crop_bbox_padded,
    uncrop_bbox,
)
from sg2im_tpu.ops.layout import (
    box_warp,
    boxes_to_layout,
    boxes_to_layout_flat,
    mask_warp,
    masks_to_layout,
    masks_to_layout_flat,
)
from sg2im_tpu.ops.sampling import (
    bilinear_sample_border,
    grid_sample,
    separable_sample,
    tensor_linspace,
    tent_weights,
)

__all__ = [
    "apply_box_transform",
    "bilinear_sample_border",
    "box_warp",
    "boxes_to_layout",
    "boxes_to_layout_flat",
    "centers_to_extents",
    "crop_bbox",
    "crop_bbox_batch",
    "crop_bbox_padded",
    "extents_to_centers",
    "grid_sample",
    "invert_box_transform",
    "mask_warp",
    "masks_to_layout",
    "masks_to_layout_flat",
    "separable_sample",
    "tensor_linspace",
    "tent_weights",
    "uncrop_bbox",
]
