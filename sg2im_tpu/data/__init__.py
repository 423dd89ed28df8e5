"""Data pipeline: padded batching, scene-graph encoding, transforms, loaders."""

from sg2im_tpu.data.batching import (
    GraphBatch,
    flat_to_padded,
    pad_graphs,
    padded_to_flat,
)
from sg2im_tpu.data.scene_graphs import encode_scene_graphs
from sg2im_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    imagenet_deprocess,
    imagenet_deprocess_batch,
    imagenet_preprocess,
)

__all__ = [
    "GraphBatch",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "encode_scene_graphs",
    "flat_to_padded",
    "imagenet_deprocess",
    "imagenet_deprocess_batch",
    "imagenet_preprocess",
    "pad_graphs",
    "padded_to_flat",
]
