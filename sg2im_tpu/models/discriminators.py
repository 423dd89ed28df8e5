"""GAN discriminators (reference ``sg2im/discriminators.py``).

- ``PatchDiscriminator``: arch-string CNN over images; returns the raw conv
  feature map as patch scores.  The reference also builds a 1x1 ``classifier``
  conv that its forward never uses (``discriminators.py:40-45``) — we do not
  create it; the checkpoint converter drops those keys.
- ``AcDiscriminator``: CNN + global-avg-pool + Linear(1024) trunk with a
  real/fake head and an auxiliary object-classifier head.  Unlike the
  reference (which computes cross-entropy *inside* forward,
  ``discriminators.py:74``) this returns logits; the loss lives in
  ``sg2im_tpu.losses`` where masking over padded objects is handled.
- ``AcCropDiscriminator``: differentiably crops each object's box from the
  image (separable-matmul crop kernel) and scores crops with AcDiscriminator.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from sg2im_tpu.nn.layers import (
    ArchCNN,
    global_avg_pool,
    parse_arch,
    torch_linear_bias_init,
    torch_linear_kernel_init,
)
from sg2im_tpu.ops.crop import crop_bbox_padded


class PatchDiscriminator(nn.Module):
    """Reference ``sg2im/discriminators.py:25-45``."""

    arch: str
    normalization: str = "batch"
    activation: str = "leakyrelu-0.2"
    padding: str = "same"
    pooling: str = "avg"
    layout_dim: int = 0

    @nn.compact
    def __call__(self, x, layout=None, train: bool = False):
        """x: (N, H, W, 3); optional layout (N, H, W, layout_dim)."""
        if layout is not None:
            x = jnp.concatenate([x, layout], axis=-1)
        input_dim = 3 + self.layout_dim
        arch = f"I{input_dim},{self.arch}"
        return ArchCNN(
            arch=arch,
            normalization=self.normalization,
            activation=self.activation,
            padding=self.padding,
            pooling=self.pooling,
            name="cnn",
        )(x, train=train)


class AcDiscriminator(nn.Module):
    """Reference ``sg2im/discriminators.py:48-75`` (returns logits, not loss)."""

    vocab: Any
    arch: str
    normalization: str = "none"
    activation: str = "relu"
    padding: str = "same"
    pooling: str = "avg"

    @nn.compact
    def __call__(self, x, train: bool = False, sample_mask=None):
        """x: (B, h, w, C) crops; sample_mask (B,) excludes padded crops
        from train-mode BN statistics. Returns (real_scores (B, 1),
        obj_logits (B, num_objects))."""
        _, cnn_dim = parse_arch(self.arch, self.normalization,
                                self.activation, self.padding, self.pooling)
        feats = ArchCNN(
            arch=self.arch,
            normalization=self.normalization,
            activation=self.activation,
            padding=self.padding,
            pooling=self.pooling,
            name="cnn_0",
        )(x, train=train, sample_mask=sample_mask)
        vecs = global_avg_pool(feats)
        vecs = nn.Dense(
            1024,
            kernel_init=torch_linear_kernel_init(),
            bias_init=torch_linear_bias_init(cnn_dim),
            precision=jax.lax.Precision.HIGHEST,
            name="cnn_2",
        )(vecs)
        real_scores = nn.Dense(
            1,
            kernel_init=torch_linear_kernel_init(),
            bias_init=torch_linear_bias_init(1024),
            precision=jax.lax.Precision.HIGHEST,
            name="real_classifier",
        )(vecs)
        num_objects = len(self.vocab["object_idx_to_name"])
        obj_logits = nn.Dense(
            num_objects,
            kernel_init=torch_linear_kernel_init(),
            bias_init=torch_linear_bias_init(1024),
            precision=jax.lax.Precision.HIGHEST,
            name="obj_classifier",
        )(vecs)
        return real_scores, obj_logits


class AcCropDiscriminator(nn.Module):
    """Reference ``sg2im/discriminators.py:78-90``, padded-batch native."""

    vocab: Any
    arch: str
    normalization: str = "none"
    activation: str = "relu"
    object_size: int = 64
    padding: str = "same"
    pooling: str = "avg"

    @nn.compact
    def __call__(self, imgs, boxes, obj_mask=None, train: bool = False):
        """
        Args:
          imgs: (N, H, W, 3); boxes: (N, O, 4) padded per-image boxes;
          obj_mask: (N, O) validity (padded crops excluded from BN stats).

        Returns:
          (real_scores (N, O, 1), obj_logits (N, O, num_objects)).
          Padded slots must be masked by the loss.
        """
        N, O = boxes.shape[:2]
        crops = crop_bbox_padded(imgs, boxes, self.object_size)
        crops = crops.reshape((N * O,) + crops.shape[2:])
        flat_mask = None if obj_mask is None else obj_mask.reshape(N * O)
        real_scores, obj_logits = AcDiscriminator(
            vocab=self.vocab,
            arch=self.arch,
            normalization=self.normalization,
            activation=self.activation,
            padding=self.padding,
            pooling=self.pooling,
            name="discriminator",
        )(crops, train=train, sample_mask=flat_mask)
        return (real_scores.reshape(N, O, -1),
                obj_logits.reshape(N, O, -1))
