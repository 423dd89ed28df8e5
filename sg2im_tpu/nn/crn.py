"""Cascaded Refinement Network (Chen & Koltun, ICCV 2017).

Reference: ``sg2im/crn.py``.  Flax/NHWC redesign: each module nearest-2×
upsamples its features, average-pools the layout down to match
(``crn.py:54-62``), concatenates, and applies two conv-norm-act blocks;
features start as zeros at H/2^k (``crn.py:105``).  Convs use kaiming-normal
init (``crn.py:49-51,84-85``).  Layer names follow the torch Sequential
indices inside each module's ``net`` for checkpoint conversion (conv at 0/3
with norms present, see ``crn.py:40-52``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sg2im_tpu.nn.layers import (
    BatchNorm,
    apply_activation,
    avg_pool_2d,
    instance_norm_2d,
    kaiming_normal_init,
    parse_activation,
    torch_linear_bias_init,
    upsample_nearest,
)


def _crn_indices(normalization: str):
    """Torch Sequential indices of the two convs (+norms) inside a
    RefinementModule's net, replicating the None-filtering at
    ``sg2im/crn.py:40-48``."""
    if normalization == "none":
        return {"conv0": 0, "conv1": 2, "norm0": None, "norm1": None}
    return {"conv0": 0, "norm0": 1, "conv1": 3, "norm1": 4}


class RefinementModule(nn.Module):
    """One CRN stage (reference ``sg2im/crn.py:35-65``)."""

    layout_dim: int
    input_dim: int
    output_dim: int
    normalization: str = "instance"
    activation: str = "leakyrelu"
    compute_dtype: object = None  # e.g. jnp.bfloat16 for MXU-speed convs

    @nn.compact
    def __call__(self, layout, feats, train: bool = False):
        act = parse_activation(self.activation)
        idx = _crn_indices(self.normalization)

        HH = layout.shape[1]
        H = feats.shape[1]
        if HH > H:
            factor = HH // H
            layout = avg_pool_2d(layout, factor)
        x = jnp.concatenate([layout, feats], axis=-1)

        for block, conv_key, norm_key, cin in (
            (0, "conv0", "norm0", self.layout_dim + self.input_dim),
            (1, "conv1", "norm1", self.output_dim),
        ):
            x = nn.Conv(
                self.output_dim,
                (3, 3),
                padding=[(1, 1), (1, 1)],
                kernel_init=kaiming_normal_init(),
                bias_init=torch_linear_bias_init(cin * 9),
                dtype=self.compute_dtype,
                name=f"layer{idx[conv_key]}",
            )(x)
            if self.compute_dtype is not None:
                x = x.astype(jnp.float32)  # norms/activations in f32
            if self.normalization == "batch":
                x = BatchNorm(self.output_dim, name=f"layer{idx[norm_key]}")(
                    x, train=train
                )
            elif self.normalization == "instance":
                x = instance_norm_2d(x)
            x = apply_activation(act, x)
        return x


class RefinementNetwork(nn.Module):
    """Full CRN (reference ``sg2im/crn.py:68-111``).

    ``dims[0]`` is the layout channel count; ``dims[1:]`` the per-stage
    output channels.  Output head: conv3x3 + act + conv1x1 -> 3 channels
    (``crn.py:79-86``).
    """

    dims: tuple[int, ...]
    normalization: str = "instance"
    activation: str = "leakyrelu"
    compute_dtype: object = None

    @nn.compact
    def __call__(self, layout, train: bool = False):
        act = parse_activation(self.activation)
        layout_dim = self.dims[0]
        N, H, W, _ = layout.shape
        n_mods = len(self.dims) - 1
        h0, w0 = H >> n_mods, W >> n_mods
        assert h0 > 0 and w0 > 0, "Too many refinement modules for image size"

        # Layout pyramid: the reference avg-pools the full-res layout down
        # to each stage's resolution independently (``crn.py:59-62``).
        # Successive factor-2 pooling is mathematically identical (averages
        # of equal-size blocks compose exactly) and reads each level once
        # instead of re-reading the full-res layout per stage — ~4x less
        # HBM traffic for the pooling chain.
        pyramid = [layout]
        for _ in range(n_mods - 1):
            pyramid.append(avg_pool_2d(pyramid[-1], 2))
        pyramid = pyramid[::-1]  # lowest resolution first

        feats = jnp.zeros((N, h0, w0, 1), dtype=layout.dtype)
        for i in range(1, len(self.dims)):
            input_dim = 1 if i == 1 else self.dims[i - 1]
            feats = upsample_nearest(feats, 2)
            feats = RefinementModule(
                layout_dim,
                input_dim,
                self.dims[i],
                normalization=self.normalization,
                activation=self.activation,
                compute_dtype=self.compute_dtype,
                name=f"refinement_modules_{i - 1}",
            )(pyramid[i - 1], feats, train=train)

        x = nn.Conv(
            self.dims[-1], (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=kaiming_normal_init(),
            bias_init=torch_linear_bias_init(self.dims[-1] * 9),
            dtype=self.compute_dtype,
            name="output_conv_0",
        )(feats)
        if self.compute_dtype is not None:
            x = x.astype(jnp.float32)
        x = apply_activation(act, x)
        x = nn.Conv(
            3, (1, 1), padding="VALID",
            kernel_init=kaiming_normal_init(),
            bias_init=torch_linear_bias_init(self.dims[-1]),
            name="output_conv_2",
        )(x)
        return x
