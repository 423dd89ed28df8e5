"""The sg2im generator: scene graph -> image.

Reference: ``Sg2ImModel`` (``sg2im/model.py:29-232``).  TPU redesign operates
on padded per-image graph batches (static shapes for XLA):

  objs (N, O) int32       — object category ids, padded slots = 0
  triples (N, T, 3) int32 — [s, p, o] with s/o *within-image* slot indices
  obj_mask (N, O)         — 1 for real objects
  triple_mask (N, T)      — 1 for real triples

versus the reference's ragged flat tensors + ``obj_to_img``
(``model.py:108-129``).  Equivalence of the two batchings is covered by
tests (the reference's triples never cross images).

Forward structure mirrors ``model.py:108-171``: embeddings -> GCN ->
box/mask/rel heads -> layout compose (Pallas/XLA separable kernels) ->
layout noise concat -> CRN.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from sg2im_tpu.nn.crn import RefinementNetwork
from sg2im_tpu.nn.graph import GraphTripleConv, GraphTripleConvNet
from sg2im_tpu.nn.layers import (
    MLP,
    BatchNorm,
    torch_linear_bias_init,
    torch_linear_kernel_init,
    upsample_nearest,
)
from sg2im_tpu.ops.layout import boxes_to_layout, masks_to_layout


class MaskNet(nn.Module):
    """Mask head: 1x1 -> MxM upsample/BN/conv/ReLU pyramid + 1x1 conv.

    Reference ``Sg2ImModel._build_mask_net`` (``sg2im/model.py:94-106``).
    Layer names track the torch Sequential indices: per doubling step k,
    Upsample=4k, BatchNorm=4k+1, Conv3x3=4k+2, ReLU=4k+3; final Conv1x1 at
    4*num_steps.
    """

    dim: int
    mask_size: int

    @nn.compact
    def __call__(self, x, train: bool = False, sample_mask=None):
        # x: (B, 1, 1, dim) NHWC; sample_mask (B,) keeps padded object slots
        # out of train-mode BN statistics (ragged-batch parity).
        cur, idx = 1, 0
        while cur < self.mask_size:
            x = upsample_nearest(x, 2)
            x = BatchNorm(self.dim, name=f"layer{idx + 1}")(
                x, train=train, mask=sample_mask)
            x = nn.Conv(
                self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                kernel_init=torch_linear_kernel_init(),
                bias_init=torch_linear_bias_init(self.dim * 9),
                name=f"layer{idx + 2}",
            )(x)
            x = jax.nn.relu(x)
            cur *= 2
            idx += 4
        if cur != self.mask_size:
            raise ValueError("Mask size must be a power of 2")
        x = nn.Conv(
            1, (1, 1), padding="VALID",
            kernel_init=torch_linear_kernel_init(),
            bias_init=torch_linear_bias_init(self.dim),
            name=f"layer{idx}",
        )(x)
        return x


class Sg2ImGenerator(nn.Module):
    """Generator composite (reference ``Sg2ImModel``, ``sg2im/model.py``).

    Constructor args mirror ``model.py:30-36``; ``vocab`` must provide
    ``object_idx_to_name`` and ``pred_idx_to_name`` lists.
    """

    vocab: Any
    image_size: tuple[int, int] = (64, 64)
    embedding_dim: int = 64
    gconv_dim: int = 128
    gconv_hidden_dim: int = 512
    gconv_pooling: str = "avg"
    gconv_num_layers: int = 5
    refinement_dims: tuple[int, ...] = (1024, 512, 256, 128, 64)
    normalization: str = "batch"
    activation: str = "leakyrelu-0.2"
    mask_size: int | None = None
    mlp_normalization: str = "none"
    layout_noise_dim: int = 0
    compute_dtype: object = None  # bf16 CRN convs when set (perf mode);
    #   also narrows the layout-compose warp intermediate to bf16 (the
    #   536 MB/b128 tensor the roofline flagged) — the layout feeds the
    #   bf16 CRN either way, and measured PSNR is unchanged (bench.py).
    crn_mode: str = "legacy"  # RefinementNetwork.conv0_mode: 'legacy',
    #   'phase', 'split' (per-branch conv0, per-stage concat never
    #   materialized — the serving default), 'split_noise' (split + the
    #   full-res noise concat also eliminated; measured SLOWER on v5e,
    #   kept opt-in — see the noise block below), or 'packed' (exact
    #   space-to-depth reformulation of the high-res CRN stages;
    #   see nn/crn.py)
    dense_precision: object = None  # None -> HIGHEST (parity default).
    #   Serving may pass 'high' (3-pass bf16 ~f32-accurate) to halve the
    #   GCN/head Dense time — measured PSNR-safe, never the default
    #   (CLAUDE.md hard rule protects checkpoint parity).
    crn_quant: str | None = None  # 'int8': turbo serving tier — the
    #   high-res CRN stage convs run int8-resident on the int8 MXU path
    #   (calibrated symmetric quantization, int32 accumulation; nn/crn.py
    #   _conv_int8).  A measured accuracy trade for throughput
    #   (fidelity recorded per round in BENCH_*.json) — never a default;
    #   parameters and checkpoints are unaffected (weights quantize
    #   in-program from the stored f32 kernels).
    crn_quant_head: bool = True   # quantize the CRN output head's 3x3
    #   (False = standard exempt-the-last-layer int8 practice; frontier
    #   sweep: scripts/profile_turbo_frontier.py)
    crn_quant_min_res: int = 32   # quantize stages whose layout level is
    crn_quant_max_res: int = 1 << 30  # ... within [min_res, max_res]

    @nn.compact
    def __call__(self, objs, triples, obj_mask=None, triple_mask=None,
                 boxes_gt=None, masks_gt=None, train: bool = False,
                 layout_noise=None):
        """
        Args:
          objs: (N, O) int object category ids.
          triples: (N, T, 3) int [s, p, o]; s/o index object slots.
          obj_mask: (N, O) or None (all real).
          triple_mask: (N, T) or None (all real).
          boxes_gt: (N, O, 4) — use GT geometry for the layout (training
            always passes these, reference ``scripts/train.py:525-528``).
          masks_gt: (N, O, M, M).
          layout_noise: optional pre-sampled (N, H, W, layout_noise_dim)
            noise; if None and layout_noise_dim > 0, drawn from the 'noise'
            RNG stream (reference samples in forward, ``model.py:164-169``).

        Returns:
          (imgs (N, H, W, 3), boxes_pred (N, O, 4),
           masks_pred (N, O, M, M) | None, rel_scores (N, T, num_preds)).
        """
        num_objs = len(self.vocab["object_idx_to_name"])
        num_preds = len(self.vocab["pred_idx_to_name"])

        s = triples[..., 0]
        p = triples[..., 1]
        o = triples[..., 2]

        obj_vecs = nn.Embed(
            num_objs + 1, self.embedding_dim,
            embedding_init=nn.initializers.normal(1.0),
            name="obj_embeddings",
        )(objs)
        obj_vecs_orig = obj_vecs
        pred_vecs = nn.Embed(
            num_preds, self.embedding_dim,
            embedding_init=nn.initializers.normal(1.0),
            name="pred_embeddings",
        )(p)

        edges = jnp.stack([s, o], axis=-1)

        if self.gconv_num_layers == 0:
            obj_vecs = nn.Dense(
                self.gconv_dim,
                kernel_init=torch_linear_kernel_init(),
                bias_init=torch_linear_bias_init(self.embedding_dim),
                precision=self.dense_precision
                or jax.lax.Precision.HIGHEST,
                name="gconv",
            )(obj_vecs)
        else:
            obj_vecs, pred_vecs = GraphTripleConv(
                input_dim=self.embedding_dim,
                output_dim=self.gconv_dim,
                hidden_dim=self.gconv_hidden_dim,
                pooling=self.gconv_pooling,
                mlp_normalization=self.mlp_normalization,
                mlp_precision=self.dense_precision,
                name="gconv",
            )(obj_vecs, pred_vecs, edges, triple_mask, train=train,
              obj_mask=obj_mask)
        if self.gconv_num_layers > 1:
            obj_vecs, pred_vecs = GraphTripleConvNet(
                input_dim=self.gconv_dim,
                hidden_dim=self.gconv_hidden_dim,
                pooling=self.gconv_pooling,
                num_layers=self.gconv_num_layers - 1,
                mlp_normalization=self.mlp_normalization,
                mlp_precision=self.dense_precision,
                name="gconv_net",
            )(obj_vecs, pred_vecs, edges, triple_mask, train=train,
              obj_mask=obj_mask)

        boxes_pred = MLP(
            (self.gconv_dim, self.gconv_hidden_dim, 4),
            batch_norm=self.mlp_normalization,
            precision=self.dense_precision, name="box_net"
        )(obj_vecs, train=train, mask=obj_mask)

        masks_pred = None
        if self.mask_size is not None and self.mask_size > 0:
            N, O = objs.shape
            mask_in = obj_vecs.reshape(N * O, 1, 1, self.gconv_dim)
            flat_mask = (None if obj_mask is None
                         else obj_mask.reshape(N * O))
            mask_scores = MaskNet(
                self.gconv_dim, self.mask_size, name="mask_net"
            )(mask_in, train=train, sample_mask=flat_mask)
            masks_pred = jax.nn.sigmoid(
                mask_scores.reshape(N, O, self.mask_size, self.mask_size)
            )

        s_boxes = jnp.take_along_axis(boxes_pred, s[..., None], axis=-2)
        o_boxes = jnp.take_along_axis(boxes_pred, o[..., None], axis=-2)
        s_vecs = jnp.take_along_axis(obj_vecs_orig, s[..., None], axis=-2)
        o_vecs = jnp.take_along_axis(obj_vecs_orig, o[..., None], axis=-2)
        rel_aux_in = jnp.concatenate([s_boxes, o_boxes, s_vecs, o_vecs],
                                     axis=-1)
        rel_scores = MLP(
            (2 * self.embedding_dim + 8, self.gconv_hidden_dim, num_preds),
            batch_norm=self.mlp_normalization,
            precision=self.dense_precision, name="rel_aux_net",
        )(rel_aux_in, train=train, mask=triple_mask)

        H, W = self.image_size
        layout_boxes = boxes_pred if boxes_gt is None else boxes_gt
        if masks_pred is None:
            layout = boxes_to_layout(obj_vecs, layout_boxes, obj_mask, H, W,
                                     compute_dtype=self.compute_dtype)
        else:
            layout_masks = masks_pred if masks_gt is None else masks_gt
            layout = masks_to_layout(obj_vecs, layout_boxes, layout_masks,
                                     obj_mask, H, W,
                                     compute_dtype=self.compute_dtype)

        if self.compute_dtype is not None:
            # Narrow the layout BEFORE the noise concat: the cast fuses
            # into the compose epilogue, so the (N, H, W, D+noise)
            # full-res tensor — the CRN's biggest input — is stored
            # half-width and never round-trips HBM as f32 (the CRN
            # consumes compute_dtype everywhere anyway; its pyramid
            # pooling then also runs half-width).
            layout = layout.astype(self.compute_dtype)
        noise_sep = None
        if self.layout_noise_dim > 0:
            N = layout.shape[0]
            if layout_noise is None:
                layout_noise = jax.random.normal(
                    self.make_rng("noise"),
                    (N, H, W, self.layout_noise_dim),
                    dtype=layout.dtype,
                )
            if self.crn_mode == "split_noise":
                # split_noise distributes conv0 over the channel concat
                # AND gives the noise its own pyramid + kernel slice, so
                # the (N, H, W, D+noise) full-res concat — the generator's
                # biggest tensor — is never materialized.  Exact up to sum
                # reassociation (split's exactness class).  Measured on
                # v5e vg128/b128: LOSES ~16% vs 'split' (each extra conv
                # branch's accumulation round-trips the stage output
                # through HBM, outweighing the concat savings) — kept as
                # an opt-in mode for shapes where noise_dim is large.
                noise_sep = layout_noise.astype(layout.dtype)
            else:
                layout = jnp.concatenate(
                    [layout, layout_noise.astype(layout.dtype)], axis=-1)

        imgs = RefinementNetwork(
            dims=(self.gconv_dim + self.layout_noise_dim,)
            + tuple(self.refinement_dims),
            normalization=self.normalization,
            activation=self.activation,
            compute_dtype=self.compute_dtype,
            conv0_mode=("split" if self.crn_mode == "split_noise"
                        else self.crn_mode),
            quant=self.crn_quant,
            quant_head=self.crn_quant_head,
            quant_min_res=self.crn_quant_min_res,
            quant_max_res=self.crn_quant_max_res,
            name="refinement_net",
        )(layout, train=train, noise=noise_sep)
        return imgs, boxes_pred, masks_pred, rel_scores
