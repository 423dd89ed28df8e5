"""Scene-graph convolution over padded per-image graphs.

Reference: ``sg2im/graph.py``.  The reference operates on a flat ragged batch
(all images' objects concatenated) and pools triple messages back to objects
with ``scatter_add`` (``graph.py:92-114``).  TPU redesign:

- Graphs are padded to static (O, T) per image and batched: gathers become
  ``take_along_axis`` over the object axis; the scatter-add becomes a batched
  **one-hot matmul** ``(O, 2T) @ (2T, H)`` that runs on the MXU.  Because
  reference triples never cross images (indices are per-image offsets in the
  ragged layout), per-image pooling is numerically identical to the flat
  scatter — proven in tests/test_graph.py.
- Padded triples carry ``triple_mask=0`` and contribute neither messages nor
  appearance counts (matching the reference's count-then-clamp avg,
  ``graph.py:101-114``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sg2im_tpu.nn.layers import MLP


def pool_messages(s_idx, o_idx, s_msgs, o_msgs, triple_mask, num_objs: int,
                  pooling: str = "avg"):
    """Pool per-triple messages back onto object slots — MXU one-hot matmul.

    Args:
      s_idx, o_idx: (..., T) int subject/object slot indices within image.
      s_msgs, o_msgs: (..., T, H) candidate vectors.
      triple_mask: (..., T) validity (1 real, 0 padding) or None.
      num_objs: O, number of object slots.
      pooling: 'sum' or 'avg' (appearance-count average with clamp-min-1,
        reference ``sg2im/graph.py:101-114``).

    Returns:
      (..., O, H) pooled object vectors.
    """
    dtype = s_msgs.dtype
    oh_s = jax.nn.one_hot(s_idx, num_objs, dtype=dtype)  # (..., T, O)
    oh_o = jax.nn.one_hot(o_idx, num_objs, dtype=dtype)
    if triple_mask is not None:
        m = triple_mask.astype(dtype)[..., None]
        oh_s = oh_s * m
        oh_o = oh_o * m
    pooled = jnp.einsum("...to,...th->...oh", oh_s, s_msgs,
                        precision="highest")
    pooled = pooled + jnp.einsum("...to,...th->...oh", oh_o, o_msgs,
                                 precision="highest")
    if pooling == "avg":
        counts = oh_s.sum(-2) + oh_o.sum(-2)  # (..., O)
        pooled = pooled / jnp.maximum(counts, 1.0)[..., None]
    elif pooling != "sum":
        raise ValueError(f'Invalid pooling "{pooling}"')
    return pooled


class GraphTripleConv(nn.Module):
    """One scene-graph convolution layer (reference ``sg2im/graph.py:32-120``).

    net1 maps concatenated [s, p, o] triple vectors (..., T, 3*Din) to
    (..., T, 2H + Dout); the H-dim halves are pooled back to objects and
    passed through net2.  Both MLPs end in an activation
    (``build_mlp`` final_nonlinearity=True default) and use kaiming-normal
    linear init (``graph.py:26-29,50,54``).
    """

    input_dim: int
    output_dim: int | None = None
    hidden_dim: int = 512
    pooling: str = "avg"
    mlp_normalization: str = "none"
    mlp_precision: object = None  # None -> HIGHEST; see MLP.precision

    @nn.compact
    def __call__(self, obj_vecs, pred_vecs, edges, triple_mask=None,
                 train: bool = False, obj_mask=None):
        """
        Args:
          obj_vecs: (..., O, Din); pred_vecs: (..., T, Din);
          edges: (..., T, 2) within-image subject/object slot indices;
          triple_mask: (..., T) or None.
          obj_mask: (..., O) or None — only used to mask net2's BatchNorm
            statistics under mlp_normalization='batch'.

        Returns:
          (new_obj_vecs (..., O, Dout), new_pred_vecs (..., T, Dout)).
        """
        Dout = self.output_dim if self.output_dim is not None else self.input_dim
        H = self.hidden_dim
        O = obj_vecs.shape[-2]

        s_idx = edges[..., 0]
        o_idx = edges[..., 1]
        cur_s = jnp.take_along_axis(obj_vecs, s_idx[..., None], axis=-2)
        cur_o = jnp.take_along_axis(obj_vecs, o_idx[..., None], axis=-2)
        cur_t = jnp.concatenate([cur_s, pred_vecs, cur_o], axis=-1)

        new_t = MLP(
            (3 * self.input_dim, H, 2 * H + Dout),
            batch_norm=self.mlp_normalization,
            kernel_init_name="kaiming_normal",
            precision=self.mlp_precision,
            name="net1",
        )(cur_t, train=train, mask=triple_mask)

        new_s = new_t[..., :H]
        new_p = new_t[..., H:H + Dout]
        new_o = new_t[..., H + Dout:2 * H + Dout]

        pooled = pool_messages(s_idx, o_idx, new_s, new_o, triple_mask, O,
                               self.pooling)
        new_obj = MLP(
            (H, H, Dout),
            batch_norm=self.mlp_normalization,
            kernel_init_name="kaiming_normal",
            precision=self.mlp_precision,
            name="net2",
        )(pooled, train=train, mask=obj_mask)
        return new_obj, new_p


class GraphTripleConvNet(nn.Module):
    """Stack of GraphTripleConv layers (reference ``sg2im/graph.py:123-144``)."""

    input_dim: int
    num_layers: int = 5
    hidden_dim: int = 512
    pooling: str = "avg"
    mlp_normalization: str = "none"
    mlp_precision: object = None  # None -> HIGHEST; see MLP.precision

    @nn.compact
    def __call__(self, obj_vecs, pred_vecs, edges, triple_mask=None,
                 train: bool = False, obj_mask=None):
        for i in range(self.num_layers):
            obj_vecs, pred_vecs = GraphTripleConv(
                input_dim=self.input_dim,
                hidden_dim=self.hidden_dim,
                pooling=self.pooling,
                mlp_normalization=self.mlp_normalization,
                mlp_precision=self.mlp_precision,
                name=f"gconvs_{i}",
            )(obj_vecs, pred_vecs, edges, triple_mask, train=train,
              obj_mask=obj_mask)
        return obj_vecs, pred_vecs
