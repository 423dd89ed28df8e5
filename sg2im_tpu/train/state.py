"""Train state: all learnable state for the GAN triple (G, D_obj, D_img).

One pytree so the whole alternating-GAN update is a single jitted XLA
program (vs the reference's three separate torch optimizers + Python loop,
``scripts/train.py:426-444,557-592``).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray               # scalar int32, reference counter ``t``
    rng: jax.Array                  # PRNG key for layout noise
    g_vars: Any                     # {'params': ..., 'batch_stats': ...}
    g_opt: Any
    d_obj_vars: Any = None
    d_obj_opt: Any = None
    d_img_vars: Any = None
    d_img_opt: Any = None


def tree_where(pred, a, b):
    """Elementwise select whole pytrees by a scalar predicate (NaN guard)."""
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)
