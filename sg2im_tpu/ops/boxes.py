"""Bounding-box coordinate transforms (reference ``sg2im/box_utils.py``)."""

from __future__ import annotations

import jax.numpy as jnp


def apply_box_transform(anchors, transforms):
    """Apply [tx, ty, tw, th] transforms to [xc, yc, w, h] anchors.

    Reference ``sg2im/box_utils.py:24-52``.
    """
    xa, ya, wa, ha = jnp.moveaxis(anchors, -1, 0)
    tx, ty, tw, th = jnp.moveaxis(transforms, -1, 0)
    return jnp.stack(
        [xa + tx * wa, ya + ty * ha, wa * jnp.exp(tw), ha * jnp.exp(th)],
        axis=-1,
    )


def invert_box_transform(anchors, boxes):
    """Transform that maps anchors onto boxes ([xc, yc, w, h] format).

    Reference ``sg2im/box_utils.py:55-80``.
    """
    xa, ya, wa, ha = jnp.moveaxis(anchors, -1, 0)
    x, y, w, h = jnp.moveaxis(boxes, -1, 0)
    return jnp.stack(
        [(x - xa) / wa, (y - ya) / ha, jnp.log(w) - jnp.log(wa),
         jnp.log(h) - jnp.log(ha)],
        axis=-1,
    )


def centers_to_extents(boxes):
    """[xc, yc, w, h] -> [x0, y0, x1, y1].  Reference ``box_utils.py:83-102``."""
    xc, yc, w, h = jnp.moveaxis(boxes, -1, 0)
    x0 = xc - w / 2
    y0 = yc - h / 2
    return jnp.stack([x0, y0, x0 + w, y0 + h], axis=-1)


def extents_to_centers(boxes):
    """[x0, y0, x1, y1] -> [xc, yc, w, h].  Reference ``box_utils.py:105-124``."""
    x0, y0, x1, y1 = jnp.moveaxis(boxes, -1, 0)
    return jnp.stack(
        [0.5 * (x0 + x1), 0.5 * (y0 + y1), x1 - x0, y1 - y0], axis=-1
    )
