"""Bilinear sampling primitives, TPU-first.

The reference implements bilinear sampling three ways: cuDNN
``F.grid_sample`` (reference ``sg2im/layout.py:53``, ``sg2im/bilinear.py:132``),
a handwritten gather-based ``bilinear_sample`` (``sg2im/bilinear.py:191-246``),
and ``tensor_linspace`` grid construction (``sg2im/bilinear.py:249-278``).

On TPU, gathers are slow and matmuls are fast.  Every sampling grid used by
this model family is *separable*: the x source coordinate depends only on the
output column and the y source coordinate only on the output row (box-warped
linspaces).  Bilinear interpolation with such a grid factors exactly into two
small dense matmuls with "tent" weight matrices:

    out[y, x] = sum_ij  Wy[y, i] * img[i, j] * Wx[x, j]

where ``W[p, i] = max(0, 1 - |src(p) - i|)``.  The tent formulation also
reproduces torch-0.4 ``F.grid_sample`` semantics exactly — align_corners=True
coordinate mapping with zeros padding: any tap outside the source image
contributes 0, and weights of in-bounds taps are unchanged.  (torch 0.4 had no
``align_corners`` argument; its behavior was what is now align_corners=True.)

A general (non-separable) gather-based ``grid_sample`` is also provided for
API parity and for ops whose grids a caller may construct arbitrarily.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tent_weights(src, size: int):
    """Dense 1-D bilinear ("tent") weight matrix.

    Args:
      src: (...,) float source coordinates in *pixel* space of the source
        axis (0 .. size-1 maps onto the source texels).
      size: number of source texels along this axis.

    Returns:
      (..., size) weights. ``w[..., i] = max(0, 1 - |src - i|)``, with
      non-finite sources (degenerate zero-width boxes divide by zero upstream,
      reference ``sg2im/layout.py:117-118``) mapped to all-zero rows — which
      matches the implicit zeroing the reference relies on
      (``sg2im/layout.py:50-59``).
    """
    idx = jnp.arange(size, dtype=src.dtype)
    w = 1.0 - jnp.abs(src[..., None] - idx)
    w = jnp.maximum(w, 0.0)
    return jnp.where(jnp.isfinite(w), w, 0.0)


def normalized_to_pixel(coord, size: int):
    """Map align_corners=True normalized coords [-1, 1] -> pixel [0, size-1]."""
    return (coord + 1.0) * 0.5 * (size - 1)


def tensor_linspace(start, end, steps: int):
    """Vectorized linspace between per-element start/end tensors.

    Mirrors reference ``sg2im/bilinear.py:249-278``: returns shape
    ``start.shape + (steps,)`` with endpoints included.
    """
    start = jnp.asarray(start)
    end = jnp.asarray(end)
    w_end = jnp.linspace(0.0, 1.0, steps, dtype=start.dtype)
    w_start = jnp.linspace(1.0, 0.0, steps, dtype=start.dtype)
    return start[..., None] * w_start + end[..., None] * w_end


def grid_sample(img, grid):
    """General bilinear grid sample, align_corners=True + zeros padding.

    Semantics match torch-0.4 ``F.grid_sample`` (reference relies on these at
    ``sg2im/layout.py:53`` and ``sg2im/bilinear.py:132``): grid values in
    [-1, 1] address texel centers of ``img``; out-of-bounds taps contribute 0.

    Args:
      img: (N, H, W, C) source images (NHWC — TPU-native layout).
      grid: (N, Hg, Wg, 2) sampling grid; ``grid[..., 0]`` is x (width
        coordinate), ``grid[..., 1]`` is y, both in [-1, 1].

    Returns:
      (N, Hg, Wg, C) sampled output.
    """
    N, H, W, C = img.shape
    gx = normalized_to_pixel(grid[..., 0], W)
    gy = normalized_to_pixel(grid[..., 1], H)
    # Guard non-finite coordinates (degenerate boxes) -> sample far outside.
    gx = jnp.where(jnp.isfinite(gx), gx, -2.0)
    gy = jnp.where(jnp.isfinite(gy), gy, -2.0)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = gx - x0  # weight of x1 tap
    wy1 = gy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def tap(yc, xc, wy, wx):
        inb = (xc >= 0) & (xc <= W - 1) & (yc >= 0) & (yc <= H - 1)
        xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        flat = img.reshape(N, H * W, C)
        idx = yi * W + xi  # (N, Hg, Wg)
        vals = jnp.take_along_axis(
            flat, idx.reshape(N, -1, 1), axis=1
        ).reshape(idx.shape + (C,))
        w = jnp.where(inb, wy * wx, 0.0)
        return vals * w[..., None]

    out = (
        tap(y0, x0, wy0, wx0)
        + tap(y0, x1, wy0, wx1)
        + tap(y1, x0, wy1, wx0)
        + tap(y1, x1, wy1, wx1)
    )
    return out


def bilinear_sample_border(img, X, Y):
    """Gather-based bilinear sampling with *border clamp* semantics.

    API-parity port of the reference's handwritten sampler
    (``sg2im/bilinear.py:191-246``), which clamps corner indices to the image
    instead of zeroing out-of-bounds taps; used by the 'jj' crop backend and
    by ``uncrop_bbox``.

    Args:
      img: (N, H, W, C).
      X, Y: (N, HH, WW) coordinates in [0, 1] image space.

    Returns:
      (N, HH, WW, C).
    """
    N, H, W, C = img.shape
    # Reference multiplies by size (not size-1): sg2im/bilinear.py:209-210.
    gx = X * W
    gy = Y * H
    x0 = jnp.clip(jnp.floor(gx), 0, W - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y0 = jnp.clip(jnp.floor(gy), 0, H - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)

    flat = img.reshape(N, H * W, C)

    def gather(yi, xi):
        idx = (yi * W + xi).astype(jnp.int32)
        return jnp.take_along_axis(
            flat, idx.reshape(N, -1, 1), axis=1
        ).reshape(idx.shape + (C,))

    v1 = gather(y0, x0)
    v2 = gather(y1, x0)
    v3 = gather(y0, x1)
    v4 = gather(y1, x1)
    w1 = ((x1 - gx) * (y1 - gy))[..., None]
    w2 = ((x1 - gx) * (gy - y0))[..., None]
    w3 = ((gx - x0) * (y1 - gy))[..., None]
    w4 = ((gx - x0) * (gy - y0))[..., None]
    return w1 * v1 + w2 * v2 + w3 * v3 + w4 * v4


def separable_sample(img, wy, wx):
    """Apply separable tent-weight sampling: two MXU matmuls.

    Args:
      img: (..., H, W) source.
      wy: (..., HH, H) row weights.
      wx: (..., WW, W) column weights.

    Returns:
      (..., HH, WW) = wy @ img @ wx^T.
    """
    t = jnp.einsum("...yh,...hw->...yw", wy, img, precision="highest")
    return jnp.einsum("...yw,...xw->...yx", t, wx, precision="highest")
