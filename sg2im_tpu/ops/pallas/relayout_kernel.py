"""Pallas space-to-depth / depth-to-space relayout kernels (VERDICT r3 #2).

The packed CRN mode (``nn/crn.py``: each high-res stage runs at half
resolution with 4x channels; exact, same parameters) wins standalone on
the stage convs (measured 1.48x on the worst conv) but loses end-to-end
because XLA lowers the domain changes — space_to_depth of each layout
level, depth_to_space at stage boundaries — to strided HBM copies at only
~140-200 GB/s (ARCHITECTURE §7 retirement record; the packed pipeline
moves ~4.6 GB/batch of pure reindexing).

These kernels do the same relayout as a single VMEM-resident pass per
(image, row-tile): each byte is read once and written once, and the phase
interleave is an in-register reshape/transpose instead of a strided HBM
access pattern.  The bar (NEXT_STEPS r3 #4) is >3x XLA's strided copies;
``scripts/profile_relayout.py`` measures both and records the verdict.

Layout contract (must match ``nn/crn.py``): phase-major channel order,
``packed[n, i, j, (2a+b)*C + c] = fine[n, 2i+a, 2j+b, c]``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on some hosts; interpret works
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _pick_tile(R: int, target: int = 32) -> int:
    for t in (target, 16, 8, 4, 2):
        if R % t == 0:
            return t
    return R


def _s2d_kernel(x_ref, o_ref):
    x = x_ref[0]                         # (2*TR, 2*Rw, C)
    TR2, Rw2, C = x.shape
    TR, Rw = TR2 // 2, Rw2 // 2
    # (i, a, j, b, c) -> (i, j, a, b, c): the phase pair becomes the
    # leading 4x block of the channel dim (phase-major contract).
    y = x.reshape(TR, 2, Rw, 2, C).transpose(0, 2, 1, 3, 4)
    o_ref[0] = y.reshape(TR, Rw, 4 * C)


def _d2s_kernel(x_ref, o_ref):
    x = x_ref[0]                         # (TR, Rw, 4*C)
    TR, Rw, C4 = x.shape
    C = C4 // 4
    y = x.reshape(TR, Rw, 2, 2, C).transpose(0, 2, 1, 3, 4)
    o_ref[0] = y.reshape(2 * TR, 2 * Rw, C)


def _call(kernel, x, out_shape, in_block, out_block, grid, interpret):
    kwargs = {}
    if pltpu is not None and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[pl.BlockSpec(in_block, lambda n, r: (n, r, 0, 0))],
        out_specs=pl.BlockSpec(out_block, lambda n, r: (n, r, 0, 0)),
        interpret=interpret,
        **kwargs,
    )(x)


def space_to_depth_pallas(x, interpret: bool | None = None):
    """(N, 2R, 2Rw, C) -> (N, R, Rw, 4C), phase-major (== crn.space_to_depth)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    R, Rw = H // 2, W // 2
    TR = _pick_tile(R)
    return _call(
        _s2d_kernel, x,
        jax.ShapeDtypeStruct((N, R, Rw, 4 * C), x.dtype),
        (1, 2 * TR, W, C), (1, TR, Rw, 4 * C), (N, R // TR), interpret)


def depth_to_space_pallas(x, interpret: bool | None = None):
    """(N, R, Rw, 4C) -> (N, 2R, 2Rw, C) (== crn.depth_to_space)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, R, Rw, C4 = x.shape
    assert C4 % 4 == 0, C4
    C = C4 // 4
    TR = _pick_tile(R)
    return _call(
        _d2s_kernel, x,
        jax.ShapeDtypeStruct((N, 2 * R, 2 * Rw, C), x.dtype),
        (1, TR, Rw, C4), (1, 2 * TR, 2 * Rw, C), (N, R // TR), interpret)
