"""Fused Pallas layout-compose kernel. **EXPERIMENTAL — not a production
path.** Measured on real v5e: standalone the kernel beats XLA ~12%, but
inside the full generator the ``pallas_call`` fusion boundary makes the
end-to-end model ~13% slower, so ``'auto'`` always resolves to the XLA
path and this kernel runs only when explicitly forced
(``SG2IM_TPU_FORCE_PALLAS=1`` or ``backend='pallas'``).  The backward pass
re-runs the jnp compose (rematerialized VJP below) — training through the
forced kernel still takes XLA gradients.  Kept as a measured reference
point and a starting kernel for shapes where the (N, O, H, W) warp
intermediate stops fitting HBM (see ARCHITECTURE.md §7 for the full
retirement record).

Computes, in one VMEM-resident pass per (image, row-tile):

    tmp[o]  = Wy[o] @ mask[o]          (TH, M)   MXU
    warp[o] = tmp[o] @ Wx[o]^T         (TH, W)   MXU
    out     = warp^T-compose vecs      (TH, W, D) MXU

replacing the XLA path in ``sg2im_tpu.ops.layout`` which materializes the
(N, O, H, W) warp tensor in HBM between the two stages (~O× the output's
HBM traffic; for a 32×16×128² batch that's two 128 MB round-trips saved).
Numerics are identical to the jnp path (same tent-weight formulation of
torch-0.4 ``F.grid_sample`` align_corners=True/zeros, reference
``sg2im/layout.py:30-91``) — asserted in tests/test_pallas.py.

Differentiation: the op carries a custom VJP whose backward re-derives
gradients through the *jnp* implementation (rematerialization — trades the
saved forward HBM traffic for FLOPs in backward, like ``jax.checkpoint``).
Box gradients flow through the tent-weight construction which stays outside
the kernel in jnp.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on some hosts; interpret mode works
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _pick_tile(H: int) -> int:
    for t in (64, 32, 16, 8):
        if H % t == 0:
            return t
    return H


def _compose_kernel(wy_ref, wx_ref, m_ref, v_ref, out_ref):
    wy = wy_ref[0]      # (O, TH, M)
    wx = wx_ref[0]      # (O, W, M)
    mask = m_ref[0]     # (O, M, M)
    vecs = v_ref[0]     # (O, D)
    O, TH, M = wy.shape
    W = wx.shape[1]
    tmp = jax.lax.dot_general(
        wy, mask, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)            # (O, TH, M)
    warp = jax.lax.dot_general(
        tmp, wx, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)            # (O, TH, W)
    flat = warp.reshape(O, TH * W)
    out = jax.lax.dot_general(
        flat, vecs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)            # (TH*W, D)
    out_ref[0] = out.reshape(TH, W, vecs.shape[-1]).astype(
        out_ref.dtype)


def _pallas_compose(wy, wx, masks, vecs, interpret: bool):
    N, O, H, M = wy.shape
    W = wx.shape[2]
    D = vecs.shape[-1]
    TH = _pick_tile(H)
    grid = (N, H // TH)
    kwargs = {}
    if pltpu is not None and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    return pl.pallas_call(
        _compose_kernel,
        # Input dtype out, matching the XLA path (a hard-coded f32 would
        # silently diverge across backends for bf16 inputs and break the
        # custom VJP's cotangent dtype).
        out_shape=jax.ShapeDtypeStruct((N, H, W, D), vecs.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, O, TH, M), lambda n, h: (n, 0, h, 0)),
            pl.BlockSpec((1, O, W, M), lambda n, h: (n, 0, 0, 0)),
            pl.BlockSpec((1, O, M, M), lambda n, h: (n, 0, 0, 0)),
            pl.BlockSpec((1, O, D), lambda n, h: (n, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TH, W, D), lambda n, h: (n, h, 0, 0)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * O * (H * M * M + H * W * M + H * W * D),
            bytes_accessed=4 * N * (O * (H * M + W * M + M * M + D)
                                    + H * W * D),
            transcendentals=0,
        ),
        **kwargs,
    )(wy, wx, masks, vecs)


def _jnp_compose(wy, wx, masks, vecs):
    """Reference jnp path (identical math; used for VJP + fallback)."""
    from sg2im_tpu.ops.sampling import separable_sample

    warp = separable_sample(masks, wy, wx)  # (N, O, H, W)
    N, O, H, W = warp.shape
    return jnp.einsum("noP,nod->nPd", warp.reshape(N, O, H * W), vecs,
                      precision="highest").reshape(N, H, W, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_layout_compose(wy, wx, masks, vecs, interpret=False):
    """out[n, y, x, d] = sum_o (Wy[n,o] @ masks[n,o] @ Wx[n,o]^T)[y, x]
    * vecs[n, o, d] — fused on TPU via Pallas.

    Args:
      wy: (N, O, H, M) row tent weights; wx: (N, O, W, M) column weights;
      masks: (N, O, M, M); vecs: (N, O, D) (pre-multiplied by obj validity).

    Returns:
      (N, H, W, D) layout.
    """
    return _pallas_compose(wy, wx, masks, vecs, interpret)


def _fwd(wy, wx, masks, vecs, interpret=False):
    return fused_layout_compose(wy, wx, masks, vecs, interpret), \
        (wy, wx, masks, vecs)


def _bwd(interpret, res, g):
    wy, wx, masks, vecs = res
    _, vjp = jax.vjp(_jnp_compose, wy, wx, masks, vecs)
    return vjp(g)


fused_layout_compose.defvjp(_fwd, _bwd)


def pallas_available(H: int | None = None, W: int | None = None) -> bool:
    """True when the compiled Pallas TPU path should be used under 'auto'.

    Two gates, both measured on real v5e hardware:

    1. Mosaic cannot lower the kernel's (O, TH, W) -> (O, TH*W) collapse
       unless the minor dim is lane-aligned ("unsupported shape cast" for
       W=64), so the fused path requires W % 128 == 0.
    2. Standalone the kernel beats the XLA path (~1.34 vs ~1.52 ms at
       32x16x128²) — but inside the full generator the pallas_call is an
       opaque fusion boundary and the end-to-end model is ~13% slower
       (18.7 vs 16.5 ms/batch).  XLA fuses the compose into its neighbors;
       the kernel can't.  'auto' therefore resolves to the XLA path; set
       SG2IM_TPU_FORCE_PALLAS=1 (or backend='pallas') to opt in, e.g. for
       future shapes where the warp intermediate no longer fits HBM
       comfortably.
    """
    if not os.environ.get("SG2IM_TPU_FORCE_PALLAS"):
        return False
    if os.environ.get("SG2IM_TPU_DISABLE_PALLAS"):
        return False
    if W is not None and W % 128 != 0:
        return False
    if H is not None and H % 8 != 0:
        return False
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# v2: tent weights computed in-kernel from raw boxes (less HBM traffic, one
# fewer fusion boundary on the input side).
# ---------------------------------------------------------------------------

def _make_v2_kernel(H: int, W: int, TH: int, M: int):
    def kernel(boxes_ref, m_ref, v_ref, out_ref):
        h_idx = pl.program_id(1)
        boxes = boxes_ref[0]    # (O, 4)
        mask = m_ref[0]         # (O, M, M)
        vecs = v_ref[0]         # (O, D)
        O = mask.shape[0]

        def tent(lo, hi, out_size, global_off, n_rows):
            # rows: output coords t in [0,1]; per-object source coords
            # s = (t - lo)/(hi - lo) * (M-1); weights max(0, 1-|s-j|).
            # Mosaic only lowers rank-2 iota: build (O*rows, M) then split.
            row_ids = jax.lax.broadcasted_iota(
                jnp.int32, (1, n_rows), 1).astype(jnp.float32)
            t = (global_off + row_ids) / (out_size - 1)
            s = (t - lo[:, None]) / (hi - lo)[:, None] * (M - 1)  # (O, rows)
            s_flat = s.reshape(O * n_rows, 1)
            j = jax.lax.broadcasted_iota(
                jnp.int32, (O * n_rows, M), 1).astype(jnp.float32)
            w = 1.0 - jnp.abs(s_flat - j)
            w = jnp.maximum(w, 0.0)
            w = jnp.where(jnp.isfinite(w), w, 0.0)
            return w.reshape(O, n_rows, M)

        wy = tent(boxes[:, 1], boxes[:, 3], H, h_idx * TH, TH)
        wx = tent(boxes[:, 0], boxes[:, 2], W, 0, W)

        tmp = jax.lax.dot_general(
            wy, mask, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        warp = jax.lax.dot_general(
            tmp, wx, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        flat = warp.reshape(O, TH * W)
        out = jax.lax.dot_general(
            flat, vecs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        out_ref[0] = out.reshape(TH, W, vecs.shape[-1]).astype(
        out_ref.dtype)

    return kernel


def _pallas_compose_v2(boxes, masks, vecs, H, W, interpret: bool):
    N, O = boxes.shape[:2]
    M = masks.shape[-1]
    D = vecs.shape[-1]
    TH = _pick_tile(H)
    kwargs = {}
    if pltpu is not None and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    return pl.pallas_call(
        _make_v2_kernel(H, W, TH, M),
        out_shape=jax.ShapeDtypeStruct((N, H, W, D), vecs.dtype),
        grid=(N, H // TH),
        in_specs=[
            pl.BlockSpec((1, O, 4), lambda n, h: (n, 0, 0)),
            pl.BlockSpec((1, O, M, M), lambda n, h: (n, 0, 0, 0)),
            pl.BlockSpec((1, O, D), lambda n, h: (n, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TH, W, D), lambda n, h: (n, h, 0, 0)),
        interpret=interpret,
        **kwargs,
    )(boxes, masks, vecs)


def _jnp_compose_from_boxes(boxes, masks, vecs, H, W):
    from sg2im_tpu.ops.layout import box_warp_weights

    M = masks.shape[-1]
    wy, wx = box_warp_weights(boxes, H, W, M, M)
    return _jnp_compose(wy, wx, masks, vecs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_layout_compose_v2(boxes, masks, vecs, H, W, interpret=False):
    """Like fused_layout_compose but takes raw boxes; tent weights are
    generated on-chip from iota (no (N,O,H+W,M) weight tensors in HBM).

    STATUS: interpret-verified (numerics + gradients match the XLA path in
    tests), but the Mosaic compiler in this environment rejects the
    sub-lane-shaped (O, 4) boxes block / weight-construction reshapes
    (tpu_compile_helper crash) — compiled use is gated off until a newer
    Mosaic lands; `masks_to_layout(backend='pallas-v2')` is experimental.
    The v1 kernel above is the one that compiles, but it too is
    experimental/opt-in (see module docstring) — XLA is the production
    path for both."""
    return _pallas_compose_v2(boxes, masks, vecs, H, W, interpret)


def _v2_fwd(boxes, masks, vecs, H, W, interpret=False):
    return fused_layout_compose_v2(boxes, masks, vecs, H, W, interpret), \
        (boxes, masks, vecs)


def _v2_bwd(H, W, interpret, res, g):
    boxes, masks, vecs = res
    _, vjp = jax.vjp(
        lambda b, m, v: _jnp_compose_from_boxes(b, m, v, H, W),
        boxes, masks, vecs)
    return vjp(g)


fused_layout_compose_v2.defvjp(_v2_fwd, _v2_bwd)
