"""Fused Pallas layout kernel: numerics vs the XLA path (interpret mode on
CPU), gradients through the custom VJP, and generator integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sg2im_tpu.ops.layout import box_warp_weights, masks_to_layout
from sg2im_tpu.ops.pallas.layout_kernel import (
    _jnp_compose,
    fused_layout_compose,
)


def _inputs(N=2, O=4, H=32, W=32, M=8, D=12, seed=0):
    rng = np.random.RandomState(seed)
    lo = rng.uniform(-0.1, 0.6, (N, O, 2)).astype(np.float32)
    sz = rng.uniform(0.1, 0.5, (N, O, 2)).astype(np.float32)
    boxes = np.concatenate([lo, lo + sz], -1)
    masks = (rng.rand(N, O, M, M) > 0.4).astype(np.float32)
    vecs = rng.randn(N, O, D).astype(np.float32)
    obj_mask = (rng.rand(N, O) < 0.8).astype(np.float32)
    obj_mask[:, 0] = 1.0
    return jnp.asarray(vecs), jnp.asarray(boxes), jnp.asarray(masks), \
        jnp.asarray(obj_mask), H, W


def test_fused_kernel_matches_xla():
    vecs, boxes, masks, obj_mask, H, W = _inputs()
    want = masks_to_layout(vecs, boxes, masks, obj_mask, H, W, backend="xla")
    got = masks_to_layout(vecs, boxes, masks, obj_mask, H, W,
                          backend="pallas-interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_kernel_odd_height():
    # H not divisible by the preferred tile exercises _pick_tile fallback.
    vecs, boxes, masks, obj_mask, _, _ = _inputs()
    want = masks_to_layout(vecs, boxes, masks, obj_mask, 24, 40,
                           backend="xla")
    got = masks_to_layout(vecs, boxes, masks, obj_mask, 24, 40,
                          backend="pallas-interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_kernel_gradients():
    vecs, boxes, masks, obj_mask, H, W = _inputs(N=1, O=3, H=16, W=16, M=4,
                                                 D=6)

    def loss_pallas(vecs, boxes, masks):
        out = masks_to_layout(vecs, boxes, masks, obj_mask, H, W,
                              backend="pallas-interpret")
        return (out ** 2).sum()

    def loss_xla(vecs, boxes, masks):
        out = masks_to_layout(vecs, boxes, masks, obj_mask, H, W,
                              backend="xla")
        return (out ** 2).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(vecs, boxes, masks)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(vecs, boxes, masks)
    for a, b, name in zip(gp, gx, ("vecs", "boxes", "masks")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   rtol=1e-4, err_msg=name)


def test_vjp_matches_numerical():
    vecs, boxes, masks, obj_mask, H, W = _inputs(N=1, O=2, H=8, W=8, M=4,
                                                 D=3)
    wy, wx = box_warp_weights(boxes, H, W, 4, 4)

    def f(vecs):
        return fused_layout_compose(wy, wx, masks, vecs, True).sum()

    g = jax.grad(f)(vecs)
    eps = 1e-2
    v0 = np.asarray(vecs)
    i = (0, 1, 2)
    vp = v0.copy()
    vp[i] += eps
    vm = v0.copy()
    vm[i] -= eps
    num = (float(f(jnp.asarray(vp))) - float(f(jnp.asarray(vm)))) / (2 * eps)
    assert abs(float(g[i]) - num) < 1e-2


def test_fused_kernel_unaligned_objects():
    """O not 8-aligned still works (interpret mode)."""
    vecs, boxes, masks, obj_mask, H, W = _inputs(N=1, O=5, M=8, D=16)
    want = masks_to_layout(vecs, boxes, masks, obj_mask, H, W, backend="xla")
    got = masks_to_layout(vecs, boxes, masks, obj_mask, H, W,
                          backend="pallas-interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_v2_kernel_matches_xla():
    from sg2im_tpu.ops.pallas.layout_kernel import fused_layout_compose_v2

    vecs, boxes, masks, obj_mask, H, W = _inputs()
    v = vecs * obj_mask[..., None]
    want = masks_to_layout(vecs, boxes, masks, obj_mask, H, W, backend="xla")
    got = fused_layout_compose_v2(boxes, masks, v, H, W, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_v2_kernel_gradients():
    from sg2im_tpu.ops.pallas.layout_kernel import fused_layout_compose_v2

    vecs, boxes, masks, obj_mask, H, W = _inputs(N=1, O=3, H=16, W=16, M=4,
                                                 D=6)
    v = vecs * obj_mask[..., None]

    def loss_v2(boxes, masks, v):
        return (fused_layout_compose_v2(boxes, masks, v, H, W, True) ** 2).sum()

    def loss_xla(boxes, masks, v):
        out = masks_to_layout(v, boxes, masks, None, H, W, backend="xla")
        return (out ** 2).sum()

    gp = jax.grad(loss_v2, argnums=(0, 1, 2))(boxes, masks, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(boxes, masks, v)
    for a, b, name in zip(gp, gx, ("boxes", "masks", "vecs")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   rtol=1e-4, err_msg=name)


def test_relayout_kernels_match_crn_reference():
    """Pallas s2d/d2s relayout kernels (interpret mode on CPU) must be
    bit-identical to the jnp reference transforms in nn/crn.py (the
    phase-major layout contract the packed conv kernels assume)."""
    from sg2im_tpu.nn.crn import depth_to_space, space_to_depth
    from sg2im_tpu.ops.pallas.relayout_kernel import (
        depth_to_space_pallas, space_to_depth_pallas)

    rng = np.random.RandomState(0)
    for shape, dtype in (((2, 16, 16, 8), np.float32),
                         ((1, 64, 32, 5), np.float32),
                         ((2, 8, 8, 160), np.float32),
                         ((2, 32, 32, 16), jnp.bfloat16)):
        x = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(dtype)
        want = space_to_depth(x)
        got = space_to_depth_pallas(x, interpret=True)
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(want, np.float32))
        back = depth_to_space_pallas(want, interpret=True)
        np.testing.assert_array_equal(np.asarray(back, np.float32),
                                      np.asarray(x, np.float32))
