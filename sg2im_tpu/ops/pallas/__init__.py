"""Custom Pallas TPU kernels (fused layout compose)."""

from sg2im_tpu.ops.pallas.layout_kernel import (
    fused_layout_compose,
    pallas_available,
)

__all__ = ["fused_layout_compose", "pallas_available"]
