"""torch-0.4 semantics shims for running the reference model in-process.

The reference was written against torch 0.4, where ``F.grid_sample`` had
``align_corners=True`` behavior (the argument did not exist) and the layout
relies on it (``sg2im/layout.py:50-59``).  Modern torch defaults to False,
so every in-process comparison against the reference (parity tests, the
``verify_pretrained`` north-star gate) must patch it.  This is THE single
shared implementation — keeping two copies in sync silently diverges the
fidelity gate from the test harness.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def torch04_semantics(randn_override=None):
    """Context manager patching torch to the reference's 0.4 semantics.

    ``randn_override``: optional ``f(dims: tuple, kw: dict) -> Tensor|None``
    consulted on every ``torch.randn`` call (``None`` falls through to the
    real randn).  Use it to pin the layout noise the reference samples
    inside ``forward`` (``sg2im/model.py:164-169``) — e.g. return zeros, or
    a pre-drawn tensor for bit-controlled comparisons.
    """
    import torch
    import torch.nn.functional as F

    orig_gs = F.grid_sample
    orig_randn = torch.randn

    def gs(input, grid, **kw):
        kw.setdefault("align_corners", True)
        return orig_gs(input, grid, **kw)

    def randn(*shape, **kw):
        dims = shape
        if len(dims) == 1 and isinstance(dims[0], (tuple, list, torch.Size)):
            dims = tuple(dims[0])  # model.py:165 passes one tuple arg
        out = randn_override(tuple(int(d) for d in dims), kw)
        if out is not None:
            return out
        return orig_randn(*shape, **kw)

    F.grid_sample = gs
    if randn_override is not None:
        torch.randn = randn
    try:
        yield
    finally:
        F.grid_sample = orig_gs
        torch.randn = orig_randn


def zeros_randn_override(dims, kw):
    """``randn_override`` that zeroes every draw (noise-free comparisons)."""
    import torch

    return torch.zeros(*dims, dtype=kw.get("dtype"), device=kw.get("device"))
