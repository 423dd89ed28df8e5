"""Image pre/deprocessing (reference ``sg2im/data/utils.py:22-80``).

Host side uses numpy/PIL; the deprocess math also has a jnp-compatible form
(pure broadcasting).  Conventions: images are NHWC float32; preprocessed
images are imagenet-normalized; deprocess optionally min-max rescales each
image over all channels (reference ``rescale``, ``data/utils.py:33-35``)
before mapping to uint8.
"""

from __future__ import annotations

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def imagenet_preprocess(img):
    """(..., H, W, 3) float in [0, 1] -> normalized."""
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def imagenet_deprocess(img, rescale_image: bool = True):
    """Undo normalization; optionally min-max rescale per image.

    Args:
      img: (H, W, 3) or (N, H, W, 3) float array (numpy or jax).

    Returns:
      same-shape float array in [0, 1] (if rescaled) — not yet uint8.
    """
    x = img * IMAGENET_STD + IMAGENET_MEAN
    if rescale_image:
        if x.ndim == 3:
            lo, hi = x.min(), x.max()
            x = (x - lo) / (hi - lo)
        else:
            lo = x.reshape(x.shape[0], -1).min(axis=1)[:, None, None, None]
            hi = x.reshape(x.shape[0], -1).max(axis=1)[:, None, None, None]
            x = (x - lo) / (hi - lo)
    return x


def imagenet_deprocess_batch(imgs, rescale: bool = True):
    """(N, H, W, 3) preprocessed -> (N, H, W, 3) uint8 in [0, 255]
    (reference ``imagenet_deprocess_batch``, ``data/utils.py:48-67``)."""
    x = imagenet_deprocess(np.asarray(imgs), rescale_image=rescale)
    return np.clip(x * 255.0, 0, 255).astype(np.uint8)


def imagenet_deprocess_batch_jnp(imgs, rescale: bool = True):
    """jnp formulation of :func:`imagenet_deprocess_batch` for running the
    deprocess INSIDE the serving program (on-device): (N, H, W, 3) float
    -> (N, H, W, 3) uint8.  Same math as the host path (denormalize,
    per-image min-max rescale over all channels, clip*255, truncating
    uint8 cast); transferring uint8 instead of f32 cuts device->host
    traffic 4x and moves the per-image min/max reductions onto the chip.
    """
    import jax.numpy as jnp

    x = imgs.astype(jnp.float32) * jnp.asarray(IMAGENET_STD) \
        + jnp.asarray(IMAGENET_MEAN)
    if rescale:
        lo = x.reshape(x.shape[0], -1).min(axis=1)[:, None, None, None]
        hi = x.reshape(x.shape[0], -1).max(axis=1)[:, None, None, None]
        x = (x - lo) / (hi - lo)
    return jnp.clip(x * 255.0, 0, 255).astype(jnp.uint8)


def resize_image(pil_img, size, interp=None):
    """PIL bilinear resize matching reference ``Resize``
    (``data/utils.py:70-80``); ``size`` is (H, W)."""
    from PIL import Image

    interp = interp if interp is not None else Image.BILINEAR
    if isinstance(size, tuple):
        H, W = size
        return pil_img.resize((W, H), interp)
    return pil_img.resize((size, size), interp)
