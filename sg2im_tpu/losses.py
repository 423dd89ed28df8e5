"""Loss library (reference ``sg2im/losses.py`` + ``scripts/train.py:387-412``).

Pure functions over jnp arrays.  Differences from the reference, by design:

- Every loss takes an optional validity ``mask`` so padded graph batches
  reproduce the reference's ragged-batch means exactly (the reference
  averages over real elements only because its batches are ragged).
- The AC cross-entropy lives here, not inside the discriminator module
  (reference computes it in ``discriminators.py:74``).
- ``gradient_penalty`` (defined but never called in the reference,
  ``losses.py:148-160``) is provided for WGAN-GP parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_mean(x, mask=None):
    """Mean over all elements, or over mask==1 elements (mask broadcastable
    against x; trailing axes of x beyond mask's rank are averaged too).

    Numerator and denominator use the SAME broadcast mask, so size-1 mask
    axes within x's rank count every broadcast element (a bare
    ``mask.sum() * trailing`` would undercount them and silently scale
    the loss).  ``where`` (not ``x*m``) keeps masked-out NaN/inf entries
    from poisoning the sum."""
    if mask is None:
        return x.mean()
    mask = mask.astype(x.dtype)
    extra = x.ndim - mask.ndim
    m = jnp.broadcast_to(mask.reshape(mask.shape + (1,) * extra), x.shape)
    denom = jnp.maximum(m.sum(), 1.0)
    return (jnp.where(m > 0, x, 0.0) * m).sum() / denom


def bce_with_logits(logits, targets):
    """Numerically stable sigmoid BCE (reference ``sg2im/losses.py:39-57``)."""
    neg_abs = -jnp.abs(logits)
    return (jnp.maximum(logits, 0.0) - logits * targets
            + jnp.log1p(jnp.exp(neg_abs)))


def gan_g_loss(scores_fake, mask=None):
    """Vanilla GAN generator loss (reference ``losses.py:72-83``)."""
    return masked_mean(bce_with_logits(scores_fake, jnp.ones_like(scores_fake)),
                       mask)


def gan_d_loss(scores_real, scores_fake, mask=None):
    """Vanilla GAN discriminator loss (reference ``losses.py:86-103``)."""
    loss_real = masked_mean(
        bce_with_logits(scores_real, jnp.ones_like(scores_real)), mask)
    loss_fake = masked_mean(
        bce_with_logits(scores_fake, jnp.zeros_like(scores_fake)), mask)
    return loss_real + loss_fake


def wgan_g_loss(scores_fake, mask=None):
    return -masked_mean(scores_fake, mask)


def wgan_d_loss(scores_real, scores_fake, mask=None):
    return masked_mean(scores_fake, mask) - masked_mean(scores_real, mask)


def lsgan_g_loss(scores_fake, mask=None):
    s = jax.nn.sigmoid(scores_fake)
    return masked_mean((s - 1.0) ** 2, mask)


def lsgan_d_loss(scores_real, scores_fake, mask=None):
    sr = jax.nn.sigmoid(scores_real)
    sf = jax.nn.sigmoid(scores_fake)
    return masked_mean((sr - 1.0) ** 2, mask) + masked_mean(sf ** 2, mask)


def get_gan_losses(gan_type: str):
    """Dispatch (reference ``losses.py:21-36``): returns (g_loss, d_loss)."""
    if gan_type == "gan":
        return gan_g_loss, gan_d_loss
    if gan_type == "wgan":
        return wgan_g_loss, wgan_d_loss
    if gan_type == "lsgan":
        return lsgan_g_loss, lsgan_d_loss
    raise ValueError(f'Unrecognized GAN type "{gan_type}"')


def l1_loss(pred, target):
    """Mean absolute error (pixel loss, ``scripts/train.py:393-395``)."""
    return jnp.abs(pred - target).mean()


def mse_loss(pred, target, mask=None):
    """Masked MSE (bbox loss, ``scripts/train.py:397``)."""
    return masked_mean((pred - target) ** 2, mask)


def cross_entropy(logits, labels, mask=None):
    """Masked softmax cross-entropy (AC / predicate losses,
    ``scripts/train.py:399-404``, ``discriminators.py:74``).

    Out-of-range labels on MASKED rows are tolerated (rewritten to 0
    before the gather): ``take_along_axis`` fills out-of-range with NaN,
    and even a masked NaN would otherwise poison the mean — e.g. a loader
    padding labels with -1.  UNMASKED rows are deliberately NOT sanitized:
    a genuinely out-of-range label (loader/vocab bug) produces NaN and
    trips the train step's finite-loss guard instead of silently training
    against an arbitrary class."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    if mask is not None:
        labels = jnp.where(mask > 0, labels, 0)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return masked_mean(nll, mask)


def binary_cross_entropy(probs, targets, mask=None):
    """BCE on probabilities (mask loss, ``scripts/train.py:401-403``).

    ``probs`` is clamped to [1e-7, 1 - 1e-7] so the BACKWARD is bounded
    by construction.  Without the clamp, a saturated upstream sigmoid
    (f32 ``sigmoid(x) == 1.0`` exactly for x >~ 16.6 — observed in real
    training by step 30) makes ``(1 - t) / (1 - p + eps)`` ~1e12; eager
    cancels it against the sigmoid's ``p * (1 - p) == 0`` VJP factor,
    but XLA's fused backward evaluates the same jaxpr in an order that
    produces ``0 * inf = NaN`` — a jit-only NaN with a finite loss that
    poisoned entire runs (localized in round 5; the train step's guard
    now also skips such steps, but the loss itself must not manufacture
    them).  torch's ``F.binary_cross_entropy`` bounds the same corner by
    clamping ``log`` at -100; forward delta vs the unclamped form is
    <= ~1e-7 per element, far inside the 2e-4 loss-parity tolerance
    (tests/test_losses.py)."""
    eps = 1e-12
    p = jnp.clip(probs, 1e-7, 1.0 - 1e-7)
    bce = -(targets * jnp.log(p + eps)
            + (1.0 - targets) * jnp.log(1.0 - p + eps))
    return masked_mean(bce, mask)


def gradient_penalty(key, x_real, x_fake, f, gamma: float = 1.0):
    """WGAN-GP penalty (reference ``losses.py:148-160``; note the reference
    draws eps from randn, not uniform — reproduced)."""
    N = x_real.shape[0]
    eps = jax.random.normal(key, (N,) + (1,) * (x_real.ndim - 1),
                            dtype=x_real.dtype)
    x_hat = eps * x_real + (1.0 - eps) * x_fake

    def score_sum(xh):
        s = f(xh)
        if s.ndim > 1:
            s = s.reshape(s.shape[0], -1).mean(axis=1)
        return s.sum()

    grad = jax.grad(score_sum)(x_hat)
    norm = jnp.sqrt((grad.reshape(N, -1) ** 2).sum(axis=1) + 1e-12)
    return (((norm - gamma) ** 2) / (gamma * gamma)).mean()
