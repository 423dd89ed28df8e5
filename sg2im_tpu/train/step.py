"""The jitted GAN train step — generator + both discriminators + three Adam
updates in ONE XLA program.

Faithful to reference ``scripts/train.py:502-592`` per-iteration semantics:

- G forward with GT boxes/masks (``train.py:524-528``), losses from
  ``calculate_model_losses`` (``train.py:387-412``) plus adversarial terms.
- D modules stay in *train* mode throughout (only the generator flips to
  eval at ``eval_mode_after``, ``train.py:509-512``): their BatchNorm batch
  stats update on every forward — G-loss pass, D fake pass, D real pass, in
  that order — and we chain the mutated stats identically.
- D_obj loss = gan_d(real, fake) + ac_real + ac_fake at weight 1
  (``train.py:566-579``); D_img loss = gan_d(real, fake)
  (``train.py:581-592``); fakes are stop_gradient'ed (torch ``.detach()``).
- NaN guard: if the G total loss is non-finite, the reference ``continue``s
  — skipping G *and* D updates but still counting the iteration
  (``train.py:552-555``).  We guard STRICTLY MORE than the reference, which
  has two recovery holes observed in practice (a divergence at one step
  poisons the run permanently):
    (a) a step whose loss is finite but whose gradients are inf/NaN applies
        a poisoned param update (``loss.item()`` can't see grad overflow);
    (b) a NaN forward still writes NaN into BatchNorm running stats (torch
        updates them during the forward, before the guard fires), so every
        later forward is NaN even though params were protected.
  Here ``good`` additionally requires all-finite gradients, and on skip the
  BN running stats (generator's AND the D stats mutated by the G-pass
  scoring) revert with the params — the step is a true no-op, training
  resumes from the last healthy state.  On healthy steps the numerics are
  bit-identical to the reference semantics.
- Losses over padded batches use validity masks so means equal the
  reference's ragged-batch means.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from sg2im_tpu import losses as L
from sg2im_tpu.train.state import TrainState, tree_where


def _all_finite(tree):
    """Traced bool: every leaf of ``tree`` is all-finite.  The per-tensor
    isfinite+reduce fuses into the optimizer's read of the same gradients,
    so the check is HBM-free."""
    leaves = jax.tree.leaves(tree)
    if not leaves:
        return jnp.asarray(True)
    return functools.reduce(jnp.logical_and,
                            [jnp.isfinite(l).all() for l in leaves])


def _split_vars(variables):
    col = {k: v for k, v in variables.items() if k != "params"}
    return variables["params"], col


def _merge_vars(params, col):
    return {"params": params, **col}


class SkippableAdam:
    """Adam whose whole update — moments, count, and the applied step — is
    gated by a traced boolean, in ONE fused elementwise pass.

    Replaces the NaN-guard's whole-state ``tree_where`` (which read old+new
    copies of every param/opt leaf: ~3x the optimizer state in extra HBM
    traffic per step) while reproducing the reference's ``continue`` skip
    exactly (``scripts/train.py:552-555``): when ``good`` is False the
    moments and count are unchanged and the update is zero, so
    ``optax.apply_updates`` leaves params bit-identical.

    Numerics and the state pytree structure match
    ``optax.adam(lr, b1, b2, eps)`` — (ScaleByAdamState, EmptyState) — so
    existing checkpoints resume unchanged.
    """

    def __init__(self, learning_rate, b1=0.9, b2=0.999, eps=1e-8):
        self.lr = learning_rate
        self.b1, self.b2, self.eps = b1, b2, eps

    def init(self, params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return (optax.ScaleByAdamState(
                    count=jnp.zeros([], jnp.int32), mu=zeros(), nu=zeros()),
                optax.EmptyState())

    def update(self, grads, state, params=None, good=None):
        del params
        adam_state, empty = state
        if good is None:
            good = jnp.asarray(True)
        count = adam_state.count + good.astype(adam_state.count.dtype)
        cf = count.astype(jnp.float32)
        c1 = 1.0 - self.b1 ** cf
        c2 = 1.0 - self.b2 ** cf

        def new_mu(m, g):
            # jnp.where (not arithmetic masking): on skipped steps g is
            # non-finite and 0*NaN would poison the moments.
            return jnp.where(good, self.b1 * m + (1.0 - self.b1) * g, m)

        def new_nu(v, g):
            return jnp.where(good, self.b2 * v + (1.0 - self.b2) * g * g, v)

        mu = jax.tree.map(new_mu, adam_state.mu, grads)
        nu = jax.tree.map(new_nu, adam_state.nu, grads)

        def upd(m, v):
            # Same float-op order as optax scale_by_adam + scale(-lr).
            u = -self.lr * ((m / c1) / (jnp.sqrt(v / c2) + self.eps))
            return jnp.where(good, u, jnp.zeros_like(u))

        updates = jax.tree.map(upd, mu, nu)
        return updates, (optax.ScaleByAdamState(count=count, mu=mu, nu=nu),
                         empty)


def make_optimizers(config):
    """Three independent Adam optimizers (reference ``train.py:426-444``;
    torch Adam defaults: betas (0.9, 0.999), eps 1e-8)."""
    mk = lambda: SkippableAdam(config.learning_rate, b1=0.9, b2=0.999,
                               eps=1e-8)
    return {"g": mk(), "d_obj": mk(), "d_img": mk()}


def make_train_step(generator, d_obj, d_img, config, optimizers=None):
    """Build the jitted train step.

    Args:
      generator / d_obj / d_img: flax modules (discriminators may be None).
      config: TrainConfig.
      optimizers: dict from make_optimizers (created if None).

    Returns:
      train_step(state, batch, eval_mode: static bool) -> (state, metrics).
      ``batch`` is a dict of arrays: imgs (N,H,W,3), objs (N,O),
      boxes (N,O,4), masks (N,O,M,M)|None, triples (N,T,3), obj_mask (N,O),
      triple_mask (N,T).
    """
    opts = optimizers or make_optimizers(config)
    g_loss_fns = L.get_gan_losses(config.gan_loss_type)
    gan_g_loss, gan_d_loss = g_loss_fns

    def generator_losses(g_params, g_col, d_obj_vars, d_img_vars, batch,
                         noise, eval_mode: bool):
        train_flag = not eval_mode
        mutable = ["batch_stats"] if (train_flag and "batch_stats" in g_col) else []
        out = generator.apply(
            _merge_vars(g_params, g_col),
            batch["objs"], batch["triples"],
            batch["obj_mask"], batch["triple_mask"],
            boxes_gt=batch["boxes"], masks_gt=batch.get("masks"),
            train=train_flag, layout_noise=noise,
            mutable=mutable if mutable else False,
        )
        if mutable:
            (imgs_pred, boxes_pred, masks_pred, rel_scores), g_col_new = out
            g_col = {**g_col, **g_col_new}
        else:
            imgs_pred, boxes_pred, masks_pred, rel_scores = out

        losses = {}
        total = 0.0
        # L1 pixel loss (train.py:393-395); skip_pixel_loss is False in the
        # reference loop since GT boxes are always passed (train.py:524-531).
        l1 = L.l1_loss(imgs_pred, batch["imgs"])
        losses["L1_pixel_loss"] = l1 * config.l1_pixel_loss_weight
        total += losses["L1_pixel_loss"]
        # bbox MSE over real objects (train.py:397).
        bbox = L.mse_loss(boxes_pred, batch["boxes"], batch["obj_mask"])
        losses["bbox_pred"] = bbox * config.bbox_pred_loss_weight
        total += losses["bbox_pred"]
        if config.predicate_pred_loss_weight > 0:
            pred_ce = L.cross_entropy(rel_scores, batch["triples"][..., 1],
                                      batch["triple_mask"])
            losses["predicate_pred"] = (pred_ce
                                        * config.predicate_pred_loss_weight)
            total += losses["predicate_pred"]
        if (config.mask_loss_weight > 0 and batch.get("masks") is not None
                and masks_pred is not None):
            mask_bce = L.binary_cross_entropy(
                masks_pred, batch["masks"], batch["obj_mask"])
            losses["mask_loss"] = mask_bce * config.mask_loss_weight
            total += losses["mask_loss"]

        d_obj_col_new = None
        d_img_col_new = None
        if d_obj is not None:
            p, col = _split_vars(d_obj_vars)
            dm = ["batch_stats"] if "batch_stats" in col else []
            res = d_obj.apply(_merge_vars(p, col), imgs_pred, batch["boxes"],
                              obj_mask=batch["obj_mask"], train=True,
                              mutable=dm if dm else False)
            if dm:
                (scores_fake, obj_logits), d_obj_col_new = res
            else:
                scores_fake, obj_logits = res
            ac_loss = L.cross_entropy(obj_logits, batch["objs"],
                                      batch["obj_mask"])
            losses["ac_loss"] = ac_loss * config.ac_loss_weight
            total += losses["ac_loss"]
            w = config.discriminator_loss_weight * config.d_obj_weight
            losses["g_gan_obj_loss"] = (
                gan_g_loss(scores_fake, batch["obj_mask"]) * w)
            total += losses["g_gan_obj_loss"]
        if d_img is not None:
            p, col = _split_vars(d_img_vars)
            dm = ["batch_stats"] if "batch_stats" in col else []
            res = d_img.apply(_merge_vars(p, col), imgs_pred, train=True,
                              mutable=dm if dm else False)
            if dm:
                scores_fake_img, d_img_col_new = res
            else:
                scores_fake_img = res
            w = config.discriminator_loss_weight * config.d_img_weight
            losses["g_gan_img_loss"] = gan_g_loss(scores_fake_img) * w
            total += losses["g_gan_img_loss"]

        losses["total_loss"] = total
        aux = dict(losses=losses, g_col=g_col, imgs_pred=imgs_pred,
                   d_obj_col_new=d_obj_col_new, d_img_col_new=d_img_col_new)
        return total, aux

    def d_obj_losses_fn(d_params, d_col, imgs_fake, imgs_real, batch):
        """Fake pass then real pass, chaining BN stats (train.py:566-571)."""
        dm = ["batch_stats"] if "batch_stats" in d_col else []

        def run(col, imgs):
            res = d_obj.apply(_merge_vars(d_params, col), imgs,
                              batch["boxes"], obj_mask=batch["obj_mask"],
                              train=True, mutable=dm if dm else False)
            if dm:
                (scores, logits), new_col = res
                return scores, logits, {**col, **new_col}
            scores, logits = res
            return scores, logits, col

        scores_fake, logits_fake, d_col = run(d_col, imgs_fake)
        scores_real, logits_real, d_col = run(d_col, imgs_real)
        om = batch["obj_mask"]
        gan = gan_d_loss(scores_real, scores_fake, om)
        ac_real = L.cross_entropy(logits_real, batch["objs"], om)
        ac_fake = L.cross_entropy(logits_fake, batch["objs"], om)
        total = gan + ac_real + ac_fake
        losses = {"d_obj_gan_loss": gan, "d_ac_loss_real": ac_real,
                  "d_ac_loss_fake": ac_fake}
        return total, (losses, d_col)

    def d_img_losses_fn(d_params, d_col, imgs_fake, imgs_real):
        dm = ["batch_stats"] if "batch_stats" in d_col else []

        def run(col, imgs):
            res = d_img.apply(_merge_vars(d_params, col), imgs, train=True,
                              mutable=dm if dm else False)
            if dm:
                scores, new_col = res
                return scores, {**col, **new_col}
            return res, col

        scores_fake, d_col = run(d_col, imgs_fake)
        scores_real, d_col = run(d_col, imgs_real)
        gan = gan_d_loss(scores_real, scores_fake)
        return gan, ({"d_img_gan_loss": gan}, d_col)

    @functools.partial(jax.jit, static_argnames=("eval_mode",),
                       donate_argnums=(0,))
    def train_step(state: TrainState, batch, eval_mode: bool = False):
        rng, noise_rng = jax.random.split(state.rng)
        H, W = config.image_size
        N = batch["imgs"].shape[0]
        noise = None
        if config.layout_noise_dim > 0:
            noise = jax.random.normal(
                noise_rng, (N, H, W, config.layout_noise_dim),
                dtype=batch["imgs"].dtype)

        g_params, g_col = _split_vars(state.g_vars)
        (total, aux), g_grads = jax.value_and_grad(
            generator_losses, has_aux=True)(
                g_params, g_col, state.d_obj_vars, state.d_img_vars,
                batch, noise, eval_mode)
        metrics = dict(aux["losses"])

        # NaN guard (train.py:552-555, strengthened — see module docstring):
        # skip when the G total loss OR any G gradient is non-finite.  On
        # skip the whole step is a no-op: params/moments (SkippableAdam),
        # the generator's batch stats, and the D stats mutated by the
        # G-pass scoring all keep their old values, so one divergent step
        # cannot poison the run (the reference's loss-only guard leaves
        # both params-via-inf-grads and BN-running-stats holes open).
        good = jnp.logical_and(jnp.isfinite(total), _all_finite(g_grads))

        updates, g_opt_new = opts["g"].update(g_grads, state.g_opt, g_params,
                                              good=good)
        g_params_new = optax.apply_updates(g_params, updates)
        imgs_fake = jax.lax.stop_gradient(aux["imgs_pred"])

        new_fields = dict(
            step=state.step + 1,
            rng=rng,
            g_vars=_merge_vars(g_params_new,
                               tree_where(good, aux["g_col"], g_col)),
            g_opt=g_opt_new,
        )

        d_clip = getattr(config, "d_clip", None)

        def maybe_clip(params, ok):
            # WGAN weight clip (train.py:116 parses --d_clip but never
            # applies it; we implement the documented intent).  Gated by
            # ``ok`` so a skipped step leaves params bit-identical.
            if d_clip is None:
                return params
            return jax.tree.map(
                lambda p: jnp.where(ok, jnp.clip(p, -d_clip, d_clip), p),
                params)

        if d_obj is not None:
            d_params, d_col = _split_vars(state.d_obj_vars)
            if aux["d_obj_col_new"]:
                # G-pass scoring mutated these stats from imgs_pred — on a
                # G skip imgs_pred may be NaN, so the merge is gated too.
                d_col = tree_where(good, {**d_col, **aux["d_obj_col_new"]},
                                   d_col)
            d_col_pre = d_col
            (d_total, (d_losses, d_col)), d_grads = jax.value_and_grad(
                d_obj_losses_fn, has_aux=True)(
                    d_params, d_col, imgs_fake, batch["imgs"], batch)
            # A D update additionally requires its OWN grads finite; on
            # skip the D-step BN-stat mutations are dropped (stats are
            # per-channel vectors; the select is negligible).
            d_good = jnp.logical_and(good, _all_finite(d_grads))
            d_col = tree_where(d_good, d_col, d_col_pre)
            du, d_opt_new = opts["d_obj"].update(d_grads, state.d_obj_opt,
                                                 d_params, good=d_good)
            d_params_new = maybe_clip(optax.apply_updates(d_params, du),
                                      d_good)
            new_fields["d_obj_vars"] = _merge_vars(d_params_new, d_col)
            new_fields["d_obj_opt"] = d_opt_new
            metrics.update(d_losses)
            metrics["d_obj_total"] = d_total
        if d_img is not None:
            d_params, d_col = _split_vars(state.d_img_vars)
            if aux["d_img_col_new"]:
                d_col = tree_where(good, {**d_col, **aux["d_img_col_new"]},
                                   d_col)
            d_col_pre = d_col
            (d_total, (d_losses, d_col)), d_grads = jax.value_and_grad(
                d_img_losses_fn, has_aux=True)(
                    d_params, d_col, imgs_fake, batch["imgs"])
            d_good = jnp.logical_and(good, _all_finite(d_grads))
            d_col = tree_where(d_good, d_col, d_col_pre)
            du, d_opt_new = opts["d_img"].update(d_grads, state.d_img_opt,
                                                 d_params, good=d_good)
            d_params_new = maybe_clip(optax.apply_updates(d_params, du),
                                      d_good)
            new_fields["d_img_vars"] = _merge_vars(d_params_new, d_col)
            new_fields["d_img_opt"] = d_opt_new
            metrics.update(d_losses)
            metrics["d_img_total"] = d_total

        new_state = state.replace(**new_fields)
        metrics["skipped_nonfinite"] = jnp.logical_not(good)
        return new_state, metrics

    # -- per-phase measurement fns (reference --timing sections,
    # scripts/train.py:524-560).  The production step is ONE fused XLA
    # program, so phases can't be fenced inside it; these separately-jitted
    # probes time each section on identical inputs.  Each returns a scalar
    # that data-depends on the phase's full output (global_norm over grads)
    # so XLA can't dead-code the backward.
    @jax.jit
    def phase_g_forward(state, batch, noise):
        g_params, g_col = _split_vars(state.g_vars)
        mutable = ["batch_stats"] if "batch_stats" in g_col else []
        out = generator.apply(
            _merge_vars(g_params, g_col), batch["objs"], batch["triples"],
            batch["obj_mask"], batch["triple_mask"],
            boxes_gt=batch["boxes"], masks_gt=batch.get("masks"),
            train=True, layout_noise=noise,
            mutable=mutable if mutable else False)
        imgs_pred = (out[0] if mutable else out)[0]
        # (images, fence scalar): the caller fences on the scalar and feeds
        # the images to the D phases.
        return jax.lax.stop_gradient(imgs_pred), imgs_pred.sum()

    @jax.jit
    def phase_g_grad(state, batch, noise):
        g_params, g_col = _split_vars(state.g_vars)
        (total, _), grads = jax.value_and_grad(
            generator_losses, has_aux=True)(
                g_params, g_col, state.d_obj_vars, state.d_img_vars,
                batch, noise, False)
        return total + optax.global_norm(grads)

    @jax.jit
    def phase_d_obj_grad(state, batch, imgs_fake):
        d_params, d_col = _split_vars(state.d_obj_vars)
        (total, _), grads = jax.value_and_grad(
            d_obj_losses_fn, has_aux=True)(
                d_params, d_col, imgs_fake, batch["imgs"], batch)
        return total + optax.global_norm(grads)

    @jax.jit
    def phase_d_img_grad(state, batch, imgs_fake):
        d_params, d_col = _split_vars(state.d_img_vars)
        (total, _), grads = jax.value_and_grad(
            d_img_losses_fn, has_aux=True)(
                d_params, d_col, imgs_fake, batch["imgs"])
        return total + optax.global_norm(grads)

    train_step.phase_fns = {"g_forward": phase_g_forward,
                            "g_forward_backward": phase_g_grad}
    if d_obj is not None:
        train_step.phase_fns["d_obj_step"] = phase_d_obj_grad
    if d_img is not None:
        train_step.phase_fns["d_img_step"] = phase_d_img_grad
    return train_step
