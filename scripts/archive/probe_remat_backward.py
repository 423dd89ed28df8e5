"""Probe: jax.checkpoint (remat) on the G loss fn — the backward is
HBM-bound (roofline: 181-190% of copy-stream proxy, 35% MXU), so
recomputing the forward during backward (2x forward FLOPs, ~no stored
activations) could win. Measures stock vs remat fwd+bwd at b32/b128,
baseline + fast configs."""
import sys, time
sys.path.insert(0, "/root/repo")
from sg2im_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np, optax
from bench import train_step_setup
from sg2im_tpu.train.step import make_train_step

def fence(x): return float(jnp.asarray(x).astype(jnp.float32).sum())

def measure(fn, args, iters=15):
    out = fn(*args); fence(out)
    out = fn(*args); fence(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    fence(out)
    return (time.perf_counter()-t0)/iters*1e3

for cfgname, extra in (("baseline", {}),
                       ("fast", {"bf16_compute": True, "crn_mode": "split"})):
    for batch in (32, 128):
        trainer, state, batch_d = train_step_setup(batch, **extra)
        batch_d = {k: jax.device_put(v) for k, v in batch_d.items()}
        state = jax.device_put(state)
        H, W = trainer.config.image_size
        noise = jax.random.normal(jax.random.PRNGKey(0),
            (batch, H, W, trainer.config.layout_noise_dim), jnp.float32)
        # reach the internal generator_losses through the phase fn's
        # closure is not exposed; rebuild an equivalent via make_train_step
        # -> use the existing phase fn for stock, and construct remat via
        # the module apply directly.
        fns = trainer.train_step.phase_fns
        stock = fns["g_forward_backward"]
        ms_stock = measure(stock, (state, batch_d, noise))

        # remat variant: checkpoint the generator-apply + losses.
        from sg2im_tpu.train.step import _split_vars, _merge_vars
        import sg2im_tpu.losses as L
        gen = trainer.generator
        c = trainer.config
        gan_g_loss, _ = L.get_gan_losses(c.gan_loss_type)
        d_obj, d_img = trainer.d_obj, trainer.d_img

        def g_losses(g_params, g_col, batch, noise):
            out = gen.apply(_merge_vars(g_params, g_col),
                batch["objs"], batch["triples"], batch["obj_mask"],
                batch["triple_mask"], boxes_gt=batch["boxes"],
                masks_gt=batch.get("masks"), train=True,
                layout_noise=noise, mutable=["batch_stats"])
            (imgs_pred, boxes_pred, masks_pred, rel_scores), _ = out
            total = L.l1_loss(imgs_pred, batch["imgs"]) * c.l1_pixel_loss_weight
            total += L.mse_loss(boxes_pred, batch["boxes"], batch["obj_mask"]) * c.bbox_pred_loss_weight
            if masks_pred is not None and batch.get("masks") is not None:
                total += L.binary_cross_entropy(masks_pred, batch["masks"], batch["obj_mask"]) * c.mask_loss_weight
            if d_obj is not None:
                p, col = _split_vars(state.d_obj_vars)
                res = d_obj.apply(_merge_vars(p, col), imgs_pred, batch["boxes"],
                    obj_mask=batch["obj_mask"], train=True, mutable=["batch_stats"])
                (scores_fake, obj_logits), _ = res
                total += L.cross_entropy(obj_logits, batch["objs"], batch["obj_mask"]) * c.ac_loss_weight
                total += gan_g_loss(scores_fake, batch["obj_mask"]) * c.discriminator_loss_weight * c.d_obj_weight
            if d_img is not None:
                p, col = _split_vars(state.d_img_vars)
                res = d_img.apply(_merge_vars(p, col), imgs_pred, train=True, mutable=["batch_stats"])
                scores_fake_img, _ = res
                total += gan_g_loss(scores_fake_img) * c.discriminator_loss_weight * c.d_img_weight
            return total

        g_params, g_col = _split_vars(state.g_vars)

        @jax.jit
        def stock2(state, batch, noise):
            gp, gc = _split_vars(state.g_vars)
            total, grads = jax.value_and_grad(g_losses)(gp, gc, batch, noise)
            return total + optax.global_norm(grads)

        @jax.jit
        def remat(state, batch, noise):
            gp, gc = _split_vars(state.g_vars)
            f = jax.checkpoint(g_losses)
            total, grads = jax.value_and_grad(f)(gp, gc, batch, noise)
            return total + optax.global_norm(grads)

        ms_stock2 = measure(stock2, (state, batch_d, noise))
        ms_remat = measure(remat, (state, batch_d, noise))
        print(f"{cfgname} b{batch}: phase-stock {ms_stock:7.2f}  "
              f"probe-stock {ms_stock2:7.2f}  remat {ms_remat:7.2f} ms  "
              f"({ms_stock2/ms_remat:.2f}x)", flush=True)
