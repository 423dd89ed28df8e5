"""Trainer: module construction, state init, validation, checkpointing.

Host-side orchestration around the jitted train step — the TPU equivalent
of reference ``scripts/train.py main()`` (``train.py:415-661``) minus the
CLI (see ``sg2im_tpu.cli.train``).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from sg2im_tpu.losses import (
    binary_cross_entropy,
    cross_entropy,
    l1_loss,
    mse_loss,
)
from sg2im_tpu.models import (
    AcCropDiscriminator,
    PatchDiscriminator,
    Sg2ImGenerator,
)
from sg2im_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
from sg2im_tpu.train.config import TrainConfig
from sg2im_tpu.train.state import TrainState
from sg2im_tpu.train.step import make_optimizers, make_train_step
from sg2im_tpu.utils.metrics import jaccard


class Trainer:
    def __init__(self, config: TrainConfig, vocab, mesh=None):
        self.config = config
        self.vocab = vocab
        self.generator = Sg2ImGenerator(vocab=vocab,
                                        **config.generator_kwargs())
        self.d_obj = (AcCropDiscriminator(vocab=vocab, **config.d_obj_kwargs())
                      if config.use_obj_discriminator else None)
        self.d_img = (PatchDiscriminator(**config.d_img_kwargs())
                      if config.use_img_discriminator else None)
        self.optimizers = make_optimizers(config)
        self.train_step = make_train_step(self.generator, self.d_obj,
                                          self.d_img, config,
                                          self.optimizers)
        if mesh is False:
            mesh = None  # explicit opt-out
        elif mesh is None and config.data_parallel > 1:
            mesh = make_mesh(config.data_parallel)
        self.mesh = mesh
        self._eval_step = None
        # Host-mirrored step counter: reading ``int(state.step)`` from the
        # device every iteration would force a full sync + host round-trip
        # per step (measured ~15 ms/step through the axon tunnel) and break
        # dispatch pipelining.  The device counter stays authoritative for
        # checkpoints; this mirror only selects the eval_mode regime.
        self._host_step: int | None = None

    # -- initialization ----------------------------------------------------

    def dummy_batch(self, n: int | None = None) -> dict:
        c = self.config
        N = n or c.batch_size
        H, W = c.image_size
        O, T = c.pad_objects_to, c.pad_triples_to
        batch = {
            "imgs": np.zeros((N, H, W, 3), np.float32),
            "objs": np.zeros((N, O), np.int32),
            "boxes": np.tile(np.array([0.0, 0.0, 1.0, 1.0], np.float32),
                             (N, O, 1)),
            "triples": np.zeros((N, T, 3), np.int32),
            "obj_mask": np.ones((N, O), np.float32),
            "triple_mask": np.ones((N, T), np.float32),
        }
        if c.mask_size and c.dataset == "coco":
            batch["masks"] = np.zeros((N, O, c.mask_size, c.mask_size),
                                      np.float32)
        return batch

    def init_state(self, seed: int | None = None, batch: dict | None = None,
                   ) -> TrainState:
        c = self.config
        seed = c.seed if seed is None else seed
        batch = batch or self.dummy_batch(n=2)
        rng = jax.random.PRNGKey(seed)
        rng, gk, dok, dik, nk = jax.random.split(rng, 5)

        g_vars = self.generator.init(
            {"params": gk, "noise": nk},
            jnp.asarray(batch["objs"]), jnp.asarray(batch["triples"]),
            jnp.asarray(batch["obj_mask"]), jnp.asarray(batch["triple_mask"]),
            boxes_gt=jnp.asarray(batch["boxes"]),
            masks_gt=(jnp.asarray(batch["masks"])
                      if "masks" in batch else None),
            train=True,
        )
        g_vars = jax.tree.map(np.asarray, dict(g_vars))
        fields: dict[str, Any] = dict(
            step=jnp.zeros((), jnp.int32),
            rng=rng,
            g_vars=g_vars,
            g_opt=self.optimizers["g"].init(g_vars["params"]),
        )
        if self.d_obj is not None:
            dv = dict(self.d_obj.init(
                {"params": dok}, jnp.asarray(batch["imgs"]),
                jnp.asarray(batch["boxes"]), train=True))
            fields["d_obj_vars"] = jax.tree.map(np.asarray, dv)
            fields["d_obj_opt"] = self.optimizers["d_obj"].init(dv["params"])
        if self.d_img is not None:
            dv = dict(self.d_img.init(
                {"params": dik}, jnp.asarray(batch["imgs"]), train=True))
            fields["d_img_vars"] = jax.tree.map(np.asarray, dv)
            fields["d_img_opt"] = self.optimizers["d_img"].init(dv["params"])
        state = TrainState(**fields)
        if self.mesh is not None:
            state = replicate_state(state, self.mesh)
        self._host_step = 0
        return state

    def reset_g_optimizer(self, state: TrainState) -> TrainState:
        """Fresh Adam for the generator at the eval_mode_after switch
        (reference ``train.py:509-512``)."""
        g_opt = self.optimizers["g"].init(state.g_vars["params"])
        if self.mesh is not None:
            # The fresh count scalar is a process-local array; the rest of
            # the state is replicated globally — re-replicate so the next
            # multi-controller jit call doesn't mix device sets.
            g_opt = replicate_state(g_opt, self.mesh)
        return state.replace(g_opt=g_opt)

    def _layout_noise(self, key, N: int):
        """One (N, H, W, layout_noise_dim) normal draw, replicated as a
        global array under a mesh (host-local inputs mixed with globally
        sharded state are rejected by multi-controller jit).  Keys must be
        process-independent (step/seed-derived) so every process draws the
        same values."""
        c = self.config
        if c.layout_noise_dim <= 0:
            return None
        H, W = c.image_size
        noise = jax.random.normal(key, (N, H, W, c.layout_noise_dim))
        if self.mesh is not None:
            from sg2im_tpu.parallel.mesh import replicate_host_array

            noise = replicate_host_array(noise, self.mesh)
        return noise

    # -- stepping ----------------------------------------------------------

    def step(self, state: TrainState, batch: dict):
        if self._host_step is None:
            self._host_step = int(state.step)  # one sync at (re)start
        # Reference semantics (train.py:466): negative eval_mode_after
        # means 'never switch to eval mode'.
        eval_mode = bool(0 <= self.config.eval_mode_after
                         <= self._host_step)
        if self.mesh is not None:
            batch = shard_batch(batch, self.mesh)
        out = self.train_step(state, batch, eval_mode=eval_mode)
        self._host_step += 1
        return out

    def step_breakdown(self, state: TrainState, batch: dict) -> dict:
        """Per-phase device times in ms (reference ``--timing`` sections,
        ``scripts/train.py:524-560``): G forward, G forward+loss+backward,
        each D step's forward+backward.  Measurement-only — training state
        is not advanced.  Fencing is via a host scalar read (``float``),
        which syncs even through the axon tunnel where
        ``block_until_ready`` does not."""
        import time

        c = self.config
        if self.mesh is not None:
            batch = shard_batch(batch, self.mesh)
        N = batch["imgs"].shape[0]
        noise = self._layout_noise(jax.random.PRNGKey(0), N)
        fns = self.train_step.phase_fns
        times: dict[str, float] = {}
        imgs_fake = None
        for name, fn in fns.items():
            if name.startswith("d_"):
                args = (state, batch, imgs_fake)
            else:
                args = (state, batch, noise)
            out = fn(*args)  # warm the compile outside the timed region
            fence = out[1] if isinstance(out, tuple) else out
            float(fence)
            t0 = time.perf_counter()
            out = fn(*args)
            if isinstance(out, tuple):
                imgs_fake, fence = out
            else:
                fence = out
            float(fence)
            times[name] = (time.perf_counter() - t0) * 1000.0
        return times

    # -- validation (reference check_model, train.py:309-384) --------------

    def _build_eval_step(self):
        c = self.config
        gen = self.generator

        def eval_step(g_vars, batch, noise):
            out = gen.apply(
                g_vars, batch["objs"], batch["triples"], batch["obj_mask"],
                batch["triple_mask"], boxes_gt=batch["boxes"],
                masks_gt=batch.get("masks"), train=False,
                layout_noise=noise)
            imgs_pred, boxes_pred, masks_pred, rel_scores = out
            losses = {
                "L1_pixel_loss": l1_loss(imgs_pred, batch["imgs"])
                * c.l1_pixel_loss_weight,
                "bbox_pred": mse_loss(boxes_pred, batch["boxes"],
                                      batch["obj_mask"])
                * c.bbox_pred_loss_weight,
            }
            if c.predicate_pred_loss_weight > 0:
                losses["predicate_pred"] = cross_entropy(
                    rel_scores, batch["triples"][..., 1],
                    batch["triple_mask"]) * c.predicate_pred_loss_weight
            if c.mask_loss_weight > 0 and batch.get("masks") is not None \
                    and masks_pred is not None:
                losses["mask_loss"] = binary_cross_entropy(
                    masks_pred, batch["masks"], batch["obj_mask"]) \
                    * c.mask_loss_weight
            losses["total_loss"] = sum(losses.values())
            iou_sum = jaccard(boxes_pred, batch["boxes"], batch["obj_mask"])
            n_objs = batch["obj_mask"].sum()
            return losses, iou_sum, n_objs, (imgs_pred, boxes_pred,
                                             masks_pred)

        return jax.jit(eval_step)

    def check_model(self, state: TrainState, batches, num_samples=None,
                    return_samples: bool = False):
        """Validation sweep: mean losses + mean IoU (reference
        ``check_model``).  ``batches`` is an iterable of batch dicts.

        With ``return_samples=True`` also returns the reference's
        ``(samples, batch_data)`` pair from the last batch swept — the
        deprocessed GT-box/GT-mask triptych plus the padded batch tensors
        and predictions (``train.py:346-384``; ``obj_to_img``/
        ``triple_to_img`` are replaced by the padding masks).
        """
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        tot_losses: dict[str, float] = {}
        tot_iou, tot_objs, seen = 0.0, 0.0, 0
        rng = jax.random.PRNGKey(int(state.step))
        last_batch, last_preds = None, None
        for batch in batches:
            if num_samples is not None and seen >= num_samples:
                break
            if self.mesh is not None:
                # Multi-host: per-process local val shards assemble into a
                # global batch exactly like the train step — eval over a
                # mere local slice would record 1/process_count of the
                # sweep as the global validation result, and differing
                # per-process jit inputs violate the multi-controller
                # contract.
                batch = shard_batch(batch, self.mesh)
            N = batch["imgs"].shape[0]
            rng, k = jax.random.split(rng)
            noise = self._layout_noise(k, N)
            losses, iou_sum, n_objs, preds = self._eval_step(
                state.g_vars, batch, noise)
            for k2, v in losses.items():
                tot_losses[k2] = tot_losses.get(k2, 0.0) + float(v) * N
            tot_iou += float(iou_sum)
            tot_objs += float(n_objs)
            seen += N
            last_batch, last_preds = batch, preds
        mean_losses = {k2: v / max(seen, 1) for k2, v in tot_losses.items()}
        avg_iou = tot_iou / max(tot_objs, 1.0)
        if not return_samples:
            return mean_losses, avg_iou
        if last_batch is None:
            # Zero batches swept (e.g. num_val_samples < batch_size with
            # drop_last): degrade gracefully instead of crashing at the
            # first checkpoint.
            return mean_losses, {}, {}, avg_iou
        if jax.process_count() > 1:
            # Multi-host: the swept batches are global arrays whose shards
            # are not all addressable here, so the numpy sample dump is
            # impossible without an allgather.  Losses/IoU above are
            # already global; skip the (inspection-only) sample arrays.
            return mean_losses, {}, {}, avg_iou
        from sg2im_tpu.data.transforms import imagenet_deprocess_batch

        samples = self.sample_triptych(state, last_batch,
                                       seed=int(state.step))
        samples = {k: imagenet_deprocess_batch(np.asarray(v))
                   for k, v in samples.items()}
        _, boxes_pred, masks_pred = last_preds
        batch_data = {
            "objs": np.asarray(last_batch["objs"]),
            "boxes_gt": np.asarray(last_batch["boxes"]),
            "triples": np.asarray(last_batch["triples"]),
            "obj_mask": np.asarray(last_batch["obj_mask"]),
            "triple_mask": np.asarray(last_batch["triple_mask"]),
            "boxes_pred": np.asarray(boxes_pred),
        }
        if last_batch.get("masks") is not None:
            batch_data["masks_gt"] = np.asarray(last_batch["masks"])
        if masks_pred is not None:
            batch_data["masks_pred"] = np.asarray(masks_pred)
        return mean_losses, samples, batch_data, avg_iou

    def sample_triptych(self, state: TrainState, batch: dict, seed: int = 0):
        """GT-box/GT-mask, GT-box/pred-mask, pred-box/pred-mask samples
        (reference ``train.py:346-356``)."""
        N = batch["imgs"].shape[0]
        noise = self._layout_noise(jax.random.PRNGKey(seed), N)

        def run(boxes_gt, masks_gt):
            return self.generator.apply(
                state.g_vars, batch["objs"], batch["triples"],
                batch["obj_mask"], batch["triple_mask"], boxes_gt=boxes_gt,
                masks_gt=masks_gt, train=False, layout_noise=noise)[0]

        samples = {"gt_img": batch["imgs"]}
        samples["gt_box_gt_mask"] = run(batch["boxes"], batch.get("masks"))
        samples["gt_box_pred_mask"] = run(batch["boxes"], None)
        samples["pred_box_pred_mask"] = run(None, None)
        return samples

    # -- checkpointing -----------------------------------------------------

    def save_checkpoint(self, state: TrainState, path: str, extra=None,
                        arrays=None, wait: bool = True):
        from sg2im_tpu.ckpt.store import save_checkpoint

        save_checkpoint(path, state, config=self.config, vocab=self.vocab,
                        extra=extra, arrays=arrays, wait=wait)

    def load_checkpoint(self, path: str, state: TrainState | None = None):
        from sg2im_tpu.ckpt.store import load_checkpoint

        template = state if state is not None else self.init_state()
        restored, meta = load_checkpoint(path, template)
        self._host_step = None  # re-sync from the restored device counter
        return restored, meta
