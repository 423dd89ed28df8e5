"""Training-stack tests: loss-assembly parity vs the reference, smoke
training (loss decreases), NaN guard, checkpoint round-trip, and the
eval-mode regime switch."""

import os
import sys

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from sg2im_tpu.ckpt.torch_convert import (
    convert_ac_discriminator_state,
    convert_generator_state,
    convert_patch_discriminator_state,
)
from sg2im_tpu.train.config import TrainConfig
from sg2im_tpu.train.trainer import Trainer

VOCAB = {
    "object_idx_to_name": ["__image__", "cat", "dog", "sky"],
    "object_name_to_idx": {"__image__": 0, "cat": 1, "dog": 2, "sky": 3},
    "pred_idx_to_name": ["__in_image__", "left of", "above"],
    "pred_name_to_idx": {"__in_image__": 0, "left of": 1, "above": 2},
}

TINY = dict(
    dataset="coco",
    batch_size=2,
    image_size=(16, 16),
    embedding_dim=8,
    gconv_dim=12,
    gconv_hidden_dim=16,
    gconv_num_layers=2,
    refinement_network_dims=(12, 8),
    mask_size=4,
    layout_noise_dim=0,
    crop_size=8,
    d_obj_arch="C3-8-2",
    d_img_arch="C3-8-2",
    pad_objects_to=5,
    pad_triples_to=8,
    mask_loss_weight=0.1,  # exercise the mask loss path
)


def _rand_batch(rng, config, with_masks=True):
    N = config.batch_size
    H, W = config.image_size
    O, T = config.pad_objects_to, config.pad_triples_to
    lo = rng.uniform(0, 0.5, (N, O, 2)).astype(np.float32)
    sz = rng.uniform(0.2, 0.5, (N, O, 2)).astype(np.float32)
    batch = {
        "imgs": rng.randn(N, H, W, 3).astype(np.float32) * 0.3,
        "objs": rng.randint(1, 4, (N, O)).astype(np.int32),
        "boxes": np.concatenate([lo, lo + sz], -1),
        "triples": np.stack(
            [rng.randint(0, 3, (N, T)), rng.randint(0, 3, (N, T)),
             rng.randint(0, 3, (N, T))], -1).astype(np.int32),
        "obj_mask": (rng.rand(N, O) < 0.7).astype(np.float32),
        "triple_mask": (rng.rand(N, T) < 0.7).astype(np.float32),
    }
    batch["obj_mask"][:, :3] = 1.0  # at least 3 real objects
    batch["triple_mask"][:, :2] = 1.0
    if with_masks:
        M = config.mask_size
        batch["masks"] = (rng.rand(N, O, M, M) > 0.5).astype(np.float32)
    return batch


def test_train_smoke_and_determinism(tmp_path):
    config = TrainConfig(**TINY)
    trainer = Trainer(config, VOCAB)
    state = trainer.init_state(seed=0)
    rng = np.random.RandomState(0)
    batch = _rand_batch(rng, config)

    first_l1 = None
    for i in range(8):
        state, metrics = trainer.step(state, dict(batch))
        assert np.isfinite(float(metrics["total_loss"])), metrics
        if first_l1 is None:
            first_l1 = float(metrics["L1_pixel_loss"])
    # Overfitting a single tiny batch must reduce reconstruction loss.
    assert float(metrics["L1_pixel_loss"]) < first_l1
    assert int(state.step) == 8

    # Checkpoint round-trip.
    path = os.path.join(tmp_path, "ckpt")
    trainer.save_checkpoint(state, path)
    trainer2 = Trainer(config, VOCAB)
    restored, meta = trainer2.load_checkpoint(path)
    assert int(restored.step) == 8
    for a, b in zip(jax.tree.leaves(restored.g_vars),
                    jax.tree.leaves(state.g_vars)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Resumed training continues identically to uninterrupted training.
    s_cont, m_cont = trainer.step(state, dict(batch))
    s_res, m_res = trainer2.step(restored, dict(batch))
    np.testing.assert_allclose(float(m_cont["total_loss"]),
                               float(m_res["total_loss"]), rtol=1e-6)


def test_orbax_checkpoint_roundtrip(tmp_path):
    from sg2im_tpu.ckpt.store import load_checkpoint, save_checkpoint

    config = TrainConfig(**TINY)
    trainer = Trainer(config, VOCAB)
    state = trainer.init_state(seed=3)
    rng = np.random.RandomState(4)
    state, _ = trainer.step(state, _rand_batch(rng, config))

    path = os.path.join(tmp_path, "ockpt")
    save_checkpoint(path, state, backend="orbax")
    assert os.path.isdir(os.path.join(path, "state_orbax"))
    restored, _ = load_checkpoint(path, trainer.init_state(seed=0))
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Restored state steps normally.
    s2, m = trainer.step(restored, _rand_batch(rng, config))
    assert np.isfinite(float(m["total_loss"]))


@pytest.mark.parametrize("backend", ["msgpack", "orbax"])
def test_async_checkpoint_roundtrip(tmp_path, backend):
    """wait=False saves overlap the write with training: the state is
    off-device before return, back-to-back saves serialize (second joins
    the first), wait_pending()/load never reads a torso, and the bytes
    equal a synchronous save's."""
    from sg2im_tpu.ckpt import store

    config = TrainConfig(**TINY)
    trainer = Trainer(config, VOCAB)
    state = trainer.init_state(seed=5)
    rng = np.random.RandomState(6)
    state, _ = trainer.step(state, _rand_batch(rng, config))

    path = os.path.join(tmp_path, "ackpt")
    store.save_checkpoint(path, state, backend=backend, wait=False)
    # Training continues (and may donate buffers) while the write runs.
    state2, m = trainer.step(state, _rand_batch(rng, config))
    assert np.isfinite(float(m["total_loss"]))
    # A second async save joins the first, then overwrites with state2.
    store.save_checkpoint(path, state2, backend=backend, wait=False)
    restored, _ = store.load_checkpoint(path, trainer.init_state(seed=0))
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    store.wait_pending()  # idempotent after load already joined


def test_nan_guard_skips_update():
    config = TrainConfig(**TINY)
    trainer = Trainer(config, VOCAB)
    state = trainer.init_state(seed=0)
    rng = np.random.RandomState(1)
    batch = _rand_batch(rng, config)
    bad = dict(batch)
    bad["imgs"] = batch["imgs"] + np.nan

    params_before = jax.tree.map(np.asarray, state.g_vars["params"])
    state2, metrics = trainer.step(state, bad)
    assert bool(metrics["skipped_nonfinite"])
    assert int(state2.step) == 1  # t still advances (train.py:513)
    for a, b in zip(jax.tree.leaves(params_before),
                    jax.tree.leaves(state2.g_vars["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_mode_switch_freezes_bn():
    config = TrainConfig(**dict(TINY, eval_mode_after=2))
    trainer = Trainer(config, VOCAB)
    state = trainer.init_state(seed=0)
    rng = np.random.RandomState(2)
    batch = _rand_batch(rng, config)

    state, _ = trainer.step(state, dict(batch))
    state, _ = trainer.step(state, dict(batch))
    state = trainer.reset_g_optimizer(state)
    stats_before = jax.tree.map(np.asarray, state.g_vars["batch_stats"])
    state, _ = trainer.step(state, dict(batch))  # now in eval mode
    for a, b in zip(jax.tree.leaves(stats_before),
                    jax.tree.leaves(state.g_vars["batch_stats"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.fixture()
def torch04(monkeypatch):
    orig = F.grid_sample

    def gs(input, grid, **kw):
        kw.setdefault("align_corners", True)
        return orig(input, grid, **kw)

    monkeypatch.setattr(F, "grid_sample", gs)


def test_generator_loss_parity_vs_reference(torch04):
    """First-step G total loss (all 7 terms) must equal the reference's
    assembly (train.py:524-550) on identical weights + inputs."""
    from sg2im.discriminators import AcCropDiscriminator as RefAcD
    from sg2im.discriminators import PatchDiscriminator as RefPatchD
    from sg2im.losses import gan_g_loss as ref_gan_g_loss
    from sg2im.model import Sg2ImModel

    config = TrainConfig(**dict(TINY, mask_loss_weight=0.0))
    torch.manual_seed(5)
    ref_g = Sg2ImModel(vocab=VOCAB, **config.generator_kwargs())
    ref_g.eval()  # BN via running stats on both sides for comparability
    ref_do = RefAcD(vocab=VOCAB, **config.d_obj_kwargs())
    ref_di = RefPatchD(**config.d_img_kwargs())
    ref_do.eval()
    ref_di.eval()

    rng = np.random.RandomState(3)
    batch = _rand_batch(rng, config, with_masks=True)
    # Flatten to the reference's ragged layout.
    om = batch["obj_mask"].astype(bool)
    tm = batch["triple_mask"].astype(bool)
    objs_f, boxes_f, o2i, triples_f, masks_f = [], [], [], [], []
    offs, off = [], 0
    for n in range(config.batch_size):
        idx = np.where(om[n])[0]
        remap = {int(i): off + j for j, i in enumerate(idx)}
        objs_f += [batch["objs"][n][i] for i in idx]
        boxes_f += [batch["boxes"][n][i] for i in idx]
        masks_f += [batch["masks"][n][i] for i in idx]
        o2i += [n] * len(idx)
        for t in range(batch["triples"].shape[1]):
            if not tm[n, t]:
                continue
            s, p, o = batch["triples"][n, t]
            # keep only triples whose endpoints are real objects
            if int(s) in remap and int(o) in remap:
                triples_f.append([remap[int(s)], p, remap[int(o)]])
            else:
                tm[n, t] = False
        off += len(idx)
    batch["triple_mask"] = tm.astype(np.float32)
    objs_t = torch.tensor(objs_f, dtype=torch.int64)
    boxes_t = torch.tensor(np.stack(boxes_f))
    masks_t = torch.tensor(np.stack(masks_f))
    triples_t = torch.tensor(np.array(triples_f))
    o2i_t = torch.tensor(o2i)
    imgs_t = torch.from_numpy(
        batch["imgs"].transpose(0, 3, 1, 2)).contiguous()

    with torch.no_grad():
        imgs_pred, boxes_pred, masks_pred, rel_scores = ref_g(
            objs_t, triples_t, o2i_t, boxes_gt=boxes_t, masks_gt=masks_t)
        total_ref = (
            F.l1_loss(imgs_pred, imgs_t) * config.l1_pixel_loss_weight
            + F.mse_loss(boxes_pred, boxes_t) * config.bbox_pred_loss_weight
        )
        sf, ac = ref_do(imgs_pred, objs_t, boxes_t, o2i_t)
        total_ref = total_ref + ac * config.ac_loss_weight
        total_ref = total_ref + ref_gan_g_loss(sf) * (
            config.discriminator_loss_weight * config.d_obj_weight)
        sfi = ref_di(imgs_pred)
        total_ref = total_ref + ref_gan_g_loss(sfi) * (
            config.discriminator_loss_weight * config.d_img_weight)

    # Build my trainer with converted weights, run one step in eval regime
    # (so BN uses running stats on both sides), read total_loss metric.
    config2 = TrainConfig(**dict(TINY, mask_loss_weight=0.0,
                                 eval_mode_after=0))
    trainer = Trainer(config2, VOCAB)
    state = trainer.init_state(seed=0)
    state = state.replace(
        g_vars=convert_generator_state(ref_g.state_dict()),
        d_obj_vars=convert_ac_discriminator_state(ref_do.state_dict()),
        d_img_vars=convert_patch_discriminator_state(ref_di.state_dict()),
    )
    # Discriminators have no BN in TINY arch ('none'? default d_normalization
    # is batch with C3-8-2 arch -> single conv, no norms since first conv).
    state2, metrics = trainer.step(state, dict(batch))
    np.testing.assert_allclose(float(metrics["total_loss"]),
                               float(total_ref), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("gan_type", ["wgan", "lsgan"])
def test_gan_loss_variants_train(gan_type):
    """The wgan/lsgan dispatchers run through the full jitted step."""
    config = TrainConfig(**dict(TINY, gan_loss_type=gan_type))
    trainer = Trainer(config, VOCAB)
    state = trainer.init_state(seed=0)
    rng = np.random.RandomState(5)
    batch = _rand_batch(rng, config)
    for _ in range(2):
        state, m = trainer.step(state, dict(batch))
        assert np.isfinite(float(m["total_loss"])), (gan_type, m)
    assert "d_obj_gan_loss" in m and "d_img_gan_loss" in m


def test_instance_norm_discriminators_train():
    config = TrainConfig(**dict(TINY, d_normalization="instance",
                                d_obj_arch="C3-8-2,C3-8-1",
                                d_img_arch="C3-8-2,C3-8-1"))
    trainer = Trainer(config, VOCAB)
    state = trainer.init_state(seed=0)
    batch = _rand_batch(np.random.RandomState(6), config)
    state, m = trainer.step(state, dict(batch))
    assert np.isfinite(float(m["total_loss"]))


def test_negative_eval_mode_after_never_switches():
    """eval_mode_after=-1 means 'never switch' (reference train.py:466)."""
    config = TrainConfig(**dict(TINY, eval_mode_after=-1))
    trainer = Trainer(config, VOCAB)
    state = trainer.init_state(seed=0)
    batch = _rand_batch(np.random.RandomState(7), config)
    stats_before = jax.tree.map(np.asarray, state.g_vars["batch_stats"])
    state, _ = trainer.step(state, dict(batch))
    # train mode => BN stats must have moved
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(stats_before),
                        jax.tree.leaves(state.g_vars["batch_stats"])))
    assert moved


def test_skippable_adam_matches_optax_adam():
    """SkippableAdam numerics == optax.adam on good steps (checkpoint and
    resume compatibility depends on identical moments/updates)."""
    import optax

    from sg2im_tpu.train.step import SkippableAdam

    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3) / 7.0,
              "b": jnp.float32(-0.3)}
    ref = optax.adam(1e-2, b1=0.9, b2=0.999, eps=1e-8)
    mine = SkippableAdam(1e-2, b1=0.9, b2=0.999, eps=1e-8)
    s_ref, s_mine = ref.init(params), mine.init(params)
    assert (jax.tree.structure(s_ref) == jax.tree.structure(s_mine))
    rng = np.random.RandomState(0)
    for i in range(5):
        grads = jax.tree.map(
            lambda p: jnp.asarray(rng.randn(*np.shape(p)), jnp.float32),
            params)
        u_ref, s_ref = ref.update(grads, s_ref, params)
        u_mine, s_mine = mine.update(grads, s_mine, params,
                                     good=jnp.asarray(True))
        for a, b in zip(jax.tree.leaves(u_ref), jax.tree.leaves(u_mine)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=1e-7)
        for a, b in zip(jax.tree.leaves(s_ref), jax.tree.leaves(s_mine)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=1e-7)
        params = optax.apply_updates(params, u_ref)


def test_skippable_adam_skip_is_exact_noop():
    from sg2im_tpu.train.step import SkippableAdam

    opt = SkippableAdam(1e-2)
    params = {"w": jnp.ones((3,), jnp.float32)}
    state = opt.init(params)
    # one good step to make moments nonzero
    g = {"w": jnp.asarray([1.0, -2.0, 3.0], jnp.float32)}
    _, state = opt.update(g, state, params, good=jnp.asarray(True))
    before = jax.tree.map(np.asarray, state)
    bad_g = {"w": jnp.asarray([np.nan, np.inf, 1.0], jnp.float32)}
    u, state = opt.update(bad_g, state, params, good=jnp.asarray(False))
    np.testing.assert_array_equal(np.asarray(u["w"]), np.zeros(3))
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nan_guard_keeps_optimizer_moments():
    """A skipped step must leave Adam moments/counts bit-identical
    (reference `continue` skips optimizer.step, train.py:552-560)."""
    config = TrainConfig(**TINY)
    trainer = Trainer(config, VOCAB)
    state = trainer.init_state(seed=0)
    rng = np.random.RandomState(1)
    batch = _rand_batch(rng, config)
    state, _ = trainer.step(state, dict(batch))  # one good step
    opts_before = jax.tree.map(
        np.asarray, (state.g_opt, state.d_obj_opt, state.d_img_opt))
    bad = dict(batch)
    bad["imgs"] = batch["imgs"] + np.nan
    state2, metrics = trainer.step(state, bad)
    assert bool(metrics["skipped_nonfinite"])
    opts_after = (state2.g_opt, state2.d_obj_opt, state2.d_img_opt)
    for a, b in zip(jax.tree.leaves(opts_before), jax.tree.leaves(opts_after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nan_guard_is_full_state_noop_and_recovers():
    """The strengthened guard (train/step.py module docstring): a skipped
    step must leave the ENTIRE state — params, optimizer moments, and every
    BatchNorm running stat of G and both Ds — bit-identical (only step/rng
    advance), and the next healthy step must train normally.  Guards the
    two reference recovery holes: NaN forwards poisoning BN running stats,
    and finite-loss/non-finite-grad steps poisoning params (observed: a
    real CPU run died permanently at step 31 of 60 before this fix)."""
    config = TrainConfig(**TINY)
    trainer = Trainer(config, VOCAB)
    state = trainer.init_state(seed=0)
    rng = np.random.RandomState(3)
    batch = _rand_batch(rng, config)
    state, _ = trainer.step(state, dict(batch))  # one good step

    def snap(s):
        return jax.tree.map(np.asarray, (
            s.g_vars, s.d_obj_vars, s.d_img_vars,
            s.g_opt, s.d_obj_opt, s.d_img_opt))

    before = snap(state)
    bad = dict(batch)
    bad["imgs"] = batch["imgs"] + np.nan  # NaN forward through every path
    state2, metrics = trainer.step(state, bad)
    assert bool(metrics["skipped_nonfinite"])
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(snap(state2))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # recovery: the next clean step trains from the last healthy state
    state3, m3 = trainer.step(state2, dict(batch))
    assert not bool(m3["skipped_nonfinite"])
    assert np.isfinite(float(m3["total_loss"]))
    changed = any(
        not np.array_equal(a, b) for a, b in zip(
            jax.tree.leaves(before[0]), jax.tree.leaves(state3.g_vars)))
    assert changed  # the good step actually updated the generator


def test_nonfinite_grads_skip_update():
    """SkippableAdam + the step's _all_finite gate: gradients containing
    inf/NaN (even when the loss scalar is finite) must not touch params or
    moments — hole (a) in the module docstring."""
    from sg2im_tpu.train.step import SkippableAdam, _all_finite

    opt = SkippableAdam(1e-3)
    params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    st = opt.init(params)
    grads = {"w": jnp.full((4,), jnp.inf), "b": jnp.ones((2,))}
    good = _all_finite(grads)
    assert not bool(good)
    upd, st2 = opt.update(grads, st, good=good)
    assert all(float(np.abs(np.asarray(u)).max()) == 0.0
               for u in jax.tree.leaves(upd))
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert bool(_all_finite({"w": jnp.ones((3,))}))


def test_bce_backward_finite_at_sigmoid_saturation():
    """Regression for a jit-only NaN observed at step 30 of a real run:
    f32 ``sigmoid(x) == 1.0`` exactly for x >~ 16.6, and the unclamped
    BCE-on-probs backward then pairs a ~1e12 ``1/(1-p+eps)`` term with
    the sigmoid's ``p*(1-p) == 0`` VJP factor — eager cancels to 0, but
    XLA's fused backward produced ``0 * inf = NaN`` (finite loss, NaN
    grads, GCN params poisoned).  losses.binary_cross_entropy now clamps
    probs to [1e-7, 1-1e-7]; the grad must be finite under BOTH
    dispatch modes and the forward within 2e-4 of torch."""
    from sg2im_tpu import losses as L

    rng = np.random.RandomState(0)
    scores = jnp.asarray(rng.randn(4, 6, 8, 8) * 2.0, jnp.float32)
    # saturate a block well past the f32 sigmoid cliff (observed: 17.27)
    scores = scores.at[0].set(20.0).at[1].set(-20.0)
    targets = jnp.asarray((rng.rand(4, 6, 8, 8) > 0.5), jnp.float32)
    mask = jnp.asarray(rng.rand(4, 6) > 0.3, jnp.float32)

    def loss(s):
        return L.binary_cross_entropy(jax.nn.sigmoid(s), targets, mask)

    g_eager = jax.grad(loss)(scores)
    g_jit = jax.jit(jax.grad(loss))(scores)
    assert bool(jnp.isfinite(g_eager).all())
    assert bool(jnp.isfinite(g_jit).all())
    # Forward parity vs torch on the UNSATURATED blocks (|score| <= ~8,
    # clamp provably inactive).  At exact saturation both frameworks make
    # arbitrary bounded choices for an infinite loss (torch clamps log at
    # -100, we clamp p at 1e-7) — no parity contract there, only
    # finiteness (asserted above).
    from sg2im_tpu import losses as L

    v = float(L.binary_cross_entropy(jax.nn.sigmoid(scores[2:]),
                                     targets[2:], mask[2:]))
    ref = F.binary_cross_entropy(
        torch.sigmoid(torch.from_numpy(np.asarray(scores[2:]))),
        torch.from_numpy(np.asarray(targets[2:])),
        reduction="none")
    m = torch.from_numpy(
        np.asarray(mask[2:]))[:, :, None, None].expand_as(ref)
    ref_v = float((ref * m).sum() / m.sum())
    assert abs(v - ref_v) < 2e-4


def test_d_clip_bounds_discriminator_params():
    """--d_clip (WGAN weight clip): D params bounded after each step; G
    params unaffected by the clip."""
    config = TrainConfig(**dict(TINY, gan_loss_type="wgan", d_clip=0.01))
    trainer = Trainer(config, VOCAB)
    state = trainer.init_state(seed=0)
    rng = np.random.RandomState(2)
    for i in range(2):
        state, m = trainer.step(state, _rand_batch(rng, config))
        assert np.isfinite(float(m["total_loss"]))
    for leaf in jax.tree.leaves(state.d_obj_vars["params"]):
        assert float(jnp.abs(leaf).max()) <= 0.01 + 1e-7
    for leaf in jax.tree.leaves(state.d_img_vars["params"]):
        assert float(jnp.abs(leaf).max()) <= 0.01 + 1e-7
