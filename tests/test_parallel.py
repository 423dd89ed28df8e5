"""Data-parallel sharding tests on the virtual 8-device CPU mesh.

Verifies the jitted GAN train step compiles and runs with the batch sharded
over the 'data' mesh axis, and that sharded results numerically match the
single-device run (XLA/GSPMD inserts the gradient all-reduces)."""

import numpy as np

import jax

from sg2im_tpu.parallel.mesh import make_mesh
from sg2im_tpu.train.config import TrainConfig
from sg2im_tpu.train.trainer import Trainer
from tests.test_train import TINY, VOCAB, _rand_batch


def test_sharded_step_matches_single_device():
    assert len(jax.devices()) == 8, jax.devices()
    config = TrainConfig(**dict(TINY, batch_size=8))
    rng = np.random.RandomState(0)
    batch = _rand_batch(rng, config)

    t_single = Trainer(config, VOCAB, mesh=False)
    t_single.mesh = None
    s1 = t_single.init_state(seed=0)
    s1, m1 = t_single.step(s1, dict(batch))

    mesh = make_mesh(n_data=8)
    t_shard = Trainer(config, VOCAB, mesh=mesh)
    s8 = t_shard.init_state(seed=0)
    s8, m8 = t_shard.step(s8, dict(batch))

    # f32 reduction order differs across shards; tolerances reflect that.
    for k in m1:
        np.testing.assert_allclose(
            np.float64(m1[k]), np.float64(m8[k]), rtol=5e-2, atol=5e-4,
            err_msg=f"metric {k} diverged under sharding")
    # Parameters after one update agree to within a fraction of the Adam
    # step size (lr=1e-4).
    l1 = jax.tree.leaves(s1.g_vars["params"])
    l8 = jax.tree.leaves(s8.g_vars["params"])
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
