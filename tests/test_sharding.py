"""Multi-device data-parallel tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from fbanet_tpu.config import ModelConfig, TrainConfig
from fbanet_tpu.models import init_model
from fbanet_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from fbanet_tpu.train import make_optimizer, make_train_step

TINY = ModelConfig(num_frames=2, img_size=16, embed_dim=8, window_size=4,
                   heads=(1, 2, 4, 8, 4, 4, 2, 2, 2), dtype="float32",
                   drop_path_rate=0.0)


def test_mesh_has_8_virtual_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 CPU devices


def test_batch_sharded_across_devices():
    mesh = make_mesh()
    x = np.zeros((16, 4, 4), np.float32)
    sharded = jax.device_put(x, batch_sharding(mesh))
    assert len(sharded.addressable_shards) == 8
    assert sharded.addressable_shards[0].data.shape == (2, 4, 4)


def test_train_step_matches_single_device():
    """One sharded data-parallel step == the same step on one device.

    Loss and gradients must agree to float tolerance (Adam-normalized
    updates would amplify reduction-order noise of near-zero gradients into
    +-lr sign flips, so we compare gradients, not post-Adam params).
    """
    mesh = make_mesh()
    model, params = init_model(TINY, jax.random.key(0))

    from fbanet_tpu.losses import fbanet_training_loss

    @jax.jit
    def loss_and_grad(p, lr_burst, hr):
        def f(p):
            pred = model.apply(p, lr_burst, deterministic=True)
            return fbanet_training_loss(pred, hr)
        return jax.value_and_grad(f)(p)

    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.uniform(size=(8, 2, 16, 16, 3)).astype(np.float32))
    hr = jnp.asarray(rng.uniform(size=(8, 64, 64, 3)).astype(np.float32))

    loss1, g1 = loss_and_grad(params, lr, hr)

    lr_sh = jax.device_put(lr, batch_sharding(mesh))
    hr_sh = jax.device_put(hr, batch_sharding(mesh))
    p_repl = jax.device_put(params, replicated_sharding(mesh))
    loss2, g2 = loss_and_grad(p_repl, lr_sh, hr_sh)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    # tolerance keyed to the global gradient scale: reduction-order noise on
    # a numerically-zero leaf is not a sharding bug
    gscale = max(float(np.abs(np.asarray(x)).max()) for x in jax.tree.leaves(g1))
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5 * gscale)


def test_shard_batch_helper():
    mesh = make_mesh()
    batch = {"LR": np.zeros((8, 2, 4, 4, 3), np.float32),
             "HR": np.zeros((8, 16, 16, 3), np.float32)}
    out = shard_batch(batch, mesh)
    assert len(out["LR"].addressable_shards) == 8
