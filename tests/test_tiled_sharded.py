"""Mesh-sharded tiled inference: tiles distributed over the 8-device CPU mesh
must reproduce the single-device stitch exactly."""

import jax.numpy as jnp
import numpy as np

from fbanet_tpu.parallel.mesh import make_mesh
from fbanet_tpu.tiled import tiled_forward


def _fake_model(batch):
    # x4 nearest upsample of frame 0 — deterministic, shape-correct
    return jnp.repeat(jnp.repeat(batch[:, 0], 4, axis=1), 4, axis=2)


def test_sharded_tiles_match_single_device():
    rng = np.random.default_rng(0)
    burst = rng.uniform(size=(3, 96, 128, 3)).astype(np.float32)
    plain = tiled_forward(_fake_model, burst, psize=16, overlap=8, scale=4)
    sharded = tiled_forward(_fake_model, burst, psize=16, overlap=8, scale=4,
                            mesh=make_mesh())
    np.testing.assert_allclose(plain, sharded, atol=1e-6)


def test_sharded_tiles_pad_to_mesh():
    """Tile count not divisible by the mesh size still works (padding)."""
    rng = np.random.default_rng(1)
    burst = rng.uniform(size=(2, 48, 48, 1)).astype(np.float32)  # 9 tiles
    mesh = make_mesh()
    out = tiled_forward(_fake_model, burst, psize=16, overlap=8, scale=4,
                        mesh=mesh)
    expected = np.repeat(np.repeat(burst[0], 4, axis=0), 4, axis=1)
    np.testing.assert_allclose(out, expected, atol=1e-6)
