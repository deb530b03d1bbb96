"""Pallas warp kernel tests (interpreter mode on CPU; the same kernels are
benchmarked against the XLA path on real TPU — see ops/warp_pallas.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from fbanet_tpu.ops.warp import warp_burst_homography, warp_image
from fbanet_tpu.ops.warp_pallas import (
    warp_burst_bilinear_pallas,
    warp_burst_coords_pallas,
)


@pytest.fixture(autouse=True)
def _interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def _burst(f=3, h=32, w=40, c=3, seed=0):
    return jnp.asarray(np.random.default_rng(seed).uniform(
        size=(f, h, w, c)).astype(np.float32))


def test_homography_kernel_matches_xla():
    frames = _burst()
    rng = np.random.default_rng(1)
    mats = np.tile(np.eye(3, dtype=np.float32), (3, 1, 1))
    mats[:, 0, 2] = rng.uniform(-2, 2, 3)
    mats[:, 1, 2] = rng.uniform(-2, 2, 3)
    mats[:, 0, 1] = rng.uniform(-0.02, 0.02, 3)
    out_p = warp_burst_bilinear_pallas(frames, jnp.asarray(mats))
    out_x = warp_burst_homography(frames, jnp.asarray(mats))
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=1e-4)


def test_coords_kernel_matches_xla():
    frames = _burst(seed=2)
    coords = jnp.asarray(np.random.default_rng(3).uniform(
        0, 31, size=(3, 32, 40, 2)).astype(np.float32))
    out_p = warp_burst_coords_pallas(frames, coords)
    out_x = jax.vmap(warp_image)(frames, coords)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=1e-4)


def test_identity_is_noop():
    frames = _burst(seed=4)
    mats = jnp.broadcast_to(jnp.eye(3), (3, 3, 3))
    out = warp_burst_bilinear_pallas(frames, mats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(frames), atol=1e-5)


def test_constant_mode_masks_outside():
    frames = jnp.ones((1, 16, 16, 1), jnp.float32)
    m = jnp.asarray([[1, 0, 100.0], [0, 1, 0], [0, 0, 1]])[None]
    out = warp_burst_bilinear_pallas(frames, m, mode="constant", cval=0.0)
    assert float(jnp.abs(out).max()) == 0.0
