"""Tile/stitch round-trip tests and tiled-inference consistency."""

import jax.numpy as jnp
import numpy as np

from fbanet_tpu.tiled import (
    compute_tile_layout,
    divide_burst,
    merge_tiles,
    tiled_forward,
)


def test_layout_exact_division():
    assert compute_tile_layout(160, 160, 80) == (0, 0, 2, 2)
    assert compute_tile_layout(100, 170, 80) == (60, 70, 2, 3)


def test_divide_merge_roundtrip_exact_multiple():
    rng = np.random.default_rng(0)
    burst = rng.uniform(size=(3, 160, 240, 3)).astype(np.float32)
    tiles = divide_burst(burst, 80, 40)
    assert tiles.shape == (2 * 3, 3, 160, 160, 3)
    # identity "model": HR tile = frame 0 of the LR tile (scale 1)
    hr_tiles = tiles[:, 0]
    merged = merge_tiles(hr_tiles, 160, 240, 80, 40)
    np.testing.assert_allclose(merged, burst[0], atol=1e-7)


def test_divide_merge_roundtrip_with_remainder():
    rng = np.random.default_rng(1)
    burst = rng.uniform(size=(2, 130, 190, 3)).astype(np.float32)
    tiles = divide_burst(burst, 80, 40)
    assert tiles.shape[0] == 2 * 3  # ceil(130/80) x ceil(190/80)
    merged = merge_tiles(tiles[:, 0], 130, 190, 80, 40)
    np.testing.assert_allclose(merged, burst[0], atol=1e-7)


def test_tiled_forward_identity_scale_model():
    """A fake x4 'model' that nearest-upsamples frame 0 must reproduce the
    nearest-upsampled image exactly after stitching (halo discarded)."""
    rng = np.random.default_rng(2)
    burst = rng.uniform(size=(3, 96, 60, 3)).astype(np.float32)

    def apply_fn(batch):  # [B,F,t,t,C] -> [B,4t,4t,C]
        ref = batch[:, 0]
        return jnp.repeat(jnp.repeat(ref, 4, axis=1), 4, axis=2)

    sr = tiled_forward(apply_fn, burst, psize=16, overlap=8, scale=4)
    expected = np.repeat(np.repeat(burst[0], 4, axis=0), 4, axis=1)
    assert sr.shape == (384, 240, 3)
    np.testing.assert_allclose(sr, expected, atol=1e-6)


def test_tiled_forward_tile_batching_equivalent():
    rng = np.random.default_rng(3)
    burst = rng.uniform(size=(2, 64, 64, 1)).astype(np.float32)

    def apply_fn(batch):
        return jnp.repeat(jnp.repeat(batch[:, 0] * 2.0, 4, 1), 4, 2)

    full = tiled_forward(apply_fn, burst, psize=16, overlap=8, scale=4)
    chunked = tiled_forward(apply_fn, burst, psize=16, overlap=8, scale=4,
                            tile_batch=3)
    np.testing.assert_allclose(full, chunked, atol=1e-6)


def test_training_patch_shape_reuse():
    """80 core + 2x40 halo = 160: every tile matches the training shape
    (SURVEY.md §3.4's key property)."""
    burst = np.zeros((14, 300, 500, 3), np.float32)
    tiles = divide_burst(burst, 80, 40)
    assert tiles.shape[2:] == (160, 160, 3)
