"""Golden tests for the warp ops against jax.scipy map_coordinates and OpenCV."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbanet_tpu.ops.warp import (
    homography_coords,
    warp_burst_homography,
    warp_flow,
    warp_image,
)


def _rand_image(h=32, w=40, c=3, seed=0):
    return np.random.default_rng(seed).uniform(size=(h, w, c)).astype(np.float32)


def test_identity_homography_is_noop():
    img = jnp.asarray(_rand_image())
    out = warp_burst_homography(img[None], jnp.eye(3)[None])
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(img), atol=1e-6)


def test_integer_translation_shifts_pixels():
    img = jnp.asarray(_rand_image())
    # M maps output coords -> source coords; x_src = x_dst + 3, y_src = y_dst + 2
    m = jnp.asarray([[1, 0, 3], [0, 1, 2], [0, 0, 1]], jnp.float32)
    out = np.asarray(warp_burst_homography(img[None], m[None])[0])
    np.testing.assert_allclose(out[:-2, :-3], np.asarray(img)[2:, 3:], atol=1e-6)


def test_bilinear_matches_map_coordinates():
    img = _rand_image(24, 24, 2, seed=1)
    rng = np.random.default_rng(2)
    coords = np.stack(np.meshgrid(np.arange(24.0), np.arange(24.0),
                                  indexing="ij"), -1)
    coords = (coords + rng.uniform(-3, 3, size=coords.shape)).astype(np.float32)
    ours = np.asarray(warp_image(jnp.asarray(img), jnp.asarray(coords)))
    for ch in range(2):
        ref = jax.scipy.ndimage.map_coordinates(
            jnp.asarray(img[..., ch]),
            [jnp.asarray(coords[..., 0]), jnp.asarray(coords[..., 1])],
            order=1, mode="nearest")
        np.testing.assert_allclose(ours[..., ch], np.asarray(ref), atol=1e-5)


def test_flow_warp_matches_reference_prototype():
    """grid - flow backward-warp semantics (reference:
    fba_net/registration/optical_flow/register.py:34-41)."""
    img = _rand_image(16, 16, 3, seed=3)
    flow = np.random.default_rng(4).uniform(-2, 2, size=(16, 16, 2)).astype(np.float32)
    ours = np.asarray(warp_flow(jnp.asarray(img), jnp.asarray(flow)))
    ys, xs = np.meshgrid(np.arange(16.0), np.arange(16.0), indexing="ij")
    for ch in range(3):
        ref = jax.scipy.ndimage.map_coordinates(
            jnp.asarray(img[..., ch]),
            [jnp.asarray(ys - flow[..., 1]), jnp.asarray(xs - flow[..., 0])],
            order=1, mode="nearest")
        np.testing.assert_allclose(ours[..., ch], np.asarray(ref), atol=1e-5)


def test_homography_matches_opencv():
    cv2 = pytest.importorskip("cv2")
    img = _rand_image(48, 48, 3, seed=5)
    m = np.array([[1.01, 0.02, 1.5], [-0.015, 0.99, -2.3], [1e-5, -2e-5, 1.0]],
                 np.float32)
    ours = np.asarray(warp_burst_homography(
        jnp.asarray(img)[None], jnp.asarray(m)[None], mode="constant")[0])
    ref = cv2.warpPerspective(img, m, (48, 48),
                              flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
                              borderMode=cv2.BORDER_CONSTANT)
    # interior only: border handling differs by half a pixel at the edge
    np.testing.assert_allclose(ours[2:-2, 2:-2], ref[2:-2, 2:-2], atol=2e-3)


def test_affine_2x3_matches_opencv():
    cv2 = pytest.importorskip("cv2")
    img = _rand_image(40, 40, 1, seed=6)
    m = np.array([[1.0, 0.01, 0.7], [-0.02, 1.0, 1.2]], np.float32)
    ours = np.asarray(warp_burst_homography(
        jnp.asarray(img)[None], jnp.asarray(m)[None], mode="constant")[0])
    ref = cv2.warpAffine(img[..., 0], m, (40, 40),
                         flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
                         borderMode=cv2.BORDER_CONSTANT)
    np.testing.assert_allclose(ours[2:-2, 2:-2, 0], ref[2:-2, 2:-2], atol=2e-3)


def test_bicubic_matches_opencv_interior():
    cv2 = pytest.importorskip("cv2")
    img = _rand_image(40, 40, 1, seed=7)
    m = np.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.25], [0, 0, 1.0]], np.float32)
    ours = np.asarray(warp_burst_homography(
        jnp.asarray(img)[None], jnp.asarray(m)[None], interp="bicubic")[0])
    ref = cv2.warpPerspective(img[..., 0], m, (40, 40),
                              flags=cv2.INTER_CUBIC | cv2.WARP_INVERSE_MAP,
                              borderMode=cv2.BORDER_REPLICATE)
    np.testing.assert_allclose(ours[3:-3, 3:-3, 0], ref[3:-3, 3:-3], atol=3e-3)


def test_batched_burst_api():
    burst = jnp.asarray(np.random.default_rng(8).uniform(
        size=(2, 4, 16, 16, 3)).astype(np.float32))
    mats = jnp.broadcast_to(jnp.eye(3), (2, 4, 3, 3))
    out = warp_burst_homography(burst, mats)
    assert out.shape == burst.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(burst), atol=1e-6)


def test_warp_is_jittable_and_differentiable():
    img = jnp.asarray(_rand_image(16, 16, 1, seed=9))

    def loss(shift):
        m = jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32)
        m = m.at[0, 2].set(shift)
        return jnp.sum(warp_burst_homography(img[None], m[None]) ** 2)

    g = jax.jit(jax.grad(loss))(0.3)
    assert np.isfinite(float(g))


def test_homography_coords_projective_division():
    m = np.eye(3, dtype=np.float32)
    m[2, 0] = 0.01  # projective term
    coords = np.asarray(homography_coords(jnp.asarray(m), 8, 8))
    # at x=4: w = 1 + 0.04 -> x_src = 4/1.04
    np.testing.assert_allclose(coords[0, 4, 1], 4 / 1.04, rtol=1e-5)
