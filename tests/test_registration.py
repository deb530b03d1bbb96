"""Tests for on-device ECC registration: recover known synthetic transforms,
cross-check against OpenCV, and verify the burst alignment end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbanet_tpu.ops.registration import (
    align_burst,
    ecc_align,
    identity_params,
    matrix_to_params,
    params_to_matrix,
    rgb_to_gray,
)
from fbanet_tpu.ops.warp import warp_burst_homography


def _smooth_test_image(h=96, w=96, seed=0):
    """A smooth random image (band-limited) so subpixel alignment is well-posed."""
    rng = np.random.default_rng(seed)
    small = rng.uniform(size=(h // 8, w // 8)).astype(np.float32)
    img = jax.image.resize(jnp.asarray(small), (h, w), method="bicubic")
    return np.asarray(img)


def _shifted(img, mat):
    """Warp forward: produce a 'frame' that ecc should align back."""
    return np.asarray(warp_burst_homography(
        jnp.asarray(img)[None, ..., None], jnp.asarray(mat)[None])[0, ..., 0])


def test_param_matrix_roundtrip():
    for motion in ("translation", "euclidean", "affine", "homography"):
        p0 = identity_params(motion)
        m = params_to_matrix(p0, motion)
        np.testing.assert_allclose(np.asarray(m), np.eye(3), atol=1e-7)
        p1 = matrix_to_params(m, motion)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), atol=1e-7)


def test_rgb_to_gray_rec601():
    img = np.zeros((2, 2, 3), np.float32)
    img[..., 0] = 1.0
    assert np.allclose(np.asarray(rgb_to_gray(jnp.asarray(img))), 0.299)


def test_ecc_recovers_translation():
    img = _smooth_test_image()
    true = np.array([[1, 0, 2.5], [0, 1, -1.7], [0, 0, 1]], np.float32)
    moved = _shifted(img, true)
    m, rho = ecc_align(jnp.asarray(img), jnp.asarray(moved),
                       motion="translation", levels=3, iters_per_level=30)
    m = np.asarray(m)
    assert float(rho) > 0.99
    # the aligning matrix is the inverse of the forward warp used to create
    # `moved` (both use the output->source inverse-map convention)
    np.testing.assert_allclose(m[0, 2], -2.5, atol=0.05)
    np.testing.assert_allclose(m[1, 2], 1.7, atol=0.05)


def test_ecc_recovers_euclidean():
    img = _smooth_test_image(seed=1)
    th = 0.02
    c, s = np.cos(th), np.sin(th)
    true = np.array([[c, -s, 1.2], [s, c, -0.8], [0, 0, 1]], np.float32)
    moved = _shifted(img, true)
    m, rho = ecc_align(jnp.asarray(img), jnp.asarray(moved),
                       motion="euclidean", levels=3, iters_per_level=40)
    m = np.asarray(m)
    assert float(rho) > 0.99
    np.testing.assert_allclose(m, np.linalg.inv(true), atol=0.08)


def test_ecc_recovers_affine():
    img = _smooth_test_image(seed=2)
    true = np.array([[1.01, 0.015, 0.9], [-0.01, 0.99, 1.4], [0, 0, 1]],
                    np.float32)
    moved = _shifted(img, true)
    m, rho = ecc_align(jnp.asarray(img), jnp.asarray(moved), motion="affine",
                       levels=3, iters_per_level=40)
    assert float(rho) > 0.99
    np.testing.assert_allclose(np.asarray(m), np.linalg.inv(true), atol=0.08)


def test_ecc_recovers_homography():
    img = _smooth_test_image(h=128, w=128, seed=3)
    true = np.array([[1.005, 0.01, 1.1], [-0.008, 1.0, -0.9],
                     [2e-5, -1e-5, 1]], np.float32)
    moved = _shifted(img, true)
    m, rho = ecc_align(jnp.asarray(img), jnp.asarray(moved),
                       motion="homography", levels=3, iters_per_level=50)
    assert float(rho) > 0.99
    # compare action on corner points rather than raw entries
    pts = np.array([[0, 0, 1], [127, 0, 1], [0, 127, 1], [127, 127, 1]],
                   np.float32).T
    ours, ref = np.asarray(m) @ pts, np.linalg.inv(true) @ pts
    np.testing.assert_allclose(ours[:2] / ours[2], ref[:2] / ref[2], atol=0.35)


def test_ecc_close_to_opencv_translation():
    cv2 = pytest.importorskip("cv2")
    img = _smooth_test_image(seed=4)
    true = np.array([[1, 0, 1.8], [0, 1, 2.2], [0, 0, 1]], np.float32)
    moved = _shifted(img, true)
    warp = np.eye(2, 3, dtype=np.float32)
    _, warp = cv2.findTransformECC(
        img, moved, warp, cv2.MOTION_TRANSLATION,
        (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 100, 1e-8))
    m, _ = ecc_align(jnp.asarray(img), jnp.asarray(moved),
                     motion="translation", levels=3, iters_per_level=30)
    np.testing.assert_allclose(np.asarray(m)[:2, 2], warp[:2, 2], atol=0.05)


def test_align_burst_end_to_end():
    """Misaligned synthetic burst -> align -> frames match the reference frame."""
    base = _smooth_test_image(seed=5)
    rng = np.random.default_rng(6)
    frames, f = [base], 4
    for _ in range(f - 1):
        t = np.eye(3, dtype=np.float32)
        t[0, 2], t[1, 2] = rng.uniform(-3, 3, size=2)
        frames.append(_shifted(base, t))
    burst = jnp.asarray(np.stack(frames))[..., None]  # [F, H, W, 1]

    aligned, mats, rhos = align_burst(burst, motion="translation",
                                      levels=3, iters_per_level=30)
    assert aligned.shape == burst.shape
    np.testing.assert_array_equal(np.asarray(aligned[0]), np.asarray(burst[0]))
    np.testing.assert_allclose(np.asarray(mats[0]), np.eye(3), atol=1e-6)
    # interior mse must collapse vs the unaligned burst
    crop = (slice(None), slice(8, -8), slice(8, -8), slice(None))
    before = np.mean((np.asarray(burst[1:]) - np.asarray(burst[0]))[..., 8:-8, 8:-8, :] ** 2)
    after = np.mean((np.asarray(aligned[1:])[crop] - np.asarray(burst[0])[crop[1:]]) ** 2)
    assert after < before * 0.05
    assert np.all(np.asarray(rhos) > 0.98)


def test_align_burst_batched():
    base = _smooth_test_image(h=64, w=64, seed=7)
    t = np.array([[1, 0, 1.0], [0, 1, -1.0], [0, 0, 1]], np.float32)
    burst = np.stack([base, _shifted(base, t)])[..., None]
    batch = jnp.asarray(np.stack([burst, burst]))  # [2, F, H, W, 1]
    aligned, mats, rhos = align_burst(batch, motion="translation",
                                      levels=2, iters_per_level=20)
    assert aligned.shape == batch.shape
    assert mats.shape == (2, 2, 3, 3)
    np.testing.assert_allclose(np.asarray(mats[0]), np.asarray(mats[1]),
                               atol=1e-5)


def test_ecc_identity_on_identical_images():
    img = _smooth_test_image(seed=8)
    m, rho = ecc_align(jnp.asarray(img), jnp.asarray(img),
                       motion="translation", levels=2, iters_per_level=10)
    np.testing.assert_allclose(np.asarray(m), np.eye(3), atol=1e-3)
    assert float(rho) > 0.9999


def test_online_register_ecc_improves_alignment():
    """The in-step registration stage (DALI-graph parity) must reduce
    frame-to-reference error inside a jitted function."""
    base = _smooth_test_image(h=64, w=64, seed=9)
    t = np.array([[1, 0, 2.0], [0, 1, -1.5], [0, 0, 1]], np.float32)
    burst = np.stack([base, _shifted(base, t)])[..., None]
    batch = jnp.asarray(burst)[None]  # [1, F, H, W, 1]

    from fbanet_tpu.ops.registration import online_register

    aligned = jax.jit(lambda b: online_register(b, "ecc"))(batch)
    ref = np.asarray(batch[0, 0])[8:-8, 8:-8]
    before = np.mean((np.asarray(batch[0, 1:])[:, 8:-8, 8:-8] - ref) ** 2)
    after = np.mean((np.asarray(aligned[0, 1:])[:, 8:-8, 8:-8] - ref) ** 2)
    assert after < before * 0.1


def test_online_register_stops_gradients():
    from fbanet_tpu.ops.registration import online_register

    base = _smooth_test_image(h=32, w=32, seed=10)
    batch = jnp.asarray(np.stack([base, base]))[None, ..., None]

    def loss(b):
        return jnp.sum(online_register(b, "ecc") ** 2)

    g = jax.grad(loss)(batch)
    assert float(jnp.abs(g).max()) == 0.0  # registration is preprocessing


def test_ecc_recovers_similarity():
    """Similarity = rotation + uniform scale + translation (the reference's
    cv2.reg MapperGradSimilar, fba_net/registration/pyramid.py:52-64)."""
    img = _smooth_test_image(seed=11)
    th, sc = 0.015, 1.01
    c, s = sc * np.cos(th), sc * np.sin(th)
    true = np.array([[c, -s, 1.0], [s, c, -0.7], [0, 0, 1]], np.float32)
    moved = _shifted(img, true)
    m, rho = ecc_align(jnp.asarray(img), jnp.asarray(moved),
                       motion="similarity", levels=3, iters_per_level=40)
    assert float(rho) > 0.99
    np.testing.assert_allclose(np.asarray(m), np.linalg.inv(true), atol=0.08)
    # structure preserved: m[0,0]==m[1,1], m[0,1]==-m[1,0]
    m = np.asarray(m)
    assert abs(m[0, 0] - m[1, 1]) < 1e-5 and abs(m[0, 1] + m[1, 0]) < 1e-5


def test_ecc_eps_termination_matches_fixed_iters():
    """cv2-style eps termination (r3): on a converged pair, the eps run
    reaches the same transform as the full fixed-iteration run, and a huge
    eps stops immediately after the first increment (different, worse
    alignment) — proving the while_loop actually gates on the correlation
    increment. Also exercised under vmap (align_burst)."""
    import jax

    from fbanet_tpu.ops.registration import align_burst, ecc_align

    rng = np.random.default_rng(42)
    hr = rng.uniform(size=(96, 96)).astype(np.float32)
    # smooth it so gradients are informative
    k = np.ones((5, 5), np.float32) / 25.0
    from numpy.lib.stride_tricks import sliding_window_view

    sm = sliding_window_view(np.pad(hr, 2, mode="edge"), (5, 5))
    template = jnp.asarray((sm * k).sum((-1, -2)))
    image = jnp.asarray(np.roll(np.asarray(template), (2, -2), axis=(0, 1)))

    m_fixed, rho_fixed = jax.jit(
        lambda t, i: ecc_align(t, i, motion="translation", levels=2,
                               iters_per_level=30))(template, image)
    m_eps, rho_eps = jax.jit(
        lambda t, i: ecc_align(t, i, motion="translation", levels=2,
                               iters_per_level=30, eps=1e-7))(template, image)
    assert float(rho_fixed) > 0.97
    np.testing.assert_allclose(np.asarray(m_eps), np.asarray(m_fixed),
                               atol=2e-3)

    # a huge eps terminates after ~1 iteration: visibly different transform
    m_1, _ = jax.jit(
        lambda t, i: ecc_align(t, i, motion="translation", levels=2,
                               iters_per_level=30, eps=10.0))(template, image)
    assert not np.allclose(np.asarray(m_1), np.asarray(m_fixed), atol=1e-3)

    # batched path (vmap over frames/bursts) compiles and runs with eps
    burst = jnp.stack([template[None].repeat(3, 0)] * 1)[..., None]
    burst = jnp.repeat(burst, 3, axis=-1)  # [1, 3, H, W, 3]
    aligned, mats, rhos = jax.jit(
        lambda b: align_burst(b, motion="translation", levels=2,
                              iters_per_level=10, eps=1e-6))(burst)
    assert aligned.shape == burst.shape
    assert np.all(np.isfinite(np.asarray(mats)))
