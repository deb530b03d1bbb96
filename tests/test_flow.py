"""Optical-flow tests: recover known translations, warp consistency, vis."""

import jax.numpy as jnp
import numpy as np

from fbanet_tpu.ops.flow import burst_optical_flow, flow_to_image, optical_flow
from fbanet_tpu.ops.warp import warp_flow


def _smooth(h=64, w=64, seed=0):
    import jax

    rng = np.random.default_rng(seed)
    small = rng.uniform(size=(h // 8, w // 8)).astype(np.float32)
    return np.asarray(jax.image.resize(jnp.asarray(small), (h, w),
                                       method="bicubic"))


def _translate(img, dy, dx):
    ys = np.clip(np.arange(img.shape[0]) + dy, 0, img.shape[0] - 1)
    xs = np.clip(np.arange(img.shape[1]) + dx, 0, img.shape[1] - 1)
    y0 = np.floor(ys).astype(int).clip(0, img.shape[0] - 2)
    x0 = np.floor(xs).astype(int).clip(0, img.shape[1] - 2)
    fy, fx = (ys - y0)[:, None], (xs - x0)[None, :]
    return ((img[y0][:, x0] * (1 - fx) + img[y0][:, x0 + 1] * fx) * (1 - fy)
            + (img[y0 + 1][:, x0] * (1 - fx) + img[y0 + 1][:, x0 + 1] * fx) * fy)


def test_flow_recovers_constant_translation():
    ref = _smooth(seed=1)
    tgt = _translate(ref, 1.5, -2.0).astype(np.float32)
    flow = np.asarray(optical_flow(jnp.asarray(ref), jnp.asarray(tgt),
                                   levels=3, iters_per_level=8))
    interior = flow[12:-12, 12:-12]
    # warp_flow samples target at grid - flow, and target(y', x') =
    # ref(y'+1.5, x'-2); aligning requires target(y - fy, x - fx) == ref(y, x)
    # -> fx = -2.0, fy = +1.5 (the DALI remap `grid - flow` convention,
    # reference: fba_net/pipeline/real_bsr_iterator.py:121-166)
    assert abs(np.median(interior[..., 0]) + 2.0) < 0.35
    assert abs(np.median(interior[..., 1]) - 1.5) < 0.35


def test_flow_warp_reduces_error():
    ref = _smooth(seed=2)
    tgt = _translate(ref, -2.2, 1.3).astype(np.float32)
    flow = optical_flow(jnp.asarray(ref), jnp.asarray(tgt), levels=3,
                        iters_per_level=8)
    warped = np.asarray(warp_flow(jnp.asarray(tgt)[..., None], flow)[..., 0])
    before = np.mean((tgt[8:-8, 8:-8] - ref[8:-8, 8:-8]) ** 2)
    after = np.mean((warped[8:-8, 8:-8] - ref[8:-8, 8:-8]) ** 2)
    assert after < before * 0.15


def test_flow_zero_for_identical_frames():
    ref = _smooth(seed=3)
    flow = np.asarray(optical_flow(jnp.asarray(ref), jnp.asarray(ref),
                                   levels=2, iters_per_level=4))
    assert np.abs(flow).max() < 0.1


def test_burst_flow_shape():
    burst = jnp.asarray(np.stack([_smooth(seed=i) for i in range(3)])[..., None])
    flows = burst_optical_flow(burst, levels=2, iters_per_level=3)
    assert flows.shape == (2, 64, 64, 2)


def test_flow_to_image():
    flow = np.zeros((16, 16, 2), np.float32)
    img = flow_to_image(flow)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    assert np.all(img >= 250)  # zero flow renders ~white
    flow[..., 0] = 5.0
    img2 = flow_to_image(flow)
    assert not np.array_equal(img, img2)


def _affine_frame(ref, **kw):
    from fbanet_tpu.data.synthetic import affine_sample, rotation_zoom_matrix

    h, w = ref.shape[:2]
    m = rotation_zoom_matrix(h, w, **kw)
    return affine_sample(ref[..., None] if ref.ndim == 2 else ref, m)


def test_flow_handles_rotation():
    """Non-translational motion (2.5 deg rotation): the flow warp must
    recover most of the error — the capability the DALI hardware-flow path
    provided (fba_net/pipeline/real_bsr_iterator.py:98-118)."""
    ref = _smooth(96, 96, seed=7)
    tgt = _affine_frame(ref, angle_deg=2.5)[..., 0].astype(np.float32)
    flow = optical_flow(jnp.asarray(ref), jnp.asarray(tgt), levels=3,
                        iters_per_level=8)
    warped = np.asarray(warp_flow(jnp.asarray(tgt)[..., None], flow)[..., 0])
    c = 12
    before = np.mean((tgt[c:-c, c:-c] - ref[c:-c, c:-c]) ** 2)
    after = np.mean((warped[c:-c, c:-c] - ref[c:-c, c:-c]) ** 2)
    assert after < before * 0.25, (before, after)


def test_flow_handles_zoom():
    ref = _smooth(96, 96, seed=8)
    tgt = _affine_frame(ref, zoom=1.04)[..., 0].astype(np.float32)
    flow = optical_flow(jnp.asarray(ref), jnp.asarray(tgt), levels=3,
                        iters_per_level=8)
    warped = np.asarray(warp_flow(jnp.asarray(tgt)[..., None], flow)[..., 0])
    c = 12
    before = np.mean((tgt[c:-c, c:-c] - ref[c:-c, c:-c]) ** 2)
    after = np.mean((warped[c:-c, c:-c] - ref[c:-c, c:-c]) ** 2)
    assert after < before * 0.25, (before, after)


def test_flow_rotation_field_structure():
    """The recovered field for a rotation must actually rotate: x-flow
    changes sign top-to-bottom, y-flow left-to-right."""
    ref = _smooth(96, 96, seed=9)
    tgt = _affine_frame(ref, angle_deg=3.0)[..., 0].astype(np.float32)
    flow = np.asarray(optical_flow(jnp.asarray(ref), jnp.asarray(tgt),
                                   levels=3, iters_per_level=8))
    c = 16
    top_fx = np.median(flow[c:40, c:-c, 0])
    bot_fx = np.median(flow[-40:-c, c:-c, 0])
    assert top_fx * bot_fx < 0, (top_fx, bot_fx)
