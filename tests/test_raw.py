"""RAW (packed-Bayer) utility tests."""

import jax.numpy as jnp
import numpy as np

from fbanet_tpu.utils.raw import pack_bayer, postprocess_raw, unpack_bayer


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    mosaic = jnp.asarray(rng.uniform(size=(8, 10)).astype(np.float32))
    packed = pack_bayer(mosaic)
    assert packed.shape == (4, 5, 4)
    back = unpack_bayer(packed)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(mosaic))


def test_pack_channel_order_rggb():
    mosaic = np.zeros((4, 4), np.float32)
    mosaic[0::2, 0::2] = 1.0  # R
    mosaic[0::2, 1::2] = 2.0  # G1
    mosaic[1::2, 0::2] = 3.0  # G2
    mosaic[1::2, 1::2] = 4.0  # B
    packed = np.asarray(pack_bayer(jnp.asarray(mosaic)))
    for c in range(4):
        assert np.all(packed[..., c] == c + 1)


def test_postprocess_range_and_monotone():
    rng = np.random.default_rng(1)
    im = jnp.asarray(rng.uniform(0, 0.3, size=(6, 6, 4)).astype(np.float32))
    out = postprocess_raw(im, {"norm_factor": 16383.0})
    assert out.shape == im.shape
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0


def test_postprocess_rgb_collapse():
    im = jnp.ones((4, 4, 4)) * 0.1
    out = postprocess_raw(im, return_rgb=True)
    assert out.shape == (4, 4, 3)


def test_postprocess_white_balance():
    im = jnp.ones((2, 2, 4)) * 0.001
    meta = {"norm_factor": 1.0, "black_level": [0, 0, 0, 0],
            "cam_wb": [2.0, 1.0, 1.0, 1.5]}
    out = postprocess_raw(im, meta, black_level_subtracted=False,
                          gamma=False, smoothstep=False,
                          external_norm_factor=1.0)
    r, g1 = float(out[0, 0, 0]), float(out[0, 0, 1])
    assert np.isclose(r / g1, 2.0, rtol=1e-5)
