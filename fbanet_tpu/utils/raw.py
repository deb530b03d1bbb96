"""RealBSR-RAW support: packed-Bayer visualization + RAW-burst model I/O.

The RAW variant of RealBSR stores bursts as 4-channel packed Bayer (RGGB)
arrays normalized by 16383. The reference ships only the visualization half
(fba_net/utils/post_processing_vis.py): black-level subtraction, camera white
balance, brightness normalization /(5*mean), gamma 1/2.2 and a smoothstep
curve. This module reimplements it channels-last in JAX/numpy and adds the
pack/unpack helpers the 4-channel training path needs.

Default metadata follows the reference: norm_factor 16383
(post_processing_vis.py:15), WB normalized by the green gain (:22).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def pack_bayer(raw: Array) -> Array:
    """[..., 2H, 2W] RGGB mosaic -> packed [..., H, W, 4] (R, G1, G2, B)."""
    r = raw[..., 0::2, 0::2]
    g1 = raw[..., 0::2, 1::2]
    g2 = raw[..., 1::2, 0::2]
    b = raw[..., 1::2, 1::2]
    return jnp.stack([r, g1, g2, b], axis=-1)


def unpack_bayer(packed: Array) -> Array:
    """Packed [..., H, W, 4] -> [..., 2H, 2W] RGGB mosaic."""
    *lead, h, w, _ = packed.shape
    out = jnp.zeros(tuple(lead) + (2 * h, 2 * w), packed.dtype)
    out = out.at[..., 0::2, 0::2].set(packed[..., 0])
    out = out.at[..., 0::2, 1::2].set(packed[..., 1])
    out = out.at[..., 1::2, 0::2].set(packed[..., 2])
    out = out.at[..., 1::2, 1::2].set(packed[..., 3])
    return out


def postprocess_raw(
    im: Array,
    meta_data: Mapping[str, Any] | None = None,
    *,
    black_level_subtracted: bool = True,
    external_norm_factor: float | None = None,
    gamma: bool = True,
    smoothstep: bool = True,
    no_white_balance: bool = False,
    return_rgb: bool = False,
) -> Array:
    """Packed-Bayer `[..., H, W, 4]` (or RGB `[..., H, W, 3]`) -> displayable
    image in [0, 1] (channels-last port of
    post_processing_vis.generate_processed_image_channel{3,4}).

    With `return_rgb`, a 4-channel input is collapsed to RGB by averaging the
    two greens (reference: post_processing_vis.py:41).
    """
    meta = dict(meta_data or {})
    c = im.shape[-1]
    im = im * meta.get("norm_factor", 16383.0)

    if (not meta.get("black_level_subtracted", False) and not black_level_subtracted
            and "black_level" in meta):
        bl = jnp.asarray(meta["black_level"], jnp.float32)
        if c == 3 and bl.shape[-1] == 4:
            bl = jnp.stack([bl[0], (bl[1] + bl[2]) / 2, bl[3]])
        im = im - bl

    if (not meta.get("while_balance_applied", False) and not no_white_balance
            and "cam_wb" in meta):
        wb = jnp.asarray(meta["cam_wb"], jnp.float32)
        green = wb[1]
        if c == 3 and wb.shape[-1] == 4:
            wb = jnp.stack([wb[0], (wb[1] + wb[2]) / 2, wb[3]])
        im = im * wb / green

    if external_norm_factor is None:
        im = im / (jnp.mean(im) * 5.0)
    else:
        im = im / external_norm_factor

    im = jnp.clip(im, 0.0, 1.0)
    if gamma:
        im = im ** (1.0 / 2.2)
    if smoothstep:
        im = 3 * im**2 - 2 * im**3

    if return_rgb and c == 4:
        im = jnp.stack(
            [im[..., 0], (im[..., 1] + im[..., 2]) / 2, im[..., 3]], axis=-1)
    return im


def to_uint8(im01: Array | np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(im01) * 255.0, 0, 255).astype(np.uint8)
