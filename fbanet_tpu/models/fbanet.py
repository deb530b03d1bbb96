"""The FBANet model: per-frame features -> FAF fusion -> two window-attention
hourglass U-Nets -> x4 pixel-shuffle upsampling + bilinear base.

Batched channels-last: [B, F, H, W, 3] -> [B, 4H, 4W, 3].

Topology follows the reference exactly (fba_net/models/fba_net.py:242-322)
with the §7 bug fixes:
- the tail upsampler is x4 (scale_pow_two=2), not x2 (§7.4),
- the bilinear residual base resizes only H and W (§7.3),
- per-layer correctness fixes live in models/layers.py.

Only depths/heads indices 0, 1, 4, 5, 6 are consumed, mirroring the
reference's constructor (fba_net/models/fba_net.py:130-229).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fbanet_tpu.config import ModelConfig
from fbanet_tpu.models.blocks import FAFBlock, ResBlock, SwinGroup
from fbanet_tpu.models.layers import ConvProj
from fbanet_tpu.utils import assert_shape

Array = jnp.ndarray


class FBANet(nn.Module):
    """Flagship burst super-resolution model ("BaseModel" in the reference's
    arch registry, fba_net/utils/model_utils.py:65-82)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, burst: Array, deterministic: bool = True) -> Array:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        pdtype = jnp.dtype(cfg.param_dtype)
        b, f, h, w, cin = burst.shape
        assert f == cfg.num_frames, f"expected {cfg.num_frames} frames, got {f}"
        assert (h, w) == (cfg.img_size, cfg.img_size)
        assert cin == cfg.in_channels
        d = cfg.embed_dim

        x_base = burst[:, 0]  # reference frame, [B, H, W, 3]
        x = burst.astype(dtype)

        # --- per-frame feature extraction: head conv + 2 ResBlocks ---
        # (reference: fba_net/models/fba_net.py:88-89,255-259)
        xf = x.reshape(b * f, h, w, cin)
        xf = nn.Conv(d, (3, 3), padding=1, dtype=dtype, param_dtype=pdtype,
                     name="head")(xf)
        xf = ResBlock(d, dtype=dtype, param_dtype=pdtype, name="body0")(xf)
        xf = ResBlock(d, dtype=dtype, param_dtype=pdtype, name="body1")(xf)
        feats = xf.reshape(b, f, h, w, d)

        # --- federated affinity fusion ---
        fused = FAFBlock(num_feats=d, num_frames=f,
                         dtype=dtype, param_dtype=pdtype, name="fusion")(feats)

        # --- input projection + positional dropout ---
        y = ConvProj(d, dtype=dtype, param_dtype=pdtype, name="input_proj")(fused)
        y = nn.Dropout(cfg.drop_rate)(y, deterministic=deterministic)

        # stochastic-depth schedule (reference: fba_net/models/fba_net.py:95-100)
        enc_dpr = list(np.linspace(0, cfg.drop_path_rate,
                                   sum(cfg.depths[: len(cfg.depths) // 2])))
        conv_dpr = [cfg.drop_path_rate] * cfg.depths[4]
        dec_dpr = enc_dpr[::-1]

        def swin(name: str, dim: int, res: int, depth_idx: int,
                 dprs: list[float]) -> SwinGroup:
            return SwinGroup(
                dim=dim, input_resolution=(res, res), depth=cfg.depths[depth_idx],
                heads=cfg.heads[depth_idx], window_size=cfg.window_size,
                mlp_ratio=cfg.mlp_ratio, use_qkv_bias=cfg.use_qkv_bias,
                qk_scale=cfg.qk_scale, drop_rate=cfg.drop_rate,
                attn_drop_rate=cfg.attn_drop_rate, drop_path_rates=dprs,
                token_projection=cfg.token_projection, token_mlp=cfg.token_mlp,
                use_se_layer=cfg.use_se_layer,
                attention_impl=cfg.attention_impl, remat=cfg.remat,
                dtype=dtype, param_dtype=pdtype, name=name,
            )

        from fbanet_tpu.models.layers import Downsample, Upsample

        def hourglass(tag: str, y: Array, cross: tuple[Array, ...] | None):
            """One encoder/bottleneck/decoder hourglass.

            `cross` carries HG1's (up0, conv1, up1, conv0) into HG2's decoder
            concats (reference: fba_net/models/fba_net.py:305-309).
            Returns (output, (up0, conv1, up1, conv0)).
            """
            d0 = cfg.depths[0]
            conv0 = swin(f"{tag}_enc0", d, h, 0, enc_dpr[:d0])(
                y, deterministic=deterministic)
            pool0 = Downsample(2 * d, dtype=dtype, param_dtype=pdtype,
                               name=f"{tag}_down0")(conv0)
            conv1 = swin(f"{tag}_enc1", 2 * d, h // 2, 1,
                         enc_dpr[d0:d0 + cfg.depths[1]])(
                pool0, deterministic=deterministic)
            pool1 = Downsample(4 * d, dtype=dtype, param_dtype=pdtype,
                               name=f"{tag}_down1")(conv1)
            conv2 = swin(f"{tag}_bottleneck", 4 * d, h // 4, 4, conv_dpr)(
                pool1, deterministic=deterministic)

            up0 = Upsample(2 * d, dtype=dtype, param_dtype=pdtype,
                           name=f"{tag}_up0")(conv2)
            if cross is None:
                dec0_in = jnp.concatenate([up0, conv1], axis=-1)  # 4D
            else:
                dec0_in = ConvProj(4 * d, dtype=dtype, param_dtype=pdtype,
                                   name=f"{tag}_proj0")(
                    jnp.concatenate([cross[0], cross[1], up0, conv1], axis=-1))
            dec0 = swin(f"{tag}_dec0", 4 * d, h // 2, 5, dec_dpr[:cfg.depths[5]])(
                dec0_in, deterministic=deterministic)

            up1 = Upsample(d, dtype=dtype, param_dtype=pdtype,
                           name=f"{tag}_up1")(dec0)
            if cross is None:
                dec1_in = jnp.concatenate([up1, conv0], axis=-1)  # 2D
            else:
                dec1_in = ConvProj(2 * d, dtype=dtype, param_dtype=pdtype,
                                   name=f"{tag}_proj1")(
                    jnp.concatenate([cross[2], cross[3], up1, conv0], axis=-1))
            dec1 = swin(f"{tag}_dec1", 2 * d, h, 6,
                        dec_dpr[cfg.depths[5]:cfg.depths[5] + cfg.depths[6]])(
                dec1_in, deterministic=deterministic)
            return dec1, (up0, conv1, up1, conv0)

        # HG1 (reference: fba_net/models/fba_net.py:269-290)
        deconv1, cross = hourglass("HG1", y, None)
        y_1 = ConvProj(d, dtype=dtype, param_dtype=pdtype,
                       name="output_proj")(deconv1)  # 2D -> D

        # HG2 with cross-hourglass skip concats (reference: :292-313)
        deconv1_2, _ = hourglass("HG2", y_1, cross)
        y_2 = ConvProj(d, dtype=dtype, param_dtype=pdtype,
                       name="output_proj_2")(deconv1_2)  # 2D -> D

        # tail: x4 upsampler + conv to RGB (reference: :90-93,313-315; §7.4
        # fix), computed with the final conv reordered before the second
        # pixel shuffle — exact same parameters/math, ~4 ms faster at B=4
        # (see blocks.rearrange_after_shuffle).
        # The final conv is zero-init: the model starts exactly at the
        # bilinear-base PSNR instead of drowning it in init noise (an
        # ~19-layer attention stack's variance otherwise reaches std~1.5 at
        # the output; standard practice for residual SR heads).
        from fbanet_tpu.models.blocks import _UpsamplerParams, fused_tail_x4
        from fbanet_tpu.models.layers import _ConvParams

        w0, b0, w1, b1 = _UpsamplerParams(d, param_dtype=pdtype,
                                          name="tail_upsampler")()
        wt, bt = _ConvParams((3, 3), d, cin, param_dtype=pdtype,
                             kernel_init=nn.initializers.zeros,
                             name="tail_conv")()
        out = fused_tail_x4(y_2, w0, b0, w1, b1, wt, bt, dtype)

        # + bilinearly upsampled reference frame (reference: :317-321; §7.3 fix:
        # resize only the spatial dims)
        base = jax.image.resize(x_base.astype(jnp.float32),
                                (b, 4 * h, 4 * w, cin), method="bilinear")
        result = out.astype(jnp.float32) + base
        assert_shape((b, 4 * h, 4 * w, cin), result)
        return result


def create_model(cfg: ModelConfig) -> FBANet:
    return FBANet(cfg=cfg)


def init_model(cfg: ModelConfig, rng: jax.Array, batch_size: int = 1):
    """Initialize parameters with a dummy burst. Returns (model, params).

    The init is jitted: unjitted flax init dispatches thousands of individual
    device programs (hundreds of seconds over a tunneled TPU); one compiled
    program initializes in ~1s.
    """
    model = create_model(cfg)
    dummy = jnp.zeros((batch_size, cfg.num_frames, cfg.img_size, cfg.img_size,
                       cfg.in_channels), jnp.float32)
    init_fn = jax.jit(lambda key: model.init({"params": key}, dummy,
                                             deterministic=True))
    params = init_fn(rng)
    return model, params
