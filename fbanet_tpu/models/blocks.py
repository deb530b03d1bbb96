"""Model blocks: ResBlock, Upsampler, Federated Affinity Fusion, Swin groups.

All blocks are batched channels-last. References cite the behavioral spec in
ConnorBaker/FBANet (see fbanet_tpu/models/layers.py header for the design
rationale and bug-fix ledger).
"""

from __future__ import annotations

from typing import Literal, Sequence

import jax.numpy as jnp
from flax import linen as nn

from fbanet_tpu.models.layers import (
    ConvProj,
    Downsample,
    PReLU,
    SwinLayer,
    Upsample,
    pixel_shuffle,
)
from fbanet_tpu.utils import assert_shape

Array = jnp.ndarray
Dtype = jnp.dtype


class ResBlock(nn.Module):
    """conv3x3 -> ReLU -> conv3x3 + skip (reference: fba_net/blocks/residual.py)."""

    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype)(x)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype)(y)
        return x + y


class UpsamplerBlock(nn.Module):
    """n x (conv C->4C + pixel-shuffle x2) for a 2^n upscale.

    Reference: fba_net/blocks/upsampler.py:13-35. The model calls it with
    scale_pow_two=2 for the x4 tail (the reference passed 1 — bug §7.4).
    """

    scale_pow_two: int
    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.scale_pow_two):
            x = nn.Conv(4 * self.features, (3, 3), padding=1, dtype=self.dtype,
                        param_dtype=self.param_dtype, name=f"conv{i}")(x)
            x = pixel_shuffle(x, 2)
        return x


class FAFBlock(nn.Module):
    """Federated Affinity Fusion — the paper's core contribution.

    (a) Affinity gating: embed the reference frame (conv A) and every frame
        (conv B); per-pixel affinity = channel-sum of (emb - emb_ref);
        gate = sigmoid(|affinity_k - affinity_0|) applied to non-reference
        frames (reference: fba_net/blocks/federated_affinity_fusion.py:67-108).
    (b) Fusion: concat all F*C channels -> 1x1 conv + PReLU(0.1) -> 2-level
        conv hourglass with double ResBlocks at 5 stations and concat skips
        -> tail conv + residual (reference: :110-164).

    Input [B, F, H, W, C] -> output [B, H, W, C].
    """

    num_feats: int
    num_frames: int = 14
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, frames: Array) -> Array:
        b, f, h, w, c = frames.shape
        assert f == self.num_frames and c == self.num_feats

        conv = lambda feats, k, name, **kw: nn.Conv(  # noqa: E731
            feats, (k, k), padding=k // 2, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name, **kw)

        # --- (a) affinity gating ---
        emb_ref = conv(c, 3, "temporal_attn0")(frames[:, 0])  # [B,H,W,C]
        emb_all = conv(c, 3, "temporal_attn1")(
            frames.reshape(b * f, h, w, c)).reshape(b, f, h, w, c)
        affinity = jnp.sum(emb_all - emb_ref[:, None], axis=-1)  # [B,F,H,W]
        gate = nn.sigmoid(jnp.abs(affinity[:, 1:] - affinity[:, :1]))  # [B,F-1,H,W]
        guided = jnp.concatenate(
            [frames[:, :1], frames[:, 1:] * gate[..., None]], axis=1)

        # --- (b) fusion hourglass ---
        # The reference concatenates all F*C channels then applies a 1x1 conv
        # (federated_affinity_fusion.py:110-127, rearrange "f h w nf ->
        # h w (f nf)": frame-major, in-channel index = f*C + c — the same
        # order torch's cat(dim=1) produces, so the published checkpoint's
        # feature_fusion.weight is laid out this way). Materializing that
        # [B, H, W, F*C] transpose costs a ~180 MB relayout at the published
        # size; contracting (F, C) directly in one einsum is the same math on
        # the same parameters without the relayout. The kernel's flat
        # in-channel axis is kept frame-major so the strict name-mapped torch
        # import (utils/torch_io.py) needs no permutation
        # (tests/test_torch_io.py::test_feature_fusion_frame_major).
        from fbanet_tpu.models.layers import _ConvParams

        wff, bff = _ConvParams((1, 1), f * c, c, param_dtype=self.param_dtype,
                               name="feature_fusion")()
        wff = wff.reshape(f, c, c).astype(self.dtype)  # [f, c_in, c_out]
        feat = jnp.einsum("bfhwc,fco->bhwo", guided.astype(self.dtype), wff)
        feat = feat + bff.astype(self.dtype)
        feat = PReLU(init_alpha=0.1, param_dtype=self.param_dtype,
                     name="feature_fusion_act")(feat)

        def res2(x: Array, mult: int, name: str) -> Array:
            x = ResBlock(self.num_feats * mult, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"{name}_0")(x)
            x = ResBlock(self.num_feats * mult, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"{name}_1")(x)
            return x

        f0 = res2(feat, 1, "res0")                                   # H, C
        f1 = res2(Downsample(2 * c, dtype=self.dtype, param_dtype=self.param_dtype,
                             name="down0")(f0), 2, "res1")            # H/2, 2C
        f2 = res2(Downsample(4 * c, dtype=self.dtype, param_dtype=self.param_dtype,
                             name="down1")(f1), 4, "res2")            # H/4, 4C
        up0 = Upsample(2 * c, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="up0")(f2)                                # H/2, 2C
        f3 = res2(jnp.concatenate([up0, f1], axis=-1), 4, "res3")     # H/2, 4C
        up1 = Upsample(c, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="up1")(f3)                                # H, C
        f4 = res2(jnp.concatenate([up1, f0], axis=-1), 2, "res4")     # H, 2C
        out = conv(c, 3, "fusion_tail")(f4) + feat
        assert_shape((b, h, w, c), out)
        return out


class SwinGroup(nn.Module):
    """`depth` SwinLayers alternating shift 0 / window//2.

    Reference: fba_net/blocks/fba_net.py:36-62 (FBANetBlock).
    """

    dim: int
    input_resolution: tuple[int, int]
    depth: int
    heads: int
    window_size: int = 8
    mlp_ratio: float = 4.0
    use_qkv_bias: bool = True
    qk_scale: float | None = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rates: Sequence[float] = ()
    token_projection: Literal["linear", "conv"] = "linear"
    token_mlp: Literal["ffn", "leff"] = "leff"
    use_se_layer: bool = False
    attention_impl: Literal["auto", "xla", "pallas"] = "auto"
    remat: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        dprs = list(self.drop_path_rates) or [0.0] * self.depth
        assert len(dprs) == self.depth
        layer_cls = (nn.remat(SwinLayer, static_argnums=(2,))
                     if self.remat else SwinLayer)
        for i in range(self.depth):
            x = layer_cls(
                dim=self.dim,
                input_resolution=self.input_resolution,
                heads=self.heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio,
                use_qkv_bias=self.use_qkv_bias,
                qk_scale=self.qk_scale,
                drop_rate=self.drop_rate,
                attn_drop_rate=self.attn_drop_rate,
                drop_path_rate=dprs[i],
                token_projection=self.token_projection,
                token_mlp=self.token_mlp,
                use_se_layer=self.use_se_layer,
                attention_impl=self.attention_impl,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layer{i}",
                # positional: static_argnums can't see kwargs under nn.remat
            )(x, deterministic)
        return x
