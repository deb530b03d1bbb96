"""Model blocks: ResBlock, Upsampler, Federated Affinity Fusion, Swin groups.

All blocks are batched channels-last. References cite the behavioral spec in
ConnorBaker/FBANet (see fbanet_tpu/models/layers.py header for the design
rationale and bug-fix ledger).
"""

from __future__ import annotations

from typing import Literal, Sequence

import jax
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


class _UpsamplerParams(nn.Module):
    """Parameter tree of UpsamplerBlock (conv0/conv1) without its forward —
    used by the fused tail path, which needs the raw kernels."""

    features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self) -> tuple[Array, Array, Array, Array]:
        from fbanet_tpu.models.layers import _ConvParams

        w0, b0 = _ConvParams((3, 3), self.features, 4 * self.features,
                             param_dtype=self.param_dtype, name="conv0")()
        w1, b1 = _ConvParams((3, 3), self.features, 4 * self.features,
                             param_dtype=self.param_dtype, name="conv1")()
        return w0, b0, w1, b1


def rearrange_after_shuffle(w: Array) -> Array:
    """Fold an odd-sized conv applied AFTER `pixel_shuffle(x, 2)` into an
    equivalent conv applied BEFORE it: [k, k, C, Co] -> [k', k', 4C, 4Co]
    (k'=3 for k in {3, 5}).

    With the torch channel order pixel_shuffle uses (channel = c*4 + dy*2+dx,
    models/layers.py:637-648), shuffled[2y+dy, 2x+dx, i] =
    pre[y, x, i*4 + py*2 + px]. Substituting into the conv and collecting
    taps per output parity gives a conv on the pre-shuffle tensor whose
    out channel o*4 + dy*2 + dx shuffles into position (2y+dy, 2x+dx, o).
    EXACT (including zero-padding at image borders: every out-of-bounds
    post-shuffle tap maps to an out-of-bounds pre-shuffle tap). Profiled on
    v5e: the post-shuffle 640px conv cost 6.7 ms at B=4 (3-channel output
    forces a padded layout over a 210 MB input); reordered it is 2.4 ms.
    """
    import numpy as np

    kh, kw, c, co = w.shape
    assert kh == kw and kh % 2 == 1, (kh, kw)
    r = kh // 2
    yy_min = -((r + 1) // 2)  # floor(-r / 2)
    yy_max = (1 + r) // 2     # floor((1 + r) / 2)
    ko = yy_max - yy_min + 1
    # trace-time 0/1 routing tensor T[Y, p, a] (separable in y/x): tap a of
    # the post-shuffle kernel at output parity d lands on pre-shuffle tap
    # Y = floor((d+a)/2) at input parity p = (d+a) mod 2; one einsum per
    # call instead of 4*k^2 scatter-adds (those cost ~1 ms/step on TPU).
    T = np.zeros((ko, 2, 2, kh), np.float32)  # [Y, p, d, a]
    for d in range(2):
        for a in range(-r, r + 1):
            yy, p = divmod(d + a, 2)
            T[yy - yy_min, p, d, a + r] = 1.0
    Tj = jnp.asarray(T, w.dtype)
    # wk[Y, X, i*4 + py*2+px, o*4 + dy*2+dx] = sum_{a,b} T[Y,py,dy,a] *
    #   T[X,px,dx,b] * w[a,b,i,o]
    wk = jnp.einsum("YpdA,XqeB,ABio->YXipqode", Tj, Tj, w,
                    precision=jax.lax.Precision.HIGHEST)
    return wk.reshape(ko, ko, 4 * c, 4 * co)


def compose_convs(wa: Array, wb: Array) -> Array:
    """The kernel K with conv(x, K) == conv(conv(x, wa), wb) away from image
    borders (XLA cross-correlation, 'same' zero padding):
    K[t] = sum_{u+v=t} wa[u] @ wb[v]. [ka,ka,Ci,M] x [kb,kb,M,Co] ->
    [ka+kb-1, ka+kb-1, Ci, Co]. Near borders the composition differs (it
    sees 'virtual' intermediate values where the true pipeline's zero
    padding applies) — callers must repair a (ka+kb-2)/2-wide ring."""
    kb = wb.shape[0]
    # one "full"-padding convolution over the tap grid: wa's taps as an
    # image batched over Ci, wb (spatially flipped: K[t] = sum_{u+v=t}
    # wa[u] @ wb[v], while XLA convs are cross-correlations) as the kernel
    img = wa.transpose(2, 0, 1, 3)  # [Ci, ka, ka, M]
    wbf = wb[::-1, ::-1]
    dn = jax.lax.conv_dimension_numbers(img.shape, wbf.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        img, wbf, (1, 1), [(kb - 1, kb - 1), (kb - 1, kb - 1)],
        dimension_numbers=dn, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.promote_types(wa.dtype, wb.dtype))
    return out.transpose(1, 2, 0, 3)  # [k, k, Ci, Co]


def _conv_same(y: Array, wk: Array, bk: Array | None, dtype: Dtype) -> Array:
    k = wk.shape[0]
    p = k // 2
    dn = jax.lax.conv_dimension_numbers(
        y.shape, wk.shape, ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        y, wk.astype(dtype), (1, 1), [(p, p), (p, p)], dimension_numbers=dn)
    return out if bk is None else out + bk.astype(dtype)


def tail_x4_direct(x: Array, w0: Array, b0: Array, w1: Array, b1: Array,
                   wt: Array, bt: Array, dtype: Dtype) -> Array:
    """The model tail — UpsamplerBlock(x4) + final conv to `cout` — with the
    final conv reordered before the second pixel shuffle (exact; see
    `rearrange_after_shuffle`). [B, H, W, C] -> [B, 4H, 4W, cout].

    Same parameters/semantics as UpsamplerBlock(scale_pow_two=2) followed by
    nn.Conv(cout, 3x3) (reference: fba_net/blocks/upsampler.py:13-35 +
    models/fba_net.py:313-315); pinned by
    tests/test_model.py::test_fused_tail_matches_naive.
    """
    y = pixel_shuffle(_conv_same(x.astype(dtype), w0, b0, dtype), 2)
    z = _conv_same(y, w1, b1, dtype)                       # [B,2H,2W,4C]
    zz = _conv_same(z, rearrange_after_shuffle(wt), None, dtype)
    return pixel_shuffle(zz, 2) + bt.astype(dtype)


_TAIL_RING = 8    # 640-scale border ring the composed conv gets wrong
_TAIL_STRIP = 4   # feature-scale strip width recomputed with the direct path
                  # (valid exact rows = 4*(_TAIL_STRIP-2) >= _TAIL_RING)


def fused_tail_x4(x: Array, w0: Array, b0: Array, w1: Array, b1: Array,
                  wt: Array, bt: Array, dtype: Dtype) -> Array:
    """The model tail computed as ONE composed conv + two pixel shuffles.

    The whole tail is linear — conv0 / shuffle / conv1 / final conv carry no
    activations (reference: fba_net/blocks/upsampler.py:13-35 +
    models/fba_net.py:313-315) — so the final conv folds through the second
    shuffle (`rearrange_after_shuffle`), composes with conv1
    (`compose_convs`), folds through the first shuffle, and composes with
    conv0: a single 5x5 conv C -> 16*cout at the FEATURE resolution,
    followed by two shuffles. ~11x fewer FLOPs than the sequential form and
    no [B, 2H, 2W, 4C] intermediate (210 MB at the published size, B=4).

    Kernel composition is exact away from borders; within `_TAIL_RING`
    output pixels of the edge the composed conv sees 'virtual' intermediate
    values where the true pipeline zero-pads, so that ring is recomputed
    with the exact direct path on four narrow strips and pasted. Same
    parameters/semantics as the naive composition everywhere — pinned by
    tests/test_model.py::test_fused_tail_matches_naive and
    ::test_fused_tail_border_ring_exact.
    """
    b, h, w, c = x.shape
    if min(h, w) < 2 * _TAIL_STRIP:
        return tail_x4_direct(x, w0, b0, w1, b1, wt, bt, dtype)

    f32 = jnp.float32
    # final conv folded to 2H-space, composed with conv1: [5, 5, C, 4*cout]
    rt = rearrange_after_shuffle(wt.astype(f32))
    wa = compose_convs(w1.astype(f32), rt)
    cb = jnp.einsum("xyio,i->o", rt, b1.astype(f32))  # conv1 bias through rt
    # folded to H-space, composed with conv0: [5, 5, C, 16*cout]
    wb = rearrange_after_shuffle(wa)
    wf = compose_convs(w0.astype(f32), wb)
    bf = jnp.repeat(cb, 4) + jnp.einsum("xyio,i->o", wb, b0.astype(f32))

    core = _conv_same(x.astype(dtype), wf, bf, dtype)
    # both shuffles in one transpose (no lane-padded 12-channel @2H
    # intermediate): channel o*16 + (dy2*2+dx2)*4 + (dy1*2+dx1) lands at
    # spatial offset (2*dy1 + dy2, 2*dx1 + dx2) — shuffle-of-shuffle order
    cout = wt.shape[3]
    c6 = core.reshape(b, h, w, cout, 2, 2, 2, 2)  # [.., o, dy2, dx2, dy1, dx1]
    out = c6.transpose(0, 1, 6, 4, 2, 7, 5, 3).reshape(b, 4 * h, 4 * w, cout)
    out = out + bt.astype(dtype)

    # exact border ring from the direct path on four narrow strips (the
    # full-height/width strips carry the true outer borders, so corners are
    # exact too; each strip's cut edge is far enough from the pasted ring).
    # Opposite strips are batch-concatenated so the whole repair is two
    # small direct-path calls, not four.
    s, r = _TAIL_STRIP, _TAIL_RING
    args = (w0, b0, w1, b1, wt, bt, dtype)
    tb = tail_x4_direct(jnp.concatenate([x[:, :s], x[:, -s:]]), *args)
    out = out.at[:, :r].set(tb[:b, :r])
    out = out.at[:, -r:].set(tb[b:, -r:])
    lr = tail_x4_direct(jnp.concatenate([x[:, :, :s], x[:, :, -s:]]), *args)
    out = out.at[:, :, :r].set(lr[:b, :, :r])
    out = out.at[:, :, -r:].set(lr[b:, :, -r:])
    return out


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

        from fbanet_tpu.models.layers import _ConvParams

        conv = lambda feats, k, name, **kw: nn.Conv(  # noqa: E731
            feats, (k, k), padding=k // 2, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name, **kw)

        # --- (a) affinity gating ---
        # The affinity is the CHANNEL SUM of the embedding convs (reference
        # computes the full [B*F,H,W,C] embeddings then sums,
        # federated_affinity_fusion.py:67-108). A channel sum of a conv is a
        # conv with the channel-summed kernel — sum_o (W*x + b)_o =
        # (sum_o W_o)*x + sum_o b — so the same parameters give the same
        # affinity at 1/C the FLOPs with no [B*F, H, W, C] embedding tensors
        # (profiled: the materialized form cost 7.2 ms of the 49 ms forward
        # at B=4). Gradients are identical (the reduction is linear).
        #
        # Exact cancellation (also true of the reference's formulation): the
        # gate is sigmoid(|affinity_k - affinity_0|) with affinity_k =
        # conv_b(x_k) - conv_a(x_0), so the reference-frame embedding
        # conv_a (temporal_attn0) AND both conv biases cancel in the
        # difference: delta = |conv_b(x_k) - conv_b(x_0)|, bias-free. They
        # are therefore dropped from the computation — their parameters
        # stay declared (checkpoint-shape parity) and their true gradient is
        # exactly 0 where autodiff through the materialized form yields fp
        # cancellation residue ~1e-10 (verified numerically; torch trains
        # the same parameters by that same noise, i.e. effectively not at
        # all). Measured: the dropped conv_a wgrad alone took XLA a 23-min
        # compile at B=8/F=14/160px.
        _wa, _ba = _ConvParams((3, 3), c, c, param_dtype=self.param_dtype,
                               name="temporal_attn0")()
        wb, _bb = _ConvParams((3, 3), c, c, param_dtype=self.param_dtype,
                              name="temporal_attn1")()

        # The gate evaluation lives in ops/faf_gate.py: the channel-summed
        # conv runs DEPTHWISE (kernel [3,3,1,C], clean C=64 lane layout) + a
        # lane reduction — instead of a C_out=1 conv whose output XLA lays
        # out padded 1->128 lanes (a 128x-inflated store, and the same
        # pathology in its wgrad) — with frame 0 passing through ungated
        # (the reference concatenates it back untouched; sigmoid(0)=0.5
        # would halve it). A fused Pallas strip kernel for this stage was
        # measured 0.3-0.6x this form on v5e and deleted (docs/ROUND4.md).
        from fbanet_tpu.ops.faf_gate import affinity_gate

        xd = frames.astype(self.dtype)
        guided = affinity_gate(xd, jnp.sum(wb, axis=3),
                               compute_dtype=self.dtype)

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
