"""Neural layer library for FBANet on TPU.

Design notes (TPU-first, not a translation):

- Everything is **batched and channels-last** `[B, H, W, C]`. The reference
  processed one sample at a time on flattened `(H*W, C)` token lists with
  constant reshape/transpose churn (a torch-on-GPU idiom and an unfinished
  channels-last refactor, reference: README.md:1-4, fba_net/layers/*.py).
  Here feature maps stay spatial; window partitioning is a single reshape;
  convolutions run in XLA's native NHWC layout.
- Attention is computed for **all windows of all batch elements at once**
  via einsum, so the MXU sees one large batched matmul instead of a vmap of
  tiny per-window matmuls (reference vmapped one window at a time:
  fba_net/layers/fba_net.py:222).
- Parameters are f32, compute is bf16-ready via the `dtype` attribute;
  LayerNorm/softmax statistics stay f32.

Reference bug fixes relative to ConnorBaker/FBANet (see SURVEY.md §7):
- relative-position index uses the standard Swin formula (the reference
  scaled both coordinate axes, indexing out of the bias table:
  fba_net/layers/window_attention.py:79-90),
- multi-head attention uses head_dim = dim/heads consistently (reference was
  only self-consistent for heads=1: window_attention.py:175-205),
- shifted-window attention masks are implemented (reference dead-ends in
  `assert False`: window_attention.py:215),
- pixel shuffle keeps the channel axis (reference pattern dropped it:
  layers/pixel_shuffle.py:9-14).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fbanet_tpu.utils import assert_shape

Array = jnp.ndarray
Dtype = jnp.dtype

# torch nn.LayerNorm default (the published checkpoint was trained with it;
# flax defaults to 1e-6 — kept at 1e-5 for import fidelity)
_LN_EPS = 1e-5


class PReLU(nn.Module):
    """Parametric ReLU with a single learnable slope.

    Matches torch's nn.PReLU default (init 0.25) used by the reference's
    input/output projections (fba_net/layers/input_projection.py:40) and the
    FAF fusion's init 0.1 (fba_net/blocks/federated_affinity_fusion.py:47).
    """

    init_alpha: float = 0.25
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        alpha = self.param(
            "alpha", lambda _key: jnp.asarray(self.init_alpha, self.param_dtype)
        ).astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference: fba_net/layers/drop_path.py)."""

    rate: float = 0.0
    deterministic: bool | None = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool | None = None) -> Array:
        det = nn.merge_param("deterministic", self.deterministic, deterministic)
        if det or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        # one mask bit per batch element, broadcast over the rest
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


def window_partition(x: Array, ws: int) -> Array:
    """[B, H, W, C] -> [B * nH * nW, ws*ws, C] (one reshape+transpose).

    Reference did this per-sample with einops (fba_net/layers/fba_net.py:113-124).
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B nH nW ws ws C
    return x.reshape(b * (h // ws) * (w // ws), ws * ws, c)


def window_reverse(windows: Array, ws: int, h: int, w: int) -> Array:
    """Inverse of `window_partition`."""
    nh, nw = h // ws, w // ws
    b = windows.shape[0] // (nh * nw)
    x = windows.reshape(b, nh, nw, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, x.shape[-1])


def relative_position_index(ws: int) -> np.ndarray:
    """Standard Swin relative-position index, [ws*ws, ws*ws] int32.

    Fixes the reference's out-of-range variant
    (fba_net/layers/window_attention.py:67-90) with the canonical
    index = (dy + ws - 1) * (2*ws - 1) + (dx + ws - 1).
    Computed in numpy at module-construction time (static).
    """
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)  # [2, ws*ws]
    rel = flat[:, :, None] - flat[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0) + (ws - 1)  # [N, N, 2], shifted to >= 0
    return (rel[:, :, 0] * (2 * ws - 1) + rel[:, :, 1]).astype(np.int32)


def shift_attention_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Additive SW-MSA mask, [nWindows, ws*ws, ws*ws] float32 {0, -100}.

    Builds the 9-region id map of Swin and masks attention between tokens
    whose pre-shift regions differ. The reference constructed the same map
    but could not apply it (fba_net/layers/fba_net.py:149-193,
    window_attention.py:214-225). Static numpy — runs once at init.
    """
    ids = np.zeros((h, w), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            ids[hs, wsl] = cnt
            cnt += 1
    nh, nw = h // ws, w // ws
    idw = ids.reshape(nh, ws, nw, ws).transpose(0, 2, 1, 3).reshape(nh * nw, ws * ws)
    mask = (idw[:, :, None] != idw[:, None, :]).astype(np.float32) * -100.0
    return mask


class _DenseParams(nn.Module):
    """Declare a flax-Dense-shaped kernel/bias without calling Dense.

    Lets the fused Pallas attention path consume raw parameter arrays while
    keeping the *identical* parameter tree (names, shapes, inits) as the XLA
    path's nn.Dense submodules — checkpoints are interchangeable.
    """

    in_features: int
    features: int
    use_bias: bool = True
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self) -> tuple[Array, Array | None]:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features), self.param_dtype)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), self.param_dtype)
                if self.use_bias else None)
        return kernel, bias


class _LayerNormParams(nn.Module):
    """LayerNorm scale/bias parameters (same tree as nn.LayerNorm) for the
    fused path, where the normalization itself runs inside the kernel."""

    features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self) -> tuple[Array, Array]:
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        return scale, bias


class FusedWindowAttention(nn.Module):
    """Parameter container + dispatch for the fused Pallas window attention.

    Parameter tree is identical to `WindowAttention` (to_q/to_kv/proj +
    relative_position_bias_table); the math — including the preceding
    LayerNorm, whose parameters the caller passes in — runs in one Pallas
    kernel (fbanet_tpu/ops/attention_pallas.py).
    """

    dim: int
    window_size: int
    heads: int
    use_qkv_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, y4: Array, ln_scale: Array, ln_bias: Array,
                 mask: Array | None, residual: bool = False) -> Array:
        """y4: the post-shift 4-D feature map [B, H, W, C]; returns the
        attention branch in the same layout (window partition/merge happen
        inside the kernel — the [G, N, C] window tensor never reaches HBM).
        With `residual=True` the kernel returns `y4 + branch`."""
        from fbanet_tpu.ops.attention_pallas import fused_window_attention_2d

        c = self.dim
        n = self.window_size ** 2
        wq, bq = _DenseParams(c, c, self.use_qkv_bias,
                              param_dtype=self.param_dtype, name="to_q")()
        wkv, bkv = _DenseParams(c, 2 * c, self.use_qkv_bias,
                                param_dtype=self.param_dtype, name="to_kv")()
        wproj, bproj = _DenseParams(c, c, True, param_dtype=self.param_dtype,
                                    name="proj")()
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02),
            ((2 * self.window_size - 1) ** 2, self.heads),
            self.param_dtype,
        )
        idx = relative_position_index(self.window_size)
        bias = table[idx.reshape(-1)].reshape(n, n, self.heads).transpose(2, 0, 1)
        zeros = lambda d: jnp.zeros((d,), self.param_dtype)  # noqa: E731
        return fused_window_attention_2d(
            y4, ln_scale, ln_bias,
            wq, bq if bq is not None else zeros(c),
            wkv, bkv if bkv is not None else zeros(2 * c),
            wproj, bproj, bias, mask,
            heads=self.heads, window_size=self.window_size,
            compute_dtype=self.dtype, residual=residual)


class FusedLeFF(nn.Module):
    """Parameter container + dispatch for the fused Pallas LeFF kernel.

    Parameter tree is identical to `LeFF` (linear1/depthwise/linear2); the
    math — including the preceding norm2 LayerNorm, whose parameters the
    caller passes in — runs in one Pallas kernel
    (fbanet_tpu/ops/leff_pallas.py). Returns the pre-residual FFN branch.
    """

    dim: int
    hidden_dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, ln_scale: Array, ln_bias: Array,
                 residual: bool = False) -> Array:
        from fbanet_tpu.ops.leff_pallas import fused_leff

        c, ch = self.dim, self.hidden_dim
        w1, b1 = _DenseParams(c, ch, True, param_dtype=self.param_dtype,
                              name="linear1")()
        # depthwise conv params: flax Conv kernel [3, 3, in/groups=1, Ch]
        wdw = _ConvParams((3, 3), 1, ch, param_dtype=self.param_dtype,
                          name="depthwise")()
        w2, b2 = _DenseParams(ch, c, True, param_dtype=self.param_dtype,
                              name="linear2")()
        return fused_leff(x, ln_scale, ln_bias, w1, b1, wdw[0], wdw[1], w2,
                          b2, compute_dtype=self.dtype, residual=residual)


class _ConvParams(nn.Module):
    """Declare a flax-Conv-shaped kernel/bias without calling Conv (same
    tree as nn.Conv: kernel [Kh, Kw, in/groups, out], bias [out])."""

    kernel_size: tuple[int, int]
    in_per_group: int
    features: int
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self) -> tuple[Array, Array]:
        kernel = self.param(
            "kernel", self.kernel_init,
            (*self.kernel_size, self.in_per_group, self.features),
            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        return kernel, bias


class SepConv2d(nn.Module):
    """Depthwise conv -> activation -> pointwise 1x1
    (reference: fba_net/layers/separable_conv2d.py:11-52)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    act: Callable[[Array], Array] = nn.relu
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        x = nn.Conv(c, (self.kernel_size, self.kernel_size), strides=self.stride,
                    padding=self.kernel_size // 2, feature_group_count=c,
                    use_bias=self.use_bias, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="depthwise")(x)
        x = self.act(x)
        x = nn.Conv(self.features, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="pointwise")(x)
        return x


class SELayer(nn.Module):
    """Squeeze-and-excitation channel gate
    (reference: fba_net/layers/squeeze_and_excitation.py:12-30)."""

    reduction: int = 16
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        # squeeze over all spatial/token dims (everything but batch & channel)
        axes = tuple(range(1, x.ndim - 1))
        s = jnp.mean(x, axis=axes)
        s = nn.Dense(c // self.reduction, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype)(s)
        s = nn.relu(s)
        s = nn.Dense(c, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype)(s)
        s = nn.sigmoid(s)
        return x * s.reshape(s.shape[:1] + (1,) * (x.ndim - 2) + (c,))


class WindowAttention(nn.Module):
    """Multi-head window self-attention with relative position bias.

    Operates on `[BW, N, C]` where BW = batch * num_windows and N = ws*ws,
    so q@k^T and attn@v are single large batched matmuls on the MXU.

    Reference: fba_net/layers/window_attention.py (with the §7 head-dim,
    bias-index and mask fixes).
    """

    dim: int
    window_size: int
    heads: int
    use_qkv_bias: bool = True
    qk_scale: float | None = None
    attn_drop_rate: float = 0.0
    proj_drop_rate: float = 0.0
    token_projection: Literal["linear", "conv"] = "linear"
    use_se_layer: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Array | None = None,
                 deterministic: bool = True) -> Array:
        bw, n, c = x.shape
        assert c == self.dim, f"expected dim {self.dim}, got {c}"
        assert n == self.window_size**2
        h = self.heads
        dh = c // h
        scale = self.qk_scale or dh**-0.5

        if self.token_projection == "linear":
            # to_q: D -> D; to_kv: D -> 2D (reference:
            # fba_net/layers/linear_projection.py:24-44)
            q = nn.Dense(c, use_bias=self.use_qkv_bias, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="to_q")(x)
            kv = nn.Dense(2 * c, use_bias=self.use_qkv_bias, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="to_kv")(x)
            k, v = jnp.split(kv, 2, axis=-1)
        else:
            # separable-conv projections on the window's spatial layout
            # (reference: fba_net/layers/conv_projection.py:11-67)
            xs = x.reshape(bw, self.window_size, self.window_size, c)
            q = SepConv2d(c, use_bias=self.use_qkv_bias, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="to_q")(xs).reshape(bw, n, c)
            k = SepConv2d(c, use_bias=self.use_qkv_bias, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="to_k")(xs).reshape(bw, n, c)
            v = SepConv2d(c, use_bias=self.use_qkv_bias, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="to_v")(xs).reshape(bw, n, c)

        q = q.reshape(bw, n, h, dh).transpose(0, 2, 1, 3) * scale
        k = k.reshape(bw, n, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(bw, n, h, dh).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32)

        # relative position bias: table [(2w-1)^2, heads], trunc-normal 0.02
        # (reference: window_attention.py:47-65,143-146)
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02),
            ((2 * self.window_size - 1) ** 2, h),
            self.param_dtype,
        )
        idx = relative_position_index(self.window_size)
        bias = table[idx.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            # mask: [nW, N, N]; windows repeat per batch element
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, h, n, n)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(bw, h, n, n)

        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.attn_drop_rate)(attn, deterministic=deterministic)

        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
        out = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="proj")(out)
        if self.use_se_layer:
            out = SELayer(dtype=self.dtype, param_dtype=self.param_dtype)(out)
        out = nn.Dropout(self.proj_drop_rate)(out, deterministic=deterministic)
        return out


class LeFF(nn.Module):
    """Locally-enhanced feed-forward: linear -> GELU -> depthwise 3x3 -> GELU
    -> linear, on the spatial layout
    (reference: fba_net/layers/locally_enhanced_feed_forward.py:15-60)."""

    dim: int
    hidden_dim: int
    act: Callable[[Array], Array] = nn.gelu
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # x: [B, H, W, C] — we never flattened, so no reshape churn
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="linear1")(x)
        x = self.act(x)
        x = nn.Conv(self.hidden_dim, (3, 3), padding=1,
                    feature_group_count=self.hidden_dim, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="depthwise")(x)
        x = self.act(x)
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="linear2")(x)
        return x


class MlpFFN(nn.Module):
    """Plain transformer FFN (reference: fba_net/layers/multi_layer_perceptron.py,
    fixing the ignored out_size — §7.8)."""

    dim: int
    hidden_dim: int
    drop_rate: float = 0.0
    act: Callable[[Array], Array] = nn.gelu
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        x = self.act(x)
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype)(x)
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        return x


class SwinLayer(nn.Module):
    """One (shifted-)window-attention transformer layer on [B, H, W, C].

    LN -> cyclic shift -> window partition -> W-MSA -> reverse -> +skip,
    then x = x + drop_path(FFN(LN(x))) — the correct pre-norm residual form
    (the reference doubled the stream and dropped the FFN output,
    fba_net/layers/fba_net.py:245-248; fixed per §7.5).

    Reference: fba_net/layers/fba_net.py (FBANetLayer).
    """

    dim: int
    input_resolution: tuple[int, int]
    heads: int
    window_size: int = 8
    shift_size: int = 0
    mlp_ratio: float = 4.0
    use_qkv_bias: bool = True
    qk_scale: float | None = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    token_projection: Literal["linear", "conv"] = "linear"
    token_mlp: Literal["ffn", "leff"] = "leff"
    use_se_layer: bool = False
    attention_impl: Literal["auto", "xla", "pallas"] = "auto"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def _use_fused_attention(self) -> bool:
        """Fused Pallas path: linear projection, no SE/dropout/qk override.
        'auto' fuses on TPU only (CPU Pallas runs interpreted — slow)."""
        impl = self.attention_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        return (impl == "pallas"
                and self.token_projection == "linear"
                and not self.use_se_layer
                and self.qk_scale is None
                and self.attn_drop_rate == 0.0
                and self.drop_rate == 0.0)

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        h, w = self.input_resolution
        ws, shift = self.window_size, self.shift_size
        # safeguard small inputs (reference: fba_net/layers/fba_net.py:55-65)
        if min(h, w) <= ws:
            ws, shift = min(h, w), 0
        assert h % ws == 0 and w % ws == 0, (
            f"resolution {h}x{w} not divisible by window {ws}"
        )
        b, xh, xw, c = x.shape
        assert (xh, xw) == (h, w) and c == self.dim

        skip = x
        # When drop_path is the identity (deterministic, or rate 0) the skip
        # add runs inside the fused kernels on already-resident VMEM data.
        # Valid under the shift too: roll is a permutation, so
        # unroll(roll(x) + branch) == x + unroll(branch).
        dp_identity = deterministic or self.drop_path_rate == 0.0
        fused_attn = self._use_fused_attention()
        if fused_attn:
            # LN runs inside the kernel (it commutes with roll/partition,
            # both token-wise reorderings), so partition the raw stream.
            ln_scale, ln_bias = _LayerNormParams(
                self.dim, param_dtype=jnp.float32, name="norm1")()
            y = x
            if shift > 0:
                y = jnp.roll(y, shift=(-shift, -shift), axis=(1, 2))
                mask = jnp.asarray(shift_attention_mask(h, w, ws, shift))
            else:
                mask = None
            # partition/merge happen inside the kernel (4-D in, 4-D out)
            y = FusedWindowAttention(
                dim=self.dim, window_size=ws, heads=self.heads,
                use_qkv_bias=self.use_qkv_bias, dtype=self.dtype,
                param_dtype=self.param_dtype, name="attn",
            )(y, ln_scale, ln_bias, mask, residual=dp_identity)
        else:
            y = nn.LayerNorm(epsilon=_LN_EPS, dtype=jnp.float32,
                             name="norm1")(x).astype(self.dtype)

            if shift > 0:
                y = jnp.roll(y, shift=(-shift, -shift), axis=(1, 2))
                mask = jnp.asarray(shift_attention_mask(h, w, ws, shift))
            else:
                mask = None

            windows = window_partition(y, ws)
            attn_windows = WindowAttention(
                dim=self.dim, window_size=ws, heads=self.heads,
                use_qkv_bias=self.use_qkv_bias, qk_scale=self.qk_scale,
                attn_drop_rate=self.attn_drop_rate, proj_drop_rate=self.drop_rate,
                token_projection=self.token_projection,
                use_se_layer=self.use_se_layer, dtype=self.dtype,
                param_dtype=self.param_dtype, name="attn",
            )(windows, mask=mask, deterministic=deterministic)
            y = window_reverse(attn_windows, ws, h, w)

        if shift > 0:
            y = jnp.roll(y, shift=(shift, shift), axis=(1, 2))

        drop_path = DropPath(self.drop_path_rate, name="drop_path")
        if fused_attn and dp_identity:
            x = y.astype(skip.dtype)  # kernel already added the skip
        else:
            x = skip + drop_path(y, deterministic=deterministic).astype(skip.dtype)

        fused_leff_path = fused_attn and self.token_mlp == "leff"
        if fused_leff_path:
            # norm2 + LeFF in one Pallas kernel (the 4C hidden activations
            # never touch HBM); with identity drop_path the residual add
            # happens in-kernel too
            ln2_scale, ln2_bias = _LayerNormParams(
                self.dim, param_dtype=jnp.float32, name="norm2")()
            y = FusedLeFF(self.dim, int(self.dim * self.mlp_ratio),
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name="mlp")(x, ln2_scale, ln2_bias,
                                      residual=dp_identity)
        else:
            y = nn.LayerNorm(epsilon=_LN_EPS, dtype=jnp.float32,
                             name="norm2")(x).astype(self.dtype)
            if self.token_mlp == "leff":
                y = LeFF(self.dim, int(self.dim * self.mlp_ratio),
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="mlp")(y)
            else:
                y = MlpFFN(self.dim, int(self.dim * self.mlp_ratio),
                           drop_rate=self.drop_rate, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="mlp")(
                    y, deterministic=deterministic)
        if fused_leff_path and dp_identity:
            x = y.astype(x.dtype)  # kernel already added the skip
        else:
            x = x + drop_path(y, deterministic=deterministic).astype(x.dtype)
        assert_shape((b, h, w, self.dim), x)
        return x


class Downsample(nn.Module):
    """4x4 stride-2 conv halving resolution
    (reference: fba_net/layers/downsample_flatten.py).

    Stays a plain strided conv BY MEASUREMENT: the inverse of the Upsample
    trick below (pad + space-to-depth + four [4C -> F] matmul taps, exact
    same math) was built and timed on v5e in round 4 — the pad+transpose
    relayout costs more than XLA's own strided-conv lowering at both model
    shapes, 2.6x slower fwd and 5x slower fwd+bwd at 160^2 C64->128
    (docs/ROUND4.md, measured-and-rejected)."""

    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Conv(self.features, (4, 4), strides=2, padding=1,
                       dtype=self.dtype, param_dtype=self.param_dtype)(x)


class Upsample(nn.Module):
    """2x2 stride-2 transposed conv doubling resolution
    (reference: fba_net/layers/upsample_flatten.py).

    Computed as ONE matmul C -> 4*features + depth-to-space: a 2x2/s2
    transposed conv has non-overlapping output footprints, so
    out[2y+d, 2x+e, o] = sum_i x[y, x, i] * kernel[1-d, 1-e, i, o] exactly
    (the flip is lax.conv_transpose's kernel convention — pinned by
    tests/test_model.py::test_upsample_matches_conv_transpose). This avoids
    XLA's zero-dilated-input conv lowering (4x wasted MACs on the MXU).
    The parameter tree is identical to the nn.ConvTranspose form
    (ConvTranspose_0/{kernel [2,2,C,F], bias [F]})."""

    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        kernel, bias = _ConvParams((2, 2), c, self.features,
                                   param_dtype=self.param_dtype,
                                   name="ConvTranspose_0")()
        kf = kernel[::-1, ::-1].astype(self.dtype)  # [2, 2, C, F]
        z = jnp.einsum("bhwi,deio->bhdweo", x.astype(self.dtype), kf)
        z = z.reshape(b, 2 * h, 2 * w, self.features)
        return z + bias.astype(self.dtype)


class ConvProj(nn.Module):
    """3x3 conv + PReLU projection.

    Unifies the reference's InputProjLayer / OutputProjLayer /
    OutputProjHWCLayer (fba_net/layers/{input,output}_projection*.py) —
    they differ only in flatten bookkeeping, which this design does not need.
    """

    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype)(x)
        return PReLU(param_dtype=self.param_dtype)(x)


def pixel_shuffle(x: Array, scale: int) -> Array:
    """Depth-to-space: [B, H, W, C*s*s] -> [B, H*s, W*s, C].

    Keeps the channel axis (the reference's einops pattern dropped it,
    fba_net/layers/pixel_shuffle.py:9-14; §7.6). Matches torch's
    PixelShuffle channel ordering (C, s, s) so weights are portable.
    """
    b, h, w, csq = x.shape
    c = csq // (scale * scale)
    x = x.reshape(b, h, w, c, scale, scale)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B H s W s C
    return x.reshape(b, h * scale, w * scale, c)
