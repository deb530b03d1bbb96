"""Batched on-device burst registration: pyramidal ECC image alignment.

Replaces the reference's CPU registration stack (SURVEY.md §2.4 N1/N7):
- `cv2.findTransformECC` with MOTION_TRANSLATION (batch path) and
  MOTION_HOMOGRAPHY (single-pair path)
  (reference: fba_net/homography_alignment.py:38-44,97-118),
- the `cv2.reg.MapperPyramid` family (shift/euclidean/similarity/affine/
  projective over a 3-level pyramid, reference: fba_net/registration/pyramid.py:40-64).

Algorithm: the ECC criterion of Evangelidis & Psarakis (PAMI 2008) — the same
one OpenCV implements — maximizing the zero-mean correlation coefficient
between the template and the warped input. Forward-additive updates with the
per-pixel Jacobian obtained by `jax.jacfwd` of the warp's coordinate map, so
one code path serves every motion model. Iterations run in `lax.fori_loop`
(static trip count — XLA-friendly) or, with `eps > 0`, a `lax.while_loop`
terminating on the correlation increment (OpenCV's TermCriteria), f32
throughout (bf16 is numerically unusable here), coarse-to-fine over a Gaussian
pyramid, vmappable over frames and bursts.

Where the reference registered a burst with 16 processes x 16 threads of
OpenCV calls (homography_alignment.py:167-198), `align_burst` does the whole
burst in one compiled program on the accelerator.
"""

from __future__ import annotations

from functools import partial
from typing import Literal

import jax
import jax.numpy as jnp
from jax import lax
from jaxtyping import Array as JArray
from jaxtyping import Float

from fbanet_tpu.ops.warp import warp_burst_homography, warp_image
from fbanet_tpu.utils.shape_check import typed

Array = jnp.ndarray
Motion = Literal["translation", "euclidean", "similarity", "affine", "homography"]

_NUM_PARAMS = {"translation": 2, "euclidean": 3, "similarity": 4,
               "affine": 6, "homography": 8}

# Rec.601 luma weights, matching cv2.cvtColor(..., COLOR_RGB2GRAY) used by the
# reference before ECC (homography_alignment.py:97-117).
_LUMA = jnp.array([0.299, 0.587, 0.114], jnp.float32)


def rgb_to_gray(image: Array) -> Array:
    """[..., H, W, C] -> [..., H, W] via Rec.601 luma (C==1 squeezes)."""
    if image.shape[-1] == 1:
        return image[..., 0].astype(jnp.float32)
    return jnp.einsum("...c,c->...", image[..., :3].astype(jnp.float32), _LUMA)


def params_to_matrix(p: Array, motion: Motion) -> Array:
    """Motion parameters -> 3x3 warp matrix in (x, y, 1) coords."""
    if motion == "translation":
        return jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32).at[
            0, 2].set(p[0]).at[1, 2].set(p[1])
    if motion == "euclidean":
        c, s = jnp.cos(p[0]), jnp.sin(p[0])
        return jnp.stack([
            jnp.stack([c, -s, p[1]]),
            jnp.stack([s, c, p[2]]),
            jnp.array([0.0, 0.0, 1.0]),
        ])
    if motion == "similarity":
        # p = [a, b, tx, ty]: uniform scale+rotation (a=s*cos, b=s*sin)
        a, b_ = p[0], p[1]
        return jnp.stack([
            jnp.stack([a, -b_, p[2]]),
            jnp.stack([b_, a, p[3]]),
            jnp.array([0.0, 0.0, 1.0]),
        ])
    if motion == "affine":
        return jnp.concatenate(
            [p.reshape(2, 3), jnp.array([[0.0, 0.0, 1.0]])], axis=0)
    if motion == "homography":
        return jnp.concatenate([p, jnp.ones((1,))]).reshape(3, 3)
    raise ValueError(f"unknown motion model {motion}")


def matrix_to_params(m: Array, motion: Motion) -> Array:
    """3x3 matrix -> motion parameters (inverse of `params_to_matrix`)."""
    m = m / m[2, 2]
    if motion == "translation":
        return jnp.array([m[0, 2], m[1, 2]])
    if motion == "euclidean":
        return jnp.array([jnp.arctan2(m[1, 0], m[0, 0]), m[0, 2], m[1, 2]])
    if motion == "similarity":
        return jnp.array([m[0, 0], m[1, 0], m[0, 2], m[1, 2]])
    if motion == "affine":
        return m[:2].reshape(-1)
    if motion == "homography":
        return m.reshape(-1)[:8]
    raise ValueError(f"unknown motion model {motion}")


def identity_params(motion: Motion) -> Array:
    return matrix_to_params(jnp.eye(3, dtype=jnp.float32), motion)


def _scale_matrix(m: Array, s: float) -> Array:
    """Rescale a warp matrix between pyramid levels: S M S^-1, S=diag(s,s,1)."""
    sm = jnp.array([[s, 0, 0], [0, s, 0], [0, 0, 1]], jnp.float32)
    si = jnp.array([[1 / s, 0, 0], [0, 1 / s, 0], [0, 0, 1]], jnp.float32)
    return sm @ m @ si


def _blur_and_halve(img: Array) -> Array:
    """5-tap binomial blur + 2x subsample (one Gaussian pyramid step)."""
    k = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0], jnp.float32) / 16.0
    x = img[None, :, :, None]
    kh = k[:, None, None, None]
    kw = k[None, :, None, None]
    dn = lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = lax.conv_general_dilated(x, kh, (1, 1), [(2, 2), (0, 0)], dimension_numbers=dn)
    x = lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (2, 2)], dimension_numbers=dn)
    return x[0, ::2, ::2, 0]


def _image_gradients(img: Array) -> tuple[Array, Array]:
    """Central-difference gradients with edge replication (cv2-style)."""
    padded = jnp.pad(img, 1, mode="edge")
    gx = (padded[1:-1, 2:] - padded[1:-1, :-2]) * 0.5
    gy = (padded[2:, 1:-1] - padded[:-2, 1:-1]) * 0.5
    return gx, gy


def _warp_coords(p: Array, grid_xy1: Array, motion: Motion) -> Array:
    """Map template pixel coords [3, N] (x, y, 1) to input coords [2, N]."""
    m = params_to_matrix(p, motion)
    src = m @ grid_xy1
    denom = jnp.where(jnp.abs(src[2]) < 1e-12, 1e-12, src[2])
    return src[:2] / denom  # [2, N] (x, y)


def _translation_interp_mats(p: Array, h: int, w: int
                             ) -> tuple[Array, Array]:
    """Row/col bilinear interpolation matrices for a pure translation.

    `p = (tx, ty)`: returns `(Ry [h, h], Cx [w, w])` f32 such that
    `Ry @ img @ Cx^T` samples `img` at `(y + ty, x + tx)` with edge
    clamping — the same result as the dynamic-slice warp, but built from
    iota comparisons and applied with matmuls. Crucially this stays
    gather-free **under vmap**: a vmapped `dynamic_slice` lowers to the
    computed-index gather this module exists to avoid (~37 ms/frame on
    v5e), while vmapped comparisons/matmuls batch cleanly onto the MXU.
    """
    tx, ty = p[0], p[1]

    def mat(n: int, t: Array) -> Array:
        i0 = jnp.floor(t)
        f = t - i0
        idx = jnp.arange(n, dtype=jnp.float32) + i0
        j0 = jnp.clip(idx, 0.0, n - 1.0)
        j1 = jnp.clip(idx + 1.0, 0.0, n - 1.0)
        cols = jnp.arange(n, dtype=jnp.float32)[None, :]
        return ((cols == j0[:, None]) * (1.0 - f)
                + (cols == j1[:, None]) * f).astype(jnp.float32)

    return mat(h, ty), mat(w, tx)


def _warp_translation_mm(stack: Array, p: Array) -> Array:
    """Warp a channel stack `[C, H, W]` by translation `p = (tx, ty)` via the
    interpolation matrices (f32-exact: HIGHEST matmul precision)."""
    c, h, w = stack.shape
    ry, cx = _translation_interp_mats(p, h, w)
    rows = jnp.einsum("ij,cjw->ciw", ry, stack,
                      precision=lax.Precision.HIGHEST)
    return jnp.einsum("xw,ciw->cix", cx, rows,
                      precision=lax.Precision.HIGHEST)


def _run_ecc_iters(step, p0: Array, num_iters: int,
                   eps: float) -> tuple[Array, Array]:
    """Drive ECC iterations: fixed `fori_loop` when eps == 0 (static trip
    count — today's default), or a `while_loop` terminating when the
    correlation increment |rho - rho_prev| drops below `eps` — OpenCV's
    criterion (cv2 findTransformECC: TermCriteria(COUNT+EPS, iters, eps),
    reference: fba_net/homography_alignment.py:38-44 with eps 1e-10).
    Under vmap the while_loop runs until every lane terminates, so the
    speedup is the batch's slowest frame — still a win when the whole
    burst converges early."""
    if eps <= 0.0:
        def fbody(_i, carry):
            p, _rho = carry
            return step(p)
        return lax.fori_loop(0, num_iters, fbody, (p0, jnp.float32(0.0)))

    def cond(carry):
        i, _p, _rho, drho = carry
        return (i < num_iters) & (drho > eps)

    def wbody(carry):
        i, p, rho, _drho = carry
        p2, rho2 = step(p)
        return i + 1, p2, rho2, jnp.abs(rho2 - rho)

    _, p, rho, _ = lax.while_loop(
        cond, wbody, (jnp.int32(0), p0, jnp.float32(0.0), jnp.float32(jnp.inf)))
    return p, rho


def _ecc_translation_level(
    template: Array,
    image: Array,
    p0: Array,
    num_iters: int,
    eps: float = 0.0,
) -> tuple[Array, Array]:
    """Translation-model ECC at one level using the matmul warp.

    History: this path first used per-frame `dynamic_slice` warps, which are
    fast standalone but lower to the slow computed-index gather **once
    vmapped over frames/batch** (measured: 37.5 ms per batch-4 x 13-frame
    `align_burst` on v5e, dominated by exactly that). The one-hot matmul
    warp keeps the whole burst on the MXU under any vmap nesting.
    """
    h, w = template.shape
    tbar = template.reshape(-1)
    tbar = tbar - jnp.mean(tbar)
    t_norm = jnp.sqrt(jnp.sum(tbar * tbar)) + 1e-12

    gx, gy = _image_gradients(image)
    stack = jnp.stack([image, gx, gy])  # warp all three in one matmul pass

    def step(p):
        warped = _warp_translation_mm(stack, p)
        iw = warped[0].reshape(-1)
        ixw = warped[1].reshape(-1)
        iyw = warped[2].reshape(-1)
        ibar = iw - jnp.mean(iw)
        i_norm2 = jnp.sum(ibar * ibar) + 1e-12

        # dW/dp is the identity for translation: G = [gx, gy]
        c00 = jnp.sum(ixw * ixw) + 1e-8
        c01 = jnp.sum(ixw * iyw)
        c11 = jnp.sum(iyw * iyw) + 1e-8
        det = c00 * c11 - c01 * c01
        gi = jnp.array([jnp.sum(ixw * ibar), jnp.sum(iyw * ibar)])
        gt = jnp.array([jnp.sum(ixw * tbar), jnp.sum(iyw * tbar)])

        def solve2(b):
            return jnp.array([(c11 * b[0] - c01 * b[1]) / det,
                              (c00 * b[1] - c01 * b[0]) / det])

        c_inv_gi = solve2(gi)
        corr = jnp.dot(tbar, ibar)
        lam_num = i_norm2 - jnp.dot(gi, c_inv_gi)
        lam_den = corr - jnp.dot(gt, c_inv_gi)
        lam = jnp.where(jnp.abs(lam_den) < 1e-12, 1.0, lam_num / lam_den)
        dp = solve2(lam * gt - gi)
        dp = jnp.where(jnp.isfinite(dp), dp, jnp.zeros_like(dp))
        rho = corr / (t_norm * jnp.sqrt(i_norm2))
        return p + dp, rho

    return _run_ecc_iters(step, p0, num_iters, eps)


def _ecc_single_level(
    template: Array,
    image: Array,
    p0: Array,
    motion: Motion,
    num_iters: int,
    eps: float = 0.0,
) -> tuple[Array, Array]:
    """Run ECC iterations at one pyramid level. Returns (params, rho)."""
    if motion == "translation":
        return _ecc_translation_level(template, image, p0, num_iters, eps)
    h, w = template.shape
    # On TPU, route the per-iteration warps through the Pallas one-hot-matmul
    # kernel: XLA's gather with in-program indices costs ~37 ms/frame here
    # (see ops/warp_pallas.py); the fused kernel is ~10x faster and batches
    # (image, gx, gy) into one 3-channel warp.
    use_pallas = (jax.default_backend() == "tpu" and h % 8 == 0)
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([xs.reshape(-1), ys.reshape(-1), jnp.ones(h * w)])  # [3,N]

    tbar = template.reshape(-1)
    tbar = tbar - jnp.mean(tbar)
    t_norm = jnp.sqrt(jnp.sum(tbar * tbar)) + 1e-12

    gx, gy = _image_gradients(image)
    stacked = jnp.stack([image, gx, gy], axis=-1)  # [H, W, 3] one warp

    coords_fn = partial(_warp_coords, grid_xy1=grid, motion=motion)
    jac_fn = jax.jacfwd(lambda p: coords_fn(p))  # [2, N, P]

    if use_pallas:
        # imported outside any traced scope (tracer-leak hygiene)
        from fbanet_tpu.ops.warp_pallas import warp_burst_coords_pallas

    def warp_stacked(cyx: Array) -> Array:
        if use_pallas:
            return warp_burst_coords_pallas(stacked[None], cyx[None])[0]
        return warp_image(stacked, cyx)

    def step(p):
        cxy = coords_fn(p)  # [2, N]
        cyx = jnp.stack([cxy[1], cxy[0]], axis=-1).reshape(h, w, 2)
        warped = warp_stacked(cyx)
        iw = warped[..., 0].reshape(-1)
        ixw = warped[..., 1].reshape(-1)
        iyw = warped[..., 2].reshape(-1)

        ibar = iw - jnp.mean(iw)
        i_norm2 = jnp.sum(ibar * ibar) + 1e-12

        dwdp = jac_fn(p)  # [2, N, P]
        g = ixw[:, None] * dwdp[0] + iyw[:, None] * dwdp[1]  # [N, P]

        c = g.T @ g + 1e-8 * jnp.eye(g.shape[1])
        gt = g.T @ tbar
        gi = g.T @ ibar
        c_inv_gi = jnp.linalg.solve(c, gi)
        corr = jnp.dot(tbar, ibar)

        lam_num = i_norm2 - jnp.dot(gi, c_inv_gi)
        lam_den = corr - jnp.dot(gt, c_inv_gi)
        # guard: if the denominator collapses the images are (locally)
        # uncorrelated — freeze the update (OpenCV raises instead).
        lam = jnp.where(jnp.abs(lam_den) < 1e-12, 1.0, lam_num / lam_den)

        err = lam * tbar - ibar
        dp = jnp.linalg.solve(c, g.T @ err)
        dp = jnp.where(jnp.isfinite(dp), dp, jnp.zeros_like(dp))
        rho = corr / (t_norm * jnp.sqrt(i_norm2))
        return p + dp, rho

    return _run_ecc_iters(step, p0, num_iters, eps)


@typed
def ecc_align(
    template: Float[JArray, "h w"],
    image: Float[JArray, "h w"],
    *,
    motion: Motion = "translation",
    levels: int = 3,
    iters_per_level: int = 25,
    eps: float = 0.0,
    init_matrix: Float[JArray, "3 3"] | None = None,
) -> tuple[Float[JArray, "3 3"], Float[JArray, ""]]:
    """Estimate the warp aligning `image` to `template`.

    Both inputs are grayscale `[H, W]` f32. Returns `(matrix, rho)` where
    `matrix` is the 3x3 warp mapping template coords -> image coords (feed it
    straight to `warp_burst_homography`, which uses the same inverse-map
    convention as the reference's `cv2.warpAffine(..., WARP_INVERSE_MAP)`),
    and `rho` is the final correlation coefficient at full resolution.

    Equivalent of `cv2.findTransformECC` (reference:
    fba_net/homography_alignment.py:38-44 uses 100 iters, eps 1e-10; three
    pyramid levels mirror fba_net/registration/pyramid.py:52-64). With
    `eps > 0` iterations terminate when the correlation increment drops
    below eps — cv2's TermCriteria(COUNT+EPS) semantics; eps == 0 keeps a
    fixed trip count (static, XLA-friendliest).
    """
    template = template.astype(jnp.float32)
    image = image.astype(jnp.float32)

    pyr_t, pyr_i = [template], [image]
    for _ in range(levels - 1):
        pyr_t.append(_blur_and_halve(pyr_t[-1]))
        pyr_i.append(_blur_and_halve(pyr_i[-1]))

    m = jnp.eye(3, dtype=jnp.float32) if init_matrix is None else init_matrix
    m = _scale_matrix(m, 0.5 ** (levels - 1))
    rho = jnp.float32(0.0)
    for lvl in reversed(range(levels)):
        p = matrix_to_params(m, motion)
        p, rho = _ecc_single_level(pyr_t[lvl], pyr_i[lvl], p, motion,
                                   iters_per_level, eps)
        m = params_to_matrix(p, motion)
        if lvl > 0:
            m = _scale_matrix(m, 2.0)

    # Failure semantics: a non-finite or badly-correlated solution falls back
    # to identity, mirroring the reference's "write the unaligned frame"
    # behavior (homography_alignment.py:142-144).
    ok = jnp.isfinite(rho) & jnp.all(jnp.isfinite(m))
    m = jnp.where(ok, m, jnp.eye(3, dtype=jnp.float32))
    rho = jnp.where(ok, rho, jnp.float32(-1.0))
    return m, rho


@typed
def online_register(batch: Float[JArray, "b f h w c"], method: str = "ecc"
                    ) -> Float[JArray, "b f h w c"]:
    """Register a batched burst `[B, F, H, W, C]` to frame 0 inside a
    training/eval step — the reference's *online* DALI registration graph
    (decode -> optical flow -> remap, fba_net/pipeline/real_bsr_iterator.py)
    as a differentiation-free preprocessing stage.

    method: "ecc" (translation ECC, the robust default) or "flow" (dense
    pyramidal LK + backward warp, the DALI-equivalent path). Gradients are
    stopped: registration is data preparation, not a learned component.
    """
    from fbanet_tpu.ops.flow import burst_optical_flow  # noqa: F401 (hoisted
    # out of the traced branch below: importing during tracing leaks any
    # module-level jnp constants as tracers)
    from fbanet_tpu.ops.warp import warp_flow  # noqa: F401

    batch = jax.lax.stop_gradient(batch)
    if method == "ecc":
        # eps termination (cv2 TermCriteria semantics) nearly halves the
        # hot-path align cost at identical recovered-transform accuracy:
        # 9.06 -> 5.20 ms at B8/F14/160px on v5e vs the old fixed 3x10
        # budget, with 2.5x the per-level iteration headroom
        # (scripts/measure_ecc_eps.py, docs/ROUND4.md §8).
        aligned, _m, _r = align_burst(batch, motion="translation",
                                      levels=3, iters_per_level=25,
                                      eps=1e-5)
        return aligned
    if method == "flow":
        def one(burst: Array) -> Array:
            flows = burst_optical_flow(burst, levels=3, iters_per_level=5)
            warped = jax.vmap(warp_flow)(burst[1:], flows)
            return jnp.concatenate([burst[:1], warped], axis=0)

        return jax.vmap(one)(batch)
    raise ValueError(f"unknown online registration method {method}")


def align_burst(
    burst: Array,
    *,
    motion: Motion = "translation",
    levels: int = 3,
    iters_per_level: int = 25,
    eps: float = 0.0,
    interp: str = "bilinear",
) -> tuple[Array, Array, Array]:
    """Align every frame of `[F, H, W, C]` (or `[B, F, H, W, C]`) to frame 0.

    Returns `(aligned_burst, matrices, rhos)`. One compiled program replaces
    the reference's offline multiprocessing alignment of the whole burst
    (fba_net/homography_alignment.py:147-198); frame 0 keeps an identity
    matrix and passes through untouched.
    """
    if burst.ndim == 5:
        fn = jax.vmap(lambda b: align_burst(
            b, motion=motion, levels=levels, iters_per_level=iters_per_level,
            eps=eps, interp=interp))
        return fn(burst)
    f = burst.shape[0]
    gray = rgb_to_gray(burst)  # [F, H, W]
    template = gray[0]

    est = jax.vmap(lambda img: ecc_align(
        template, img, motion=motion, levels=levels,
        iters_per_level=iters_per_level, eps=eps))
    mats, rhos = est(gray[1:])

    mats = jnp.concatenate([jnp.eye(3, dtype=jnp.float32)[None], mats])
    rhos = jnp.concatenate([jnp.ones((1,), jnp.float32), rhos])

    if motion == "translation" and interp == "bilinear":
        # gather-free final warp: matrices are in-program values, which would
        # push the XLA gather onto its slow computed-index path
        def warp_one(frame: Array, mat: Array) -> Array:
            p = jnp.array([mat[0, 2], mat[1, 2]])
            return _warp_translation_mm(
                frame.transpose(2, 0, 1), p).transpose(1, 2, 0)

        aligned = jax.vmap(warp_one)(burst.astype(jnp.float32), mats)
        aligned = aligned.astype(burst.dtype)
    elif jax.default_backend() == "tpu" and burst.shape[1] % 8 == 0 and \
            interp == "bilinear":
        from fbanet_tpu.ops.warp_pallas import warp_burst_bilinear_pallas  # no jnp module constants

        aligned = warp_burst_bilinear_pallas(burst, mats)
    else:
        aligned = warp_burst_homography(burst, mats, interp=interp)
    # frame 0 must be bit-identical (no resampling of the reference frame)
    aligned = aligned.at[0].set(burst[0])
    assert aligned.shape[0] == f
    return aligned, mats, rhos
