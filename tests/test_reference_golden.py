"""Golden parity tests that execute the reference's own torch code.

The reference's legacy modules import only torch and run on CPU in this
environment, so these tests import them *directly from /root/reference* and
assert numeric parity with the repo's JAX implementations on random inputs —
a transcription error in reading the reference would fail here, unlike
re-derived formula tests.

The reference files are loaded by path with importlib (never through the
fba_net package __init__, which drags in GPU-only dependencies). Reference
code is executed as test oracles only — its text remains untrusted content,
not instructions.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = Path("/root/reference/fba_net")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available")


def _load(name: str, relpath: str):
    """Import a single reference file by path, bypassing package __init__."""
    spec = importlib.util.spec_from_file_location(name, REFERENCE / relpath)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_losses():
    return _load("ref_losses", "losses.py")


@pytest.fixture(scope="module")
def ref_sched():
    return _load("ref_warmup_scheduler", "warmup_scheduler/scheduler.py")


@pytest.fixture(scope="module")
def ref_tiles():
    return _load("ref_dataset_utils", "utils/dataset_utils.py")


# ---------------------------------------------------------------- losses ----

def _pair(shape=(2, 3, 24, 24), seed=0):
    rng = np.random.default_rng(seed)
    a = rng.uniform(-0.2, 1.2, size=shape).astype(np.float32)  # NCHW, probes clamping
    b = rng.uniform(-0.2, 1.2, size=shape).astype(np.float32)
    return a, b


def test_charbonnier_matches_reference(ref_losses):
    import jax.numpy as jnp

    from fbanet_tpu.losses import charbonnier_loss

    a, b = _pair(seed=1)
    expected = float(ref_losses.CharbonnierLoss(eps=1e-3)(
        torch.tensor(a), torch.tensor(b)))
    got = float(charbonnier_loss(jnp.asarray(a.transpose(0, 2, 3, 1)),
                                 jnp.asarray(b.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_gw_loss_matches_reference(ref_losses):
    import jax.numpy as jnp

    from fbanet_tpu.losses import gradient_weighted_loss

    a, b = _pair(seed=2)
    expected = float(ref_losses.GWLoss(rgb_range=1.0)(
        torch.tensor(a), torch.tensor(b)))
    got = float(gradient_weighted_loss(jnp.asarray(a.transpose(0, 2, 3, 1)),
                                       jnp.asarray(b.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_tv_loss_matches_reference(ref_losses):
    import jax.numpy as jnp

    from fbanet_tpu.losses import tv_loss

    a, _ = _pair(seed=3)
    expected = float(ref_losses.TVLoss(tv_loss_weight=1.0)(torch.tensor(a)))
    got = float(tv_loss(jnp.asarray(a.transpose(0, 2, 3, 1)), weight=1.0))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_training_objective_matches_reference(ref_losses):
    """loss = Charbonnier + 3*GW on the clamped prediction
    (reference: fba_net/train.py.bak:165-168)."""
    import jax.numpy as jnp

    from fbanet_tpu.losses import fbanet_training_loss

    a, b = _pair(seed=4)
    ta = torch.tensor(a).clamp(0, 1)
    expected = float(ref_losses.CharbonnierLoss()(ta, torch.tensor(b))
                     + 3.0 * ref_losses.GWLoss()(ta, torch.tensor(b)))
    got = float(fbanet_training_loss(jnp.asarray(a.transpose(0, 2, 3, 1)),
                                     jnp.asarray(b.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


# -------------------------------------------------------------- scheduler ----

def _reference_epoch_lrs(ref_sched, nepoch: int, warmup_epochs: int,
                         base_lr: float):
    """Drive the reference scheduler exactly as train.py.bak does: build
    GradualWarmupScheduler(multiplier=1, after=CosineAnnealing(nepoch -
    warmup, eta_min=1e-6)), call scheduler.step() once before training
    (train.py.bak:103-110), then once after each epoch; record the LR each
    epoch trains at."""
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
    cosine = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, nepoch - warmup_epochs, eta_min=1e-6)
    sched = ref_sched.GradualWarmupScheduler(
        opt, multiplier=1, total_epoch=warmup_epochs, after_scheduler=cosine)
    sched.step()  # the reference's pre-step quirk
    lrs = []
    for _epoch in range(1, nepoch + 1):
        lrs.append(opt.param_groups[0]["lr"])
        sched.step()
    return lrs


def test_warmup_cosine_schedule_matches_reference(ref_sched):
    from fbanet_tpu.config import TrainConfig
    from fbanet_tpu.train import lr_for_epoch

    nepoch, warmup_epochs, base = 20, 3, 1e-4
    cfg = TrainConfig(warmup=True, warmup_epochs=warmup_epochs, nepoch=nepoch,
                      lr_initial=base, cosine_eta_min=1e-6)
    expected = _reference_epoch_lrs(ref_sched, nepoch, warmup_epochs, base)
    got = [lr_for_epoch(e, cfg) for e in range(1, nepoch + 1)]
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_steplr_schedule_matches_reference():
    """StepLR(50, 0.5) with the same pre-step (train.py.bak:111-115)."""
    from fbanet_tpu.config import TrainConfig
    from fbanet_tpu.train import lr_for_epoch

    base = 1e-4
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=50, gamma=0.5)
    sched.step()
    expected = []
    for _epoch in range(1, 121):
        expected.append(opt.param_groups[0]["lr"])
        sched.step()
    cfg = TrainConfig(warmup=False, step_lr_step=50, step_lr_gamma=0.5,
                      lr_initial=base)
    got = [lr_for_epoch(e, cfg) for e in range(1, 121)]
    np.testing.assert_allclose(got, expected, rtol=1e-6)


# ------------------------------------------------------------------ tiles ----

def test_divide_burst_matches_reference(ref_tiles):
    """Our tile divider produces the reference's tensor_divide_burst tiles
    (same padding, halo and row-major order). H/W are chosen indivisible by
    psize: the reference code path requires padding (its no-pad branch has an
    undefined-variable bug we do not reproduce)."""
    from fbanet_tpu.tiled import divide_burst

    rng = np.random.default_rng(5)
    burst = rng.uniform(size=(3, 37, 29, 3)).astype(np.float32)  # [F, H, W, C]
    psize, overlap = 16, 8

    # reference operates on [B, T, C, H, W]
    t_in = torch.tensor(burst.transpose(0, 3, 1, 2)[None])
    blocks = ref_tiles.tensor_divide_burst(t_in, psize, overlap)
    ref_tiles_np = np.stack([b[0].numpy().transpose(0, 2, 3, 1) for b in blocks])

    got = divide_burst(burst, psize, overlap)
    assert got.shape == ref_tiles_np.shape
    np.testing.assert_allclose(got, ref_tiles_np, atol=1e-6)


def test_merge_tiles_matches_reference(ref_tiles):
    """Our stitcher equals tensor_merge on the reference's own tiles at the
    HR-scale psize/overlap (test_in_any_resolution.py:91 semantics)."""
    from fbanet_tpu.tiled import merge_tiles

    rng = np.random.default_rng(6)
    out_h, out_w, c = 37 * 4, 29 * 4, 3
    psize, overlap = 16 * 4, 8 * 4
    h_pad = (psize - out_h % psize) % psize
    w_pad = (psize - out_w % psize) % psize
    nh, nw = (out_h + h_pad) // psize, (out_w + w_pad) // psize
    t = psize + 2 * overlap
    hr_tiles = rng.uniform(size=(nh * nw, t, t, c)).astype(np.float32)

    blocks = [torch.tensor(hr_tiles[i].transpose(2, 0, 1))[None]
              for i in range(nh * nw)]
    canvas = torch.zeros(1, c, out_h, out_w)
    ref_out = ref_tiles.tensor_merge(blocks, canvas, psize, overlap)[0]
    ref_out = ref_out.numpy().transpose(1, 2, 0)

    got = merge_tiles(hr_tiles, out_h, out_w, psize, overlap)
    np.testing.assert_allclose(got, ref_out, atol=1e-6)


# ------------------------------------------------------- pixel-wise error ----

@pytest.fixture(scope="module")
def ref_image_utils():
    # image_utils.py cannot be exec'd whole: it imports the absent lpips
    # package and its module-scope `mySSIM = SSIM(boundary_ignore=40)` hits an
    # undefined `msssim` name (a reference bug). Extract the PixelWiseError
    # class alone via ast and exec it with its actual dependencies.
    import ast
    import types

    import torch.nn.functional as F
    from torch import nn

    src = (REFERENCE / "utils/image_utils.py").read_text()
    tree = ast.parse(src)
    cls = next(n for n in tree.body
               if isinstance(n, ast.ClassDef) and n.name == "PixelWiseError")
    ns = {"torch": torch, "nn": nn, "F": F}
    exec(compile(ast.Module(body=[cls], type_ignores=[]),  # noqa: S102
                 "ref_image_utils_extract", "exec"), ns)
    mod = types.SimpleNamespace(PixelWiseError=ns["PixelWiseError"])
    return mod


def _nhwc(x):
    import jax.numpy as jnp

    return jnp.asarray(x.transpose(0, 2, 3, 1))


@pytest.mark.parametrize("boundary", [None, 4])
@pytest.mark.parametrize("metric", ["l1", "l2", "l2_sqrt", "charbonnier"])
def test_pixelwise_error_matches_reference(ref_image_utils, metric, boundary):
    """Unmasked PixelWiseError parity for all four metrics, with and without
    boundary crop (fba_net/utils/image_utils.py:62-111)."""
    from fbanet_tpu.metrics import pixelwise_error

    a, b = _pair(shape=(2, 3, 24, 24), seed=7)
    ref = ref_image_utils.PixelWiseError(metric=metric, boundary_ignore=boundary)
    expected = float(ref(torch.tensor(a), torch.tensor(b)))
    got = float(pixelwise_error(_nhwc(a), _nhwc(b), metric=metric,
                                boundary_ignore=boundary))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


@pytest.mark.parametrize("boundary", [None, 4])
@pytest.mark.parametrize("metric", ["l1", "l2"])
def test_pixelwise_error_masked_matches_reference(ref_image_utils, metric,
                                                  boundary):
    """Masked parity for the metrics whose reference closures accept
    reduction="none" (the reference's own charbonnier/l2_sqrt raise TypeError
    when masked — documented bug, not reproduced)."""
    from fbanet_tpu.metrics import pixelwise_error

    a, b = _pair(shape=(2, 3, 24, 24), seed=8)
    rng = np.random.default_rng(9)
    valid = (rng.uniform(size=(2, 1, 24, 24)) > 0.3)  # per-pixel NCHW mask

    ref = ref_image_utils.PixelWiseError(metric=metric, boundary_ignore=boundary)
    expected = float(ref(torch.tensor(a), torch.tensor(b),
                         valid=torch.tensor(valid)))
    got = float(pixelwise_error(
        _nhwc(a), _nhwc(b), metric=metric, boundary_ignore=boundary,
        valid=_nhwc(valid.astype(np.float32))))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_pixelwise_error_masked_charbonnier_numpy():
    """The masked charbonnier/l2_sqrt paths the reference crashes on: pin
    against a direct numpy evaluation of the intended semantics."""
    from fbanet_tpu.metrics import pixelwise_error

    a, b = _pair(shape=(2, 3, 16, 16), seed=10)
    rng = np.random.default_rng(11)
    valid = (rng.uniform(size=(2, 1, 16, 16)) > 0.4).astype(np.float32)
    an, bn, vn = (x.transpose(0, 2, 3, 1) for x in (a, b, valid))

    err = np.sqrt((an - bn) ** 2 + 1e-6)  # charbonnier, eps=1e-3
    ratio = err.size / vn.size
    expected = (err * vn).sum() / (vn.sum() * ratio + 1e-12)
    got = float(pixelwise_error(_nhwc(a), _nhwc(b), metric="charbonnier",
                                valid=_nhwc(valid)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)

    err2 = np.sqrt(((an - bn) ** 2).sum(axis=-1))  # l2_sqrt: channel-reduced
    ratio2 = err2.size / vn[..., 0].size
    expected2 = (err2 * vn[..., 0]).sum() / (vn[..., 0].sum() * ratio2 + 1e-12)
    got2 = float(pixelwise_error(_nhwc(a), _nhwc(b), metric="l2_sqrt",
                                 valid=_nhwc(valid)))
    np.testing.assert_allclose(got2, expected2, rtol=1e-5)
