"""LPIPS numeric validation against a torch evaluation of the same weights.

The real pretrained weights are unobtainable here (zero egress), so these
tests pin the *computation*: a torch re-implementation of the lpips-alex
forward (scaling layer -> AlexNet feature slices -> unit-normalize -> squared
diff -> nonnegative 1x1 heads -> spatial mean -> sum) evaluated on random
weights must agree with fbanet_tpu.models.lpips to ~1e-5. With that pinned,
only the weight *values* remain environment-blocked, and
scripts/export_lpips_weights.py's layout conversion is covered by the
lpips-shaped fake state_dict test.

Reference semantics: fba_net/utils/image_utils.py:200-228 (LPIPS metric,
boundary_ignore=40, fed [0,1] tensors without lpips' normalize flag).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from fbanet_tpu.models.lpips import LPIPS, random_initialized_lpips  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
from export_lpips_weights import convert_state_dict  # noqa: E402

# (out_channels, kernel, stride, padding, pool_before) — torchvision AlexNet
ALEX = ((64, 11, 4, 2, False), (192, 5, 1, 2, True), (384, 3, 1, 1, True),
        (256, 3, 1, 1, False), (256, 3, 1, 1, False))


def torch_lpips(w: dict[str, np.ndarray], pred_nhwc: np.ndarray,
                target_nhwc: np.ndarray) -> np.ndarray:
    """Evaluate the lpips-alex formulation in torch from our npz layout."""

    def features(x):
        x = (x - torch.tensor(w["shift"]).view(1, 3, 1, 1)) / \
            torch.tensor(w["scale"]).view(1, 3, 1, 1)
        feats = []
        for i, (_c, _k, s, p, pool) in enumerate(ALEX):
            if pool:
                x = F.max_pool2d(x, 3, stride=2)
            cw = torch.tensor(w[f"conv{i}_w"]).permute(3, 2, 0, 1)  # HWIO->OIHW
            x = F.conv2d(x, cw, torch.tensor(w[f"conv{i}_b"]), stride=s,
                         padding=p)
            x = F.relu(x)
            feats.append(x)
        return feats

    def unit(x):
        return x / (torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True)) + 1e-10)

    with torch.no_grad():
        f1 = features(torch.tensor(pred_nhwc.transpose(0, 3, 1, 2)))
        f2 = features(torch.tensor(target_nhwc.transpose(0, 3, 1, 2)))
        total = torch.zeros(pred_nhwc.shape[0])
        for i, (a, b) in enumerate(zip(f1, f2)):
            diff = (unit(a) - unit(b)) ** 2
            lin = torch.tensor(w[f"lin{i}_w"]).view(1, -1, 1, 1)
            total = total + (diff * lin).sum(dim=1).mean(dim=(1, 2))
    return total.numpy()


def test_lpips_matches_torch_evaluation():
    m = random_initialized_lpips(seed=3)
    w = {k: np.asarray(v) for k, v in m.w.items()}
    rng = np.random.default_rng(0)
    pred = rng.uniform(size=(2, 96, 96, 3)).astype(np.float32)
    target = rng.uniform(size=(2, 96, 96, 3)).astype(np.float32)
    expected = torch_lpips(w, pred, target)
    got = np.asarray(m(jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)
    # identical inputs -> zero distance
    same = np.asarray(m(jnp.asarray(pred), jnp.asarray(pred)))
    np.testing.assert_allclose(same, 0.0, atol=1e-7)


def test_lpips_boundary_ignore_crops_before_network():
    m = random_initialized_lpips(seed=4)
    rng = np.random.default_rng(1)
    pred = rng.uniform(size=(1, 160, 160, 3)).astype(np.float32)
    target = rng.uniform(size=(1, 160, 160, 3)).astype(np.float32)
    cropped = np.asarray(m(jnp.asarray(pred), jnp.asarray(target),
                           boundary_ignore=40))
    manual = np.asarray(m(jnp.asarray(pred[:, 40:-40, 40:-40]),
                          jnp.asarray(target[:, 40:-40, 40:-40])))
    np.testing.assert_allclose(cropped, manual, rtol=1e-6)


def test_export_conversion_from_lpips_shaped_state_dict():
    """convert_state_dict handles the exact key/tensor layout the torch
    lpips package exposes; the converted weights evaluate identically."""
    rng = np.random.default_rng(5)
    # synthesize an lpips.LPIPS(net='alex')-shaped state_dict
    sd = {
        "scaling_layer.shift": rng.normal(size=(1, 3, 1, 1)).astype(np.float32),
        "scaling_layer.scale": (rng.uniform(0.3, 0.6, size=(1, 3, 1, 1))
                                .astype(np.float32)),
    }
    # lpips wraps torchvision alexnet.features; conv indices are 0,3,6,8,10
    feature_idx = [0, 3, 6, 8, 10]
    slices = [1, 2, 3, 4, 5]
    cin = 3
    for (cout, k, _s, _p, _pool), fi, sl in zip(ALEX, feature_idx, slices):
        sd[f"net.slice{sl}.{fi}.weight"] = (
            rng.normal(0, 0.05, size=(cout, cin, k, k)).astype(np.float32))
        sd[f"net.slice{sl}.{fi}.bias"] = np.zeros(cout, np.float32)
        cin = cout
    for i, (cout, *_rest) in enumerate(ALEX):
        sd[f"lin{i}.model.1.weight"] = (
            rng.uniform(0, 0.1, size=(1, cout, 1, 1)).astype(np.float32))

    w = convert_state_dict(sd)
    pred = rng.uniform(size=(1, 80, 80, 3)).astype(np.float32)
    target = rng.uniform(size=(1, 80, 80, 3)).astype(np.float32)
    expected = torch_lpips(w, pred, target)
    got = np.asarray(LPIPS(w)(jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)
