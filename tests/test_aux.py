"""Tests for auxiliary subsystems: LPIPS architecture, bake-off harness,
profiling utils, single-image datasets, patch generation, submission bundling."""

import numpy as np
import pytest

import jax.numpy as jnp


# --- LPIPS -------------------------------------------------------------------

def test_lpips_architecture_shapes_and_ordering():
    from fbanet_tpu.models.lpips import random_initialized_lpips

    m = random_initialized_lpips()
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(size=(2, 96, 96, 3)).astype(np.float32))
    b = jnp.clip(a + 0.2 * jnp.asarray(
        rng.normal(size=a.shape).astype(np.float32)), 0, 1)
    d_same = np.asarray(m(a, a))
    d_diff = np.asarray(m(a, b))
    assert d_same.shape == (2,)
    assert np.allclose(d_same, 0.0, atol=1e-6)
    assert np.all(d_diff > 0)


def test_lpips_boundary_crop():
    from fbanet_tpu.models.lpips import random_initialized_lpips

    m = random_initialized_lpips()
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(size=(1, 160, 160, 3)).astype(np.float32))
    b = a.at[:, :40].set(0.0)  # corrupt only the boundary
    d = float(m(a, b, boundary_ignore=40)[0])
    assert d < 1e-6


def test_lpips_roundtrip_npz(tmp_path):
    from fbanet_tpu.models.lpips import load_lpips, random_initialized_lpips

    m = random_initialized_lpips()
    np.savez(tmp_path / "w.npz", **{k: np.asarray(v) for k, v in m.w.items()})
    m2 = load_lpips(tmp_path / "w.npz")
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(m(a, b)), np.asarray(m2(a, b)),
                               rtol=1e-6)


# --- bake-off ----------------------------------------------------------------

def test_bakeoff_improves_alignment():
    from fbanet_tpu.bakeoff import compare_registrations
    from fbanet_tpu.data.synthetic import synthetic_burst

    lr, _, _ = synthetic_burst(np.random.default_rng(3), num_frames=2,
                               lr_size=64, aligned=False, max_shift=2.5,
                               noise=0.0)
    res = compare_registrations(lr[0], lr[1],
                                methods=("flow", "translation"))
    assert res["translation"]["psnr"] > res["unaligned"]["psnr"] + 3
    assert res["flow"]["psnr"] > res["unaligned"]["psnr"]


# --- profiling ---------------------------------------------------------------

def test_step_timer():
    import time

    from fbanet_tpu.utils.profiling import StepTimer

    t = StepTimer(skip_first=1)
    for _ in range(4):
        with t.step():
            time.sleep(0.01)
    s = t.summary()
    assert s["steps"] == 4
    assert 0.005 < s["p50_s"] < 0.2
    assert "steps/s" in t.report()


# --- single-image data tools ---------------------------------------------------

@pytest.fixture()
def paired_root(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(4)
    for sub in ("groundtruth", "input"):
        (tmp_path / sub).mkdir()
    for i in range(3):
        clean = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        noisy = np.clip(clean + rng.normal(0, 10, clean.shape), 0,
                        255).astype(np.uint8)
        Image.fromarray(clean).save(tmp_path / "groundtruth" / f"{i:03d}.png")
        Image.fromarray(noisy).save(tmp_path / "input" / f"{i:03d}.png")
    return tmp_path


def test_paired_dataset(paired_root):
    from fbanet_tpu.data.single_image import PairedImageDataset

    ds = PairedImageDataset(paired_root, split="train", patch_size=32)
    assert len(ds) == 3
    s = ds.load(0, np.random.default_rng(0))
    assert s["gt"].shape == (32, 32, 3)
    assert s["input"].shape == (32, 32, 3)
    # val path: deterministic center crop, no augmentation
    v1 = PairedImageDataset(paired_root, split="val", patch_size=32).load(1)
    v2 = PairedImageDataset(paired_root, split="val", patch_size=32).load(1)
    np.testing.assert_array_equal(v1["gt"], v2["gt"])


def test_generate_patches(paired_root, tmp_path):
    from fbanet_tpu.data.single_image import generate_patches

    out = tmp_path / "patches"
    n = generate_patches(paired_root / "groundtruth", out, patch_size=32,
                         patches_per_image=2)
    assert n == 6
    assert len(list(out.glob("*.png"))) == 6


def test_bundle_submission(tmp_path):
    from PIL import Image

    from fbanet_tpu.data.single_image import bundle_submission
    from fbanet_tpu.utils.mat5 import loadmat

    res = tmp_path / "res"
    res.mkdir()
    rng = np.random.default_rng(5)
    blocks_written = {}
    for img in range(2):
        for block in range(3):
            a = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
            blocks_written[(img, block)] = a
            Image.fromarray(a).save(res / f"{img:04d}_{block:02d}.png")
    out = bundle_submission(res, tmp_path / "mat")

    mats = sorted(out.glob("*.mat"))
    assert len(mats) == 2
    # round-trip through whichever reader is available; the vendored
    # mat5.loadmat reads both its own output and scipy's
    loaded = loadmat(mats[0])["results"]
    assert loaded.shape == (1, 3)
    for block in range(3):
        np.testing.assert_array_equal(loaded[0, block],
                                      blocks_written[(0, block)])
    try:  # cross-check against scipy's parser when the env has it
        from scipy import io as sio
    except ImportError:
        pass
    else:
        sp = sio.loadmat(mats[1])["results"]
        for block in range(3):
            np.testing.assert_array_equal(sp[0, block],
                                          blocks_written[(1, block)])


def test_mat5_roundtrip_numeric(tmp_path):
    from fbanet_tpu.utils.mat5 import loadmat, savemat

    rng = np.random.default_rng(0)
    arrs = {
        "u8": rng.integers(0, 256, (5, 7, 3), dtype=np.uint8),
        "f32": rng.normal(size=(4, 6)).astype(np.float32),
        "f64": rng.normal(size=(3,)),
        "i32": rng.integers(-5, 5, (2, 2), dtype=np.int32),
    }
    savemat(tmp_path / "x.mat", arrs)
    back = loadmat(tmp_path / "x.mat")
    np.testing.assert_array_equal(back["u8"], arrs["u8"])
    np.testing.assert_array_equal(back["f32"], arrs["f32"])
    np.testing.assert_array_equal(back["f64"], arrs["f64"].reshape(1, -1))
    np.testing.assert_array_equal(back["i32"], arrs["i32"])


# --- bench.py driver-contract hardening ---------------------------------------

def test_bench_probe_device_happy_path():
    """The wedge watchdog's probe completes on a healthy backend (CPU here)."""
    import bench

    assert bench._probe_device(timeout_s=120.0) is True


def test_bench_probe_device_detects_hang(monkeypatch):
    """Wedged-tunnel mode: relay accepts TCP but compiles hang forever. The
    probe must give up after the timeout instead of hanging the driver."""
    import time as _time

    import jax as _jax

    import bench

    def hang(fn):
        def inner(*a, **k):
            _time.sleep(60.0)
            return fn(*a, **k)
        return inner

    monkeypatch.setattr(_jax, "jit", hang)
    assert bench._probe_device(timeout_s=0.5) is False


def test_bench_emit_unavailable_prints_one_parseable_line(capsys):
    """The driver contract: exactly ONE JSON line on stdout, machine-readable
    error marker, and deduplication once the real line has been printed."""
    import json as _json
    import threading

    import bench

    bench._EMITTED = threading.Event()
    try:
        bench._emit_unavailable("first")
        bench._emit_unavailable("second")  # deduped: _EMITTED already set
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == 1
        rec = _json.loads(out[0])
        assert rec["error"] == "tpu_unavailable"
        assert rec["value"] is None and rec["vs_baseline"] is None
        assert rec["metric"] == bench.METRIC_NAME
        assert rec["detail"] == "first"

        # once the success line is out, a late watchdog must stay silent
        bench._EMITTED = threading.Event()
        bench._EMITTED.set()
        bench._emit_unavailable("late watchdog")
        assert capsys.readouterr().out == ""
    finally:
        bench._EMITTED = None
