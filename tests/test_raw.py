"""RAW (packed-Bayer) tests: utilities + the end-to-end 4-channel path
(BASELINE.json configs[3]: packed-Bayer alignment + fusion + SR)."""

import jax.numpy as jnp
import numpy as np
import pytest

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


# ----------------------------------------------------- end-to-end 4-channel --

RAW_COMMON = ["--train_ps", "16", "--embed_dim", "8", "--win_size", "4",
              "--burst_size", "3", "--dtype", "float32", "--in_channels", "4"]


@pytest.fixture(scope="module")
def raw_root(tmp_path_factory):
    from fbanet_tpu.data.synthetic import write_synthetic_realbsr

    root = tmp_path_factory.mktemp("raw_ds")
    write_synthetic_realbsr(root, num_bursts=3, num_frames=3, lr_size=16,
                            layout="aligned", channels=4)
    return root


def test_raw_dataset_decode(raw_root):
    """16-bit packed-Bayer PNGs decode to f32 [F, h, w, 4] in [0, 1] with
    /16383 normalization (reference storage format:
    post_processing_vis.py:104-110)."""
    from fbanet_tpu.data.realbsr import RealBSRDataset

    ds = RealBSRDataset(raw_root, split="train", burst_size=3, crop_size=16,
                        channels=4)
    s = ds.load(0, np.random.default_rng(0))
    assert s["LR"].shape == (3, 16, 16, 4)
    assert s["HR"].shape == (64, 64, 4)
    assert s["LR"].dtype == np.float32
    assert 0.0 <= s["LR"].min() and s["LR"].max() <= 1.0
    # 16-bit depth actually used (not an 8-bit image in disguise):
    # quantization step must be ~1/16383, far finer than 1/255
    vals = np.unique(s["HR"])
    assert len(vals) > 300


@pytest.fixture(scope="module")
def raw_trained(raw_root, tmp_path_factory):
    """Train the 4-channel model through the real CLI (exercises config
    plumbing, loader, eval and checkpointing at in_channels=4)."""
    from fbanet_tpu import train as T

    save = tmp_path_factory.mktemp("raw_log")
    T.main(["--dataroot", str(raw_root), "--batch_size", "2", "--nepoch", "1",
            "--save_dir", str(save), "--env", "_raw", "--train_workers", "2",
            "--eval_workers", "2", *RAW_COMMON])
    ckpt = save / "log" / "BaseModel_raw" / "models" / "model_best"
    assert ckpt.with_suffix(".msgpack").exists()
    return ckpt


def test_raw_train_cli(raw_trained):
    pass  # the fixture is the test


def test_raw_train_step_reduces_loss():
    """Direct 4-channel train-step convergence (no CLI)."""
    import jax

    from fbanet_tpu.config import ModelConfig, TrainConfig
    from fbanet_tpu.data.synthetic import synthetic_burst
    from fbanet_tpu.models import init_model
    from fbanet_tpu.train import make_optimizer, make_train_step

    cfg = ModelConfig(num_frames=2, img_size=16, in_channels=4, embed_dim=8,
                      window_size=4, dtype="float32", drop_path_rate=0.0,
                      attention_impl="xla", remat=False)
    model, params = init_model(cfg, jax.random.key(0), batch_size=2)
    tcfg = TrainConfig(lr_initial=1e-3, donate_state=False)
    tx = make_optimizer(tcfg)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, tcfg)

    rng = np.random.default_rng(0)
    lrs, hrs = [], []
    for _ in range(2):
        lr, hr, _ = synthetic_burst(rng, num_frames=2, lr_size=16, channels=4)
        lrs.append(lr)
        hrs.append(hr)
    batch_lr = jnp.asarray(np.stack(lrs))
    batch_hr = jnp.asarray(np.stack(hrs))

    losses = []
    for i in range(6):
        params, opt_state, loss = step(params, opt_state, batch_lr, batch_hr,
                                       jax.random.key(i), 1e-3)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_raw_tiled_cli(raw_root, raw_trained, tmp_path):
    """Any-resolution tiled inference on the RAW tree: packed 4-channel
    prediction (npy) + display RGB via the reference post-processing."""
    from PIL import Image

    from fbanet_tpu import tiled as TL

    TL.main(["--dataroot", str(raw_root), "--weights", str(raw_trained),
             "--psize", "8", "--overlap", "4",
             "--result_dir", str(tmp_path / "tiled_raw"), *RAW_COMMON])
    pngs = sorted((tmp_path / "tiled_raw").glob("*.png"))
    npys = sorted((tmp_path / "tiled_raw").glob("*.npy"))
    assert len(pngs) == 3 and len(npys) == 3
    raw_pred = np.load(npys[0])
    assert raw_pred.shape == (64, 64, 4)  # 16px LR x4, packed
    vis = np.asarray(Image.open(pngs[0]))
    assert vis.shape == (64, 64, 3)  # display RGB collapse


def test_raw_evaluate_cli(raw_root, raw_trained, tmp_path, capsys):
    from fbanet_tpu import evaluate as E

    E.main(["--dataroot", str(raw_root), "--weights", str(raw_trained),
            "--result_dir", str(tmp_path / "raw_res"), "--save_images",
            *RAW_COMMON])
    out = capsys.readouterr().out
    assert "PSNR:" in out and "nan" not in out
    pngs = list((tmp_path / "raw_res").glob("*.png"))
    assert len(pngs) == 3
    from PIL import Image

    assert np.asarray(Image.open(pngs[0])).shape[-1] == 3  # vis RGB
