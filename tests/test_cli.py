"""CLI-surface integration tests: run the actual entry points end to end on
tiny synthetic data. Unit tests call the library directly and have missed
CLI-only wiring bugs (boundary-guard ordering, flag plumbing) — these don't."""

import numpy as np
import pytest

from fbanet_tpu.data.synthetic import write_synthetic_realbsr


@pytest.fixture(scope="module")
def cli_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_ds")
    write_synthetic_realbsr(root, num_bursts=4, num_frames=3, lr_size=16,
                            layout="aligned")
    return root


COMMON = ["--train_ps", "16", "--embed_dim", "8", "--win_size", "4",
          "--burst_size", "3", "--dtype", "float32"]


@pytest.fixture(scope="module")
def trained(cli_root, tmp_path_factory):
    from fbanet_tpu import train as T

    save = tmp_path_factory.mktemp("cli_log")
    T.main(["--dataroot", str(cli_root), "--batch_size", "2", "--nepoch", "1",
            "--save_dir", str(save), "--env", "_t", "--train_workers", "2",
            "--eval_workers", "2", *COMMON])
    ckpt = save / "log" / "BaseModel_t" / "models" / "model_best"
    assert ckpt.with_suffix(".msgpack").exists()
    return ckpt


def test_train_cli(trained):
    pass  # the fixture is the test


def test_evaluate_cli(cli_root, trained, tmp_path, capsys):
    from fbanet_tpu import evaluate as E

    E.main(["--dataroot", str(cli_root), "--weights", str(trained),
            "--result_dir", str(tmp_path / "res"), "--save_images", *COMMON])
    out = capsys.readouterr().out
    assert "PSNR:" in out and "nan" not in out
    assert len(list((tmp_path / "res").glob("*.png"))) == 4


def test_evaluate_cli_with_lpips(cli_root, trained, tmp_path, capsys):
    from fbanet_tpu import evaluate as E
    from fbanet_tpu.models.lpips import random_initialized_lpips

    m = random_initialized_lpips()
    np.savez(tmp_path / "lp.npz", **{k: np.asarray(v) for k, v in m.w.items()})
    E.main(["--dataroot", str(cli_root), "--weights", str(trained),
            "--lpips_weights", str(tmp_path / "lp.npz"), *COMMON])
    out = capsys.readouterr().out
    assert "LPIPS:" in out and "nan" not in out


def test_tiled_cli(cli_root, trained, tmp_path):
    from fbanet_tpu import tiled as TL

    TL.main(["--dataroot", str(cli_root), "--weights", str(trained),
             "--psize", "8", "--overlap", "4",
             "--result_dir", str(tmp_path / "tiled"), *COMMON])
    outs = list((tmp_path / "tiled").glob("*.png"))
    assert len(outs) == 4


def test_align_cli(tmp_path, capsys):
    from PIL import Image

    from fbanet_tpu import align as A
    from fbanet_tpu.data.synthetic import synthetic_burst

    rng = np.random.default_rng(0)
    lr, _, _ = synthetic_burst(rng, num_frames=3, lr_size=32, aligned=False,
                               max_shift=2.0)
    d = tmp_path / "un" / "000_0"
    d.mkdir(parents=True)
    for f in range(3):
        Image.fromarray((lr[f] * 255 + 0.5).astype(np.uint8)).save(
            d / f"000_MFSR_Sony_0000_x4_{f:02d}.png")
    A.main(["--input_dir", str(tmp_path / "un"),
            "--output_dir", str(tmp_path / "al"), "--motion", "translation",
            "--levels", "2", "--iters", "15"])
    assert len(list((tmp_path / "al" / "000_0").glob("*.png"))) == 3
    assert "aligned 1 bursts" in capsys.readouterr().out


def test_align_cli_overlap_parity_flags(tmp_path, capsys):
    """--no_overlap (serial A/B path) writes bit-identical PNGs to the
    pipelined default, and --parity (the reference's exact cv2 settings:
    1 level, 100 iters, eps 1e-10) runs end to end."""
    from PIL import Image

    from fbanet_tpu import align as A
    from fbanet_tpu.data.synthetic import synthetic_burst

    rng = np.random.default_rng(5)
    for b in range(2):
        lr, _, _ = synthetic_burst(rng, num_frames=3, lr_size=32,
                                   aligned=False, max_shift=2.0)
        d = tmp_path / "un" / f"00{b}_0"
        d.mkdir(parents=True)
        for f in range(3):
            Image.fromarray((lr[f] * 255 + 0.5).astype(np.uint8)).save(
                d / f"00{b}_MFSR_Sony_000{b}_x4_{f:02d}.png")

    common = ["--input_dir", str(tmp_path / "un"), "--motion", "translation",
              "--levels", "2", "--iters", "15"]
    A.main([*common, "--output_dir", str(tmp_path / "pipelined")])
    A.main([*common, "--output_dir", str(tmp_path / "serial"),
            "--no_overlap"])
    outs = sorted((tmp_path / "pipelined").rglob("*.png"))
    assert len(outs) == 6
    for f in outs:
        g = tmp_path / "serial" / f.relative_to(tmp_path / "pipelined")
        np.testing.assert_array_equal(np.asarray(Image.open(f)),
                                      np.asarray(Image.open(g)))

    A.main(["--input_dir", str(tmp_path / "un"),
            "--output_dir", str(tmp_path / "parity"), "--parity"])
    assert len(list((tmp_path / "parity").rglob("*.png"))) == 6
    assert "aligned 2 bursts" in capsys.readouterr().out


def test_tiled_cli_gtfree(trained, tmp_path):
    """Tiled inference over a tree with NO HR files — the exact scenario
    any-resolution inference exists for (reference:
    fba_net/test_in_any_resolution.py:46 over ManualDatasets_test)."""
    from fbanet_tpu import tiled as TL
    from fbanet_tpu.data.synthetic import write_synthetic_realbsr

    root = tmp_path / "gtfree"
    write_synthetic_realbsr(root, num_bursts=2, num_frames=3, lr_size=24,
                            layout="aligned", splits=("test",), write_hr=False)
    TL.main(["--dataroot", str(root), "--weights", str(trained),
             "--psize", "8", "--overlap", "4",
             "--result_dir", str(tmp_path / "tiled_gtfree"), *COMMON])
    outs = list((tmp_path / "tiled_gtfree").glob("*.png"))
    assert len(outs) == 2
    # 24px LR x4 -> 96px HR output
    from PIL import Image

    assert Image.open(outs[0]).size == (96, 96)
