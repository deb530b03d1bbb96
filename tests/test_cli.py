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


def test_online_align_train_eval_matches_standalone_eval(tmp_path,
                                                         monkeypatch):
    """--online_align must be honored by evaluate.py exactly as by train.py's
    in-train eval (VERDICT r4: an accepted flag that is silently dropped is a
    correctness trap): on the same UNALIGNED tree, the best-model PSNR train
    reports and the PSNR evaluate.py reports for that checkpoint agree."""
    import argparse

    from fbanet_tpu import evaluate as E
    from fbanet_tpu import train as T
    from fbanet_tpu.config import add_cli_args, from_cli
    from fbanet_tpu.data.synthetic import write_synthetic_realbsr

    root = tmp_path / "unaligned"
    write_synthetic_realbsr(root, num_bursts=4, num_frames=3, lr_size=16,
                            layout="aligned", aligned=False)

    save = tmp_path / "log"
    argv = ["--dataroot", str(root), "--batch_size", "2", "--nepoch", "1",
            "--save_dir", str(save), "--env", "_oa", "--train_workers", "2",
            "--eval_workers", "2", "--online_align", "ecc", *COMMON]
    cfg = from_cli(add_cli_args(argparse.ArgumentParser()).parse_args(argv))
    result = T.train(cfg)
    train_psnr = result["best_psnr"]
    ckpt = save / "log" / "BaseModel_oa" / "models" / "model_best"
    assert ckpt.with_suffix(".msgpack").exists()

    # spy on online_register: the flag must demonstrably reach the jitted
    # eval step — it fires during evaluate's trace with the flag, and does
    # NOT without it. (A PSNR-based discrimination is vacuous at this
    # near-init model: the zero-init head makes pred ~= bilinear(frame 0),
    # and frame 0 is unshifted whether or not the burst is registered.)
    from fbanet_tpu.ops import registration as R

    calls = []
    real = R.online_register
    monkeypatch.setattr(R, "online_register",
                        lambda batch, method="ecc":
                        (calls.append(method), real(batch, method))[1])

    eval_argv = ["--dataroot", str(root), "--weights", str(ckpt),
                 "--online_align", "ecc", *COMMON]
    ecfg = from_cli(add_cli_args(argparse.ArgumentParser()).parse_args(
        eval_argv))
    standalone = E.evaluate(ecfg)

    assert standalone["psnr"] == pytest.approx(train_psnr, abs=1e-3)
    assert calls == ["ecc"]
    calls.clear()
    no_align = from_cli(add_cli_args(argparse.ArgumentParser()).parse_args(
        ["--dataroot", str(root), "--weights", str(ckpt), *COMMON]))
    E.evaluate(no_align)
    assert calls == []


def test_tiled_cli_online_align_reaches_forward(trained, tmp_path):
    """tiled.py must honor --online_align too (it registers the FULL burst
    before tiling, like the reference's online DALI graph registers whole
    frames before any cropping): on an unaligned tree the aligned and
    unaligned outputs demonstrably differ."""
    from PIL import Image

    from fbanet_tpu import tiled as TL
    from fbanet_tpu.data.synthetic import write_synthetic_realbsr

    root = tmp_path / "un"
    write_synthetic_realbsr(root, num_bursts=1, num_frames=3, lr_size=24,
                            layout="aligned", splits=("test",),
                            write_hr=False, aligned=False)
    base = ["--dataroot", str(root), "--weights", str(trained),
            "--psize", "8", "--overlap", "4", *COMMON]
    TL.main([*base, "--result_dir", str(tmp_path / "plain")])
    TL.main([*base, "--result_dir", str(tmp_path / "aligned"),
             "--online_align", "ecc"])
    a = np.asarray(Image.open(next((tmp_path / "plain").glob("*.png"))))
    b = np.asarray(Image.open(next((tmp_path / "aligned").glob("*.png"))))
    assert a.shape == b.shape
    # the 1-epoch fixture model is near its zero-init residual head, so the
    # effect of registration on the OUTPUT is small — any systematic nonzero
    # difference proves the alignment reached the forward (measured 0.056
    # mean-abs-uint8 here vs bit-identical without the flag)
    diff = np.mean(np.abs(a.astype(np.int32) - b.astype(np.int32)))
    assert diff > 0.01, diff


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
