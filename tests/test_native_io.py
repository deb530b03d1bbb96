"""Native burst-IO library tests (skipped when the toolchain is unavailable)."""

import numpy as np
import pytest

from fbanet_tpu.data import native_io


pytestmark = pytest.mark.skipif(not native_io.available(),
                                reason=f"native burstio unavailable: "
                                       f"{native_io.unavailable_reason()}")


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    arrays = []
    for i in range(6):
        a = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
        Image.fromarray(a).save(d / f"f{i:02d}.png")
        arrays.append(a)
    return d, arrays


def test_decode_exact_uint8(png_dir):
    d, arrays = png_dir
    out = native_io.decode_files(sorted(d.glob("*.png")), 32, 48,
                                 as_float=False)
    assert out.shape == (6, 32, 48, 3) and out.dtype == np.uint8
    for i, a in enumerate(arrays):
        np.testing.assert_array_equal(out[i], a)


def test_decode_f32_normalized(png_dir):
    d, arrays = png_dir
    out = native_io.decode_files(sorted(d.glob("*.png")), 32, 48)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out[0], arrays[0] / 255.0, atol=1e-6)


def test_decode_grayscale_promoted(tmp_path):
    from PIL import Image

    a = np.random.default_rng(1).integers(0, 256, (16, 16), dtype=np.uint8)
    Image.fromarray(a, mode="L").save(tmp_path / "g.png")
    out = native_io.decode_files([tmp_path / "g.png"], 16, 16, as_float=False)
    for c in range(3):
        np.testing.assert_array_equal(out[0, :, :, c], a)


def test_decode_rgba_strips_alpha(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    Image.fromarray(a, mode="RGBA").save(tmp_path / "a.png")
    out = native_io.decode_files([tmp_path / "a.png"], 8, 8, as_float=False)
    np.testing.assert_array_equal(out[0], a[..., :3])


def test_corrupt_file_raises(tmp_path):
    p = tmp_path / "bad.png"
    p.write_bytes(b"definitely not a png")
    with pytest.raises(OSError):
        native_io.decode_files([p], 16, 16)


def test_size_mismatch_raises(png_dir):
    d, _ = png_dir
    with pytest.raises(OSError):
        native_io.decode_files(sorted(d.glob("*.png"))[:1], 64, 64)


def test_dataset_uses_native_path(tmp_path):
    from fbanet_tpu.data.realbsr import RealBSRDataset
    from fbanet_tpu.data.synthetic import write_synthetic_realbsr

    write_synthetic_realbsr(tmp_path, num_bursts=2, num_frames=3, lr_size=16)
    ds = RealBSRDataset(tmp_path, split="train", burst_size=3, crop_size=0)
    s = ds.load(0)
    assert s["LR"].shape == (3, 16, 16, 3)
    assert hasattr(ds, "_probe_dims")  # native path engaged
