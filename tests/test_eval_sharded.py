"""Data-parallel evaluation tests (VERDICT r4 next #4).

The reference even ran *eval* under DataParallel (fba_net/test.py:55); here
per-epoch eval and standalone evaluate.py shard val batches over the mesh,
with the final partial batch padded to the full batch size (BurstLoader
pad_last) so the jitted shape stays constant and the batch axis always
divides the device count. These tests pin: sharded eval PSNR == single-device
eval PSNR, including through a padded final batch.
"""

import jax
import numpy as np
import pytest

from fbanet_tpu.config import ModelConfig
from fbanet_tpu.data.loader import BurstLoader
from fbanet_tpu.data.realbsr import RealBSRDataset
from fbanet_tpu.data.synthetic import write_synthetic_realbsr
from fbanet_tpu.models import init_model
from fbanet_tpu.parallel.mesh import batch_sharding, make_mesh
from fbanet_tpu.train import evaluate_psnr, make_eval_step

TINY = ModelConfig(num_frames=3, img_size=16, embed_dim=8, window_size=4,
                   heads=(1, 2, 4, 8, 4, 4, 2, 2, 2), dtype="float32",
                   drop_path_rate=0.0)


@pytest.fixture(scope="module")
def val_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("eval_ds")
    # 5 bursts with batch_size 4 -> batches of [4, 1]: the final batch
    # exercises the pad_last path (padded 1 -> 4, valid=1)
    write_synthetic_realbsr(root, num_bursts=5, num_frames=3, lr_size=16,
                            layout="aligned", splits=("test",))
    return root


def _loader(root, *, sharding=None, pad_last=False):
    ds = RealBSRDataset(root, split="val", burst_size=3, crop_size=16,
                        cache_decoded=True)
    return BurstLoader(ds, batch_size=4, num_workers=2, drop_last=False,
                       sharding=sharding, pad_last=pad_last)


def test_pad_last_batch_shapes_and_valid(val_tree):
    """pad_last pads the trailing partial batch to the full batch size by
    repeating the last sample, reports the real count as batch['valid'],
    and keeps burst_name unpadded."""
    batches = list(_loader(val_tree, pad_last=True).epoch(0))
    assert [b["LR"].shape[0] for b in batches] == [4, 4]
    assert [b["valid"] for b in batches] == [4, 1]
    last = batches[1]
    assert len(last["burst_name"]) == 1
    np.testing.assert_array_equal(last["LR"][0], last["LR"][1])
    np.testing.assert_array_equal(last["HR"][0], last["HR"][3])


def test_sharded_eval_psnr_matches_single_device(val_tree):
    """evaluate_psnr over a mesh-sharded pad_last loader == the same eval on
    one device with unpadded batches — including the padded final batch."""
    model, params = init_model(TINY, jax.random.key(0))
    eval_step = make_eval_step(model, boundary_ignore=0)

    single = evaluate_psnr(eval_step, params, _loader(val_tree), epoch=0)

    mesh = make_mesh(jax.devices()[:4])  # 4 devices divide batch_size 4
    sharded_loader = _loader(val_tree, sharding=batch_sharding(mesh),
                             pad_last=True)
    sharded = evaluate_psnr(eval_step, params, sharded_loader, epoch=0)

    assert sharded == pytest.approx(single, abs=1e-4)
    assert np.isfinite(sharded)


def test_sharded_eval_with_online_align_matches(val_tree):
    """The sharded eval path composes with in-step ECC registration."""
    model, params = init_model(TINY, jax.random.key(0))
    eval_step = make_eval_step(model, boundary_ignore=0, online_align="ecc")

    single = evaluate_psnr(eval_step, params, _loader(val_tree), epoch=0)
    mesh = make_mesh(jax.devices()[:4])
    sharded = evaluate_psnr(
        eval_step, params,
        _loader(val_tree, sharding=batch_sharding(mesh), pad_last=True),
        epoch=0)
    assert sharded == pytest.approx(single, abs=1e-4)
