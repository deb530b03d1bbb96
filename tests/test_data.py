"""Data pipeline tests: grammar, sharding, permutation, crop/augment, loader."""

import numpy as np
import pytest

from fbanet_tpu.data.loader import BurstLoader
from fbanet_tpu.data.realbsr import RealBSRDataset, dihedral_transform
from fbanet_tpu.data.synthetic import (
    synthetic_batch,
    synthetic_burst,
    write_synthetic_realbsr,
)


@pytest.fixture(scope="module")
def aligned_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("realbsr_aligned")
    write_synthetic_realbsr(root, num_bursts=6, num_frames=4, lr_size=32,
                            layout="aligned")
    return root


@pytest.fixture(scope="module")
def warp_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("realbsr_warp")
    write_synthetic_realbsr(root, num_bursts=3, num_frames=4, lr_size=32,
                            layout="warp")
    return root


def test_synthetic_burst_shapes():
    rng = np.random.default_rng(0)
    lr, hr, shifts = synthetic_burst(rng, num_frames=5, lr_size=32, scale=4)
    assert lr.shape == (5, 32, 32, 3)
    assert hr.shape == (128, 128, 3)
    assert shifts.shape == (5, 2)
    assert np.all(shifts[0] == 0)


def test_synthetic_batch_dict():
    b = synthetic_batch(0, batch=2, num_frames=3, lr_size=16)
    assert b["LR"].shape == (2, 3, 16, 16, 3)
    assert b["HR"].shape == (2, 64, 64, 3)
    assert 0.0 <= b["LR"].min() and b["LR"].max() <= 1.0


def test_aligned_layout_scan(aligned_root):
    ds = RealBSRDataset(aligned_root, split="train", burst_size=4, crop_size=0)
    assert len(ds) == 6
    sample = ds.load(0)
    assert sample["LR"].shape == (4, 32, 32, 3)
    assert sample["HR"].shape == (128, 128, 3)
    assert sample["LR"].dtype == np.float32


def test_warp_layout_scan(warp_root):
    ds = RealBSRDataset(warp_root, layout="warp", burst_size=4, crop_size=0,
                        split="train")
    assert len(ds) == 3
    s = ds.load(0)
    assert s["LR"].shape == (4, 32, 32, 3)
    assert s["HR"].shape == (128, 128, 3)


def test_val_split_reads_test_dir(aligned_root):
    ds = RealBSRDataset(aligned_root, split="val", burst_size=4, crop_size=0)
    assert len(ds) == 6  # synthetic writer mirrors train into test


def test_coupled_crop(aligned_root):
    ds = RealBSRDataset(aligned_root, split="train", burst_size=4, crop_size=16)
    s = ds.load(1, np.random.default_rng(0))
    assert s["LR"].shape == (4, 16, 16, 3)
    assert s["HR"].shape == (64, 64, 3)  # 4x the LR crop


def test_epoch_permutation_deterministic_and_different(aligned_root):
    ds = RealBSRDataset(aligned_root, split="train", burst_size=4, seed=7)
    e0a, e0b = ds.epoch_indices(0), ds.epoch_indices(0)
    np.testing.assert_array_equal(e0a, e0b)
    assert any(not np.array_equal(ds.epoch_indices(e), e0a) for e in (1, 2, 3))


def test_sharding_partitions_disjoint(aligned_root):
    shards = [
        RealBSRDataset(aligned_root, split="train", burst_size=4,
                       shard_id=i, num_shards=2).epoch_indices(0)
        for i in range(2)
    ]
    assert len(shards[0]) == len(shards[1]) == 3
    assert set(shards[0].tolist()).isdisjoint(shards[1].tolist())


def test_dihedral_transforms_are_bijective():
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(2, 8, 8, 3)).astype(np.float32)
    outs = [dihedral_transform(img, i) for i in range(8)]
    assert outs[0] is not None and np.array_equal(outs[0], img)
    # all 8 are distinct and preserve the multiset of values
    for i in range(8):
        assert outs[i].shape == img.shape
        np.testing.assert_allclose(np.sort(outs[i], axis=None),
                                   np.sort(img, axis=None))
    keys = {outs[i].tobytes() for i in range(8)}
    assert len(keys) == 8


def test_burst_consistent_augmentation(aligned_root):
    """All frames + HR must receive the same dihedral transform."""
    ds = RealBSRDataset(aligned_root, split="train", burst_size=4, crop_size=0,
                        augment=True)
    rng_state = np.random.default_rng(3)
    s = ds.load(0, rng_state)
    plain = RealBSRDataset(aligned_root, split="train", burst_size=4,
                           crop_size=0, augment=False).load(0)
    # find which transform was applied to HR; LR frames must match it
    t_found = [t for t in range(8)
               if np.array_equal(s["HR"], dihedral_transform(plain["HR"], t))]
    assert len(t_found) == 1
    np.testing.assert_array_equal(
        s["LR"], dihedral_transform(plain["LR"], t_found[0]))


def test_loader_batches_and_prefetch(aligned_root):
    ds = RealBSRDataset(aligned_root, split="train", burst_size=4, crop_size=16)
    loader = BurstLoader(ds, batch_size=2, num_workers=4, prefetch_depth=2)
    assert len(loader) == 3
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    for b in batches:
        assert b["LR"].shape == (2, 4, 16, 16, 3)
        assert b["HR"].shape == (2, 64, 64, 3)
        assert len(b["burst_name"]) == 2


def test_loader_drop_last(aligned_root):
    ds = RealBSRDataset(aligned_root, split="val", burst_size=4, crop_size=16)
    loader = BurstLoader(ds, batch_size=4, num_workers=2, drop_last=False)
    batches = list(loader.epoch(0))
    assert sum(b["LR"].shape[0] for b in batches) == 6  # keeps the remainder

    train_ds = RealBSRDataset(aligned_root, split="train", burst_size=4,
                              crop_size=16)
    tl = BurstLoader(train_ds, batch_size=4, num_workers=2)
    assert sum(b["LR"].shape[0] for b in tl.epoch(0)) == 4  # drops remainder


def test_loader_deterministic_given_seed(aligned_root):
    ds = RealBSRDataset(aligned_root, split="train", burst_size=4, crop_size=16)
    l1 = list(BurstLoader(ds, batch_size=2, num_workers=4, seed=5).epoch(2))
    l2 = list(BurstLoader(ds, batch_size=2, num_workers=4, seed=5).epoch(2))
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(a["LR"], b["LR"])
        np.testing.assert_array_equal(a["HR"], b["HR"])


@pytest.fixture(scope="module")
def gtfree_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("realbsr_gtfree")
    write_synthetic_realbsr(root, num_bursts=3, num_frames=4, lr_size=32,
                            layout="aligned", splits=("test",), write_hr=False)
    return root


def test_gtfree_test_split(gtfree_root):
    """GT-free trees load as {'LR', 'burst_name'} under split='test' —
    the reference's ManualDatasets_test contract
    (fba_net/ManualDataset.py.bak:295-408)."""
    ds = RealBSRDataset(gtfree_root, split="test", burst_size=4, crop_size=0,
                        augment=False)
    assert len(ds) == 3
    s = ds.load(0)
    assert s["LR"].shape == (4, 32, 32, 3)
    assert "HR" not in s
    # crop still works on LR alone
    ds2 = RealBSRDataset(gtfree_root, split="test", burst_size=4, crop_size=16,
                         augment=False)
    assert ds2.load(0)["LR"].shape == (4, 16, 16, 3)


def test_gtfree_rejected_for_val_split(gtfree_root):
    with pytest.raises(FileNotFoundError, match="GT-free"):
        RealBSRDataset(gtfree_root, split="val", burst_size=4, crop_size=0)


def test_gtfree_loader_batches(gtfree_root):
    ds = RealBSRDataset(gtfree_root, split="test", burst_size=4, crop_size=0,
                        augment=False)
    loader = BurstLoader(ds, batch_size=2, num_workers=2, drop_last=False)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    assert batches[0]["LR"].shape == (2, 4, 32, 32, 3)
    assert "HR" not in batches[0]


# ------------------------------------------------------ decoded-frame cache --


def _sample_pairs(root, *, channels=3, crop=24, split="train"):
    """Load the same (index, rng) samples through the cached and uncached
    paths; they must match exactly (identical rng draw order is part of the
    contract — mid-epoch resume depends on it)."""
    kw = dict(split=split, burst_size=3, crop_size=crop, channels=channels)
    ds_plain = RealBSRDataset(root, cache_decoded=False, **kw)
    ds_cache = RealBSRDataset(root, cache_decoded=True, **kw)
    for index in range(min(3, len(ds_plain))):
        for seed in (0, 1):
            a = ds_plain.load(index, np.random.default_rng((seed, index)))
            b = ds_cache.load(index, np.random.default_rng((seed, index)))
            # twice through the cache: second hit must also match
            b2 = ds_cache.load(index, np.random.default_rng((seed, index)))
            yield a, b, b2


def test_cache_matches_uncached_rgb(aligned_root):
    n = 0
    for a, b, b2 in _sample_pairs(aligned_root, crop=24):
        np.testing.assert_allclose(a["LR"], b["LR"], atol=1e-7)
        np.testing.assert_allclose(a["HR"], b["HR"], atol=1e-7)
        np.testing.assert_array_equal(b["LR"], b2["LR"])
        n += 1
    assert n == 6


def test_cache_matches_uncached_no_crop(aligned_root):
    """Full-frame (no crop) path: augmentation still applies; native
    passthrough window covers the whole square frame."""
    for a, b, _ in _sample_pairs(aligned_root, crop=0):
        np.testing.assert_allclose(a["LR"], b["LR"], atol=1e-7)
        np.testing.assert_allclose(a["HR"], b["HR"], atol=1e-7)


def test_cache_matches_uncached_val(aligned_root):
    for a, b, _ in _sample_pairs(aligned_root, crop=24, split="val"):
        np.testing.assert_allclose(a["LR"], b["LR"], atol=1e-7)


def test_warm_cache_prefills_and_matches(aligned_root):
    """warm_cache() decodes every record up front (--warm_start); samples
    loaded afterwards are identical to the lazily-cached path, and a
    cache_decoded=False dataset reports 0 warmed."""
    kw = dict(split="train", burst_size=3, crop_size=24)
    ds = RealBSRDataset(aligned_root, cache_decoded=True, **kw)
    n = ds.warm_cache()
    assert n == len(ds.records) and len(ds._cache) == n
    lazy = RealBSRDataset(aligned_root, cache_decoded=True, **kw)
    for index in range(min(3, len(ds))):
        a = ds.load(index, np.random.default_rng((7, index)))
        b = lazy.load(index, np.random.default_rng((7, index)))
        np.testing.assert_array_equal(a["LR"], b["LR"])
        np.testing.assert_array_equal(a["HR"], b["HR"])
    assert RealBSRDataset(aligned_root, cache_decoded=False,
                          **kw).warm_cache() == 0


def test_wire_storage_matches_f32(aligned_root):
    """wire_dtype='storage' ships the PNG integers; after the device-side
    normalize (train.to_unit_f32's exact multiply) the values are BIT-
    identical to the f32 wire, on both the cached and uncached paths."""
    import jax.numpy as jnp

    from fbanet_tpu.train import to_unit_f32

    for cached in (True, False):
        kw = dict(split="train", burst_size=3, crop_size=24,
                  cache_decoded=cached)
        a = RealBSRDataset(aligned_root, wire_dtype="float32", **kw)
        b = RealBSRDataset(aligned_root, wire_dtype="storage", **kw)
        for i in range(min(2, len(a))):
            sa = a.load(i, np.random.default_rng((3, i)))
            sb = b.load(i, np.random.default_rng((3, i)))
            assert sb["LR"].dtype == np.uint8
            for k in ("LR", "HR"):
                np.testing.assert_array_equal(
                    sa[k], np.asarray(to_unit_f32(jnp.asarray(sb[k]))))


def test_wire_storage_raw_u16(tmp_path):
    root = tmp_path / "rawwire"
    write_synthetic_realbsr(root, num_bursts=1, num_frames=3, lr_size=16,
                            channels=4)
    import jax.numpy as jnp

    from fbanet_tpu.train import to_unit_f32

    kw = dict(split="train", burst_size=3, crop_size=8, channels=4,
              cache_decoded=True)
    a = RealBSRDataset(root, wire_dtype="float32", **kw)
    b = RealBSRDataset(root, wire_dtype="storage", **kw)
    sa = a.load(0, np.random.default_rng(1))
    sb = b.load(0, np.random.default_rng(1))
    assert sb["LR"].dtype == np.uint16
    np.testing.assert_array_equal(
        sa["LR"], np.asarray(to_unit_f32(jnp.asarray(sb["LR"]))))


def test_cache_limit_zero_disables_storage(aligned_root):
    ds = RealBSRDataset(aligned_root, split="train", burst_size=3,
                        crop_size=24, cache_decoded=True,
                        cache_limit_bytes=0)
    s = ds.load(0, np.random.default_rng(0))
    assert s["LR"].shape == (3, 24, 24, 3)
    assert ds._cache_bytes == 0 and not ds._cache


def test_cache_raw_16bit(tmp_path):
    root = tmp_path / "rawcache"
    write_synthetic_realbsr(root, num_bursts=2, num_frames=3, lr_size=16,
                            layout="aligned", channels=4)
    for a, b, _ in _sample_pairs(root, channels=4, crop=0):
        np.testing.assert_allclose(a["LR"], b["LR"], atol=1e-4)
        np.testing.assert_allclose(a["HR"], b["HR"], atol=1e-4)


def test_loader_with_cache_deterministic(aligned_root):
    ds = RealBSRDataset(aligned_root, split="train", burst_size=3,
                        crop_size=24, cache_decoded=True)
    loader = BurstLoader(ds, batch_size=2, num_workers=4, seed=7)
    a = [b["LR"].copy() for b in loader.epoch(3)]
    b = [b["LR"].copy() for b in loader.epoch(3)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
