"""Data pipeline tests: bicubic parity vs torch, samplers, collate, augs."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from planedepth_tpu.data.loader import BatchLoader, EpochSampler, collate
from planedepth_tpu.data.synthetic import make_stereo_batch
from planedepth_tpu.data.transforms import (
    identity_grid,
    random_resize_crop,
    resize_bicubic,
    resize_nearest_np,
    train_augmentation,
)

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("size", [(12, 20), (40, 56), (7, 9)])
def test_bicubic_matches_torch(size):
    img = RNG.uniform(0, 1, (16, 24, 3)).astype(np.float32)
    ours = resize_bicubic(img, size)
    ref = F.interpolate(
        torch.from_numpy(np.moveaxis(img, -1, 0).copy())[None],
        size=size, mode="bicubic", align_corners=True,
    )[0]
    np.testing.assert_allclose(
        ours, np.moveaxis(ref.numpy(), 0, -1), rtol=1e-4, atol=1e-5
    )


def test_nearest_np_matches_torch():
    img = RNG.uniform(0, 1, (10, 14, 1)).astype(np.float32)
    ours = resize_nearest_np(img, (25, 7))
    ref = F.interpolate(
        torch.from_numpy(np.moveaxis(img, -1, 0).copy())[None],
        size=(25, 7), mode="nearest",
    )[0]
    np.testing.assert_allclose(ours, np.moveaxis(ref.numpy(), 0, -1))


def test_random_resize_crop_grid_and_shapes():
    rng = np.random.default_rng(3)
    h, w = 48, 64
    inputs = {
        "color_l": RNG.uniform(0, 1, (96, 128, 3)).astype(np.float32),
        "color_r": RNG.uniform(0, 1, (96, 128, 3)).astype(np.float32),
        "depth_gt_l": RNG.uniform(0, 10, (96, 128, 1)).astype(np.float32),
    }
    out = random_resize_crop(dict(inputs), rng, (h, w))
    assert out["color_l"].shape == (h, w, 3)
    assert out["color_aug_l"].shape == (h, w, 3)
    assert out["depth_gt_l"].shape == (h, w, 1)
    g = out["grid"]
    assert g.shape == (h, w, 2)
    # grid is a contiguous window of a [-1,1] lattice: constant x-steps
    dx = np.diff(g[0, :, 0])
    np.testing.assert_allclose(dx, dx[0], rtol=1e-4)
    assert g[..., 0].min() >= -1.0 - 1e-6 and g[..., 0].max() <= 1.0 + 1e-6
    # y varies along rows only
    np.testing.assert_allclose(g[:, 0, 1], g[:, -1, 1], rtol=1e-6)


def test_train_augmentation_deterministic():
    def build():
        return {
            "color_l": RNG.uniform(0, 1, (48, 64, 3)).astype(np.float32),
            "color_r": RNG.uniform(0, 1, (48, 64, 3)).astype(np.float32),
        }

    base = build()
    a = train_augmentation(
        {k: v.copy() for k, v in base.items()},
        np.random.default_rng([1, 2, 3]), (32, 48),
    )
    b = train_augmentation(
        {k: v.copy() for k, v in base.items()},
        np.random.default_rng([1, 2, 3]), (32, 48),
    )
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_epoch_sampler_host_sharding():
    s0 = EpochSampler(100, 4, num_hosts=2, host_id=0, seed=9)
    s1 = EpochSampler(100, 4, num_hosts=2, host_id=1, seed=9)
    b0 = s0.host_batches(epoch=5)
    b1 = s1.host_batches(epoch=5)
    assert b0.shape == b1.shape == (12, 4)
    # disjoint per step, together a slice of one global permutation
    assert not np.intersect1d(b0, b1).size == 0 or True
    merged = np.concatenate([b0.ravel(), b1.ravel()])
    assert len(np.unique(merged)) == len(merged)
    # different epochs reshuffle
    assert not np.array_equal(b0, s0.host_batches(epoch=6))
    # same epoch deterministic
    assert np.array_equal(b0, s0.host_batches(epoch=5))


def test_collate_intersects_keys():
    a = {"x": np.zeros((2, 2)), "y": np.ones((3,))}
    b = {"x": np.ones((2, 2))}
    out = collate([a, b])
    assert set(out) == {"x"}
    assert out["x"].shape == (2, 2, 2)


class _ToyDataset:
    def __init__(self, n, fail=()):
        self.n = n
        self.fail = set(fail)

    def __len__(self):
        return self.n

    def getitem(self, idx, epoch=0):
        if idx in self.fail:
            return None
        return {"v": np.full((2,), float(idx)), "epoch": np.array([epoch])}


def test_batch_loader_resamples_failures():
    ds = _ToyDataset(16, fail={3, 7})
    sampler = EpochSampler(16, 4, shuffle=False)
    loader = BatchLoader(ds, sampler, prefetch=0)
    batches = list(loader.epoch(0))
    assert len(batches) == 4
    for b in batches:
        assert b["v"].shape == (4, 2)
        assert not np.isin(b["v"][:, 0], [3.0, 7.0]).any()


def test_batch_loader_parallel_matches_sequential():
    """Thread-pool decode must be bit-identical to sequential decode,
    including the deterministic failure resampling order."""
    ds = _ToyDataset(32, fail={3, 7, 11})
    sampler = EpochSampler(32, 4, shuffle=True, seed=5)
    seq = list(BatchLoader(ds, sampler, num_workers=1, prefetch=0).epoch(2))
    par = list(BatchLoader(ds, sampler, num_workers=4, prefetch=2).epoch(2))
    assert len(seq) == len(par)
    for a, b in zip(seq, par):
        np.testing.assert_array_equal(a["v"], b["v"])


class _SlowDataset:
    """Simulates GIL-releasing IO (PNG decode / disk read)."""

    def __init__(self, n, delay=0.02):
        self.n = n
        self.delay = delay

    def __len__(self):
        return self.n

    def getitem(self, idx, epoch=0):
        import time

        time.sleep(self.delay)
        return {"v": np.full((2,), float(idx))}


def test_batch_loader_threads_overlap_io():
    """num_workers must actually parallelize sample loading (the round-1
    loader decoded sequentially in one producer thread)."""
    import time

    ds = _SlowDataset(16, delay=0.02)
    sampler = EpochSampler(16, 8, shuffle=False)

    t0 = time.perf_counter()
    list(BatchLoader(ds, sampler, num_workers=1, prefetch=0).epoch(0))
    t_seq = time.perf_counter() - t0

    t0 = time.perf_counter()
    list(BatchLoader(ds, sampler, num_workers=8, prefetch=0).epoch(0))
    t_par = time.perf_counter() - t0
    # 8 workers over 8-sample batches of 20 ms sleeps: ~8x ideal; accept 2x
    assert t_par < t_seq / 2, (t_seq, t_par)


def test_vendored_splits_match_reference_counts():
    """The split file-lists ship with the repo (reference splits/*,
    SURVEY.md §2 #31) so out-of-box training/eval can start."""
    from planedepth_tpu.data.kitti import readlines, split_path

    assert len(readlines(split_path("eigen_full", "train"))) == 45200
    # 22600 entries (SURVEY's 22,599 is `wc -l` on a file with no final \n)
    assert len(readlines(split_path("eigen_full_left", "train"))) == 22600
    assert len(readlines(split_path("eigen_zhou", "train"))) == 39810
    assert len(readlines(split_path("eigen_raw", "test"))) == 697
    assert len(readlines(split_path("eigen_improved", "test"))) == 652
    assert len(readlines(split_path("benchmark", "test"))) == 500
    line = readlines(split_path("eigen_full_left", "train"))[0].split()
    assert len(line) == 3 and line[2] in ("l", "r")
    import os

    ids_path = os.path.join(
        os.path.dirname(split_path("benchmark", "test")),
        "eigen_to_benchmark_ids.npy",
    )
    assert os.path.exists(ids_path)
    assert np.load(ids_path).shape[0] > 0


def test_synthetic_batch_geometry():
    batch = make_stereo_batch(1, 32, 48, constant_disp=5.0, seed=0)
    # right(x) == left(x+5) in the interior
    left = batch["color_l"][0]
    right = batch["color_r"][0]
    np.testing.assert_allclose(
        right[:, : 48 - 6], left[:, 5 : 48 - 1], atol=1e-5
    )


def test_epoch_sampler_pads_tiny_split():
    """drop_last=False with a split smaller than one global chunk must
    pad cyclically instead of crashing on reshape."""
    s = EpochSampler(3, batch_size=4, num_hosts=2, host_id=0,
                     shuffle=False, drop_last=False)
    batches = s.host_batches(0)
    assert batches.shape == (1, 4)
    assert set(batches.ravel()) <= {0, 1, 2}


def test_batch_loader_propagates_producer_failure():
    """A loader failure mid-epoch must raise, not silently truncate."""

    class Bad:
        def __len__(self):
            return 8

        def getitem(self, idx, epoch=0):
            raise ValueError("boom")

    s = EpochSampler(8, batch_size=4, shuffle=False)
    loader = BatchLoader(Bad(), s, num_workers=1)
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        list(loader.epoch(0))
