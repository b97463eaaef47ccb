"""Device-cached batch iterator (naf_tpu/data/device_cache.py)."""

import numpy as np

from naf_tpu.data import device_cached_batches


class _FakeDataset:
    def __init__(self, n, hw=8):
        rng = np.random.RandomState(0)
        self.imgs = rng.rand(n, hw, hw, 3).astype(np.float32)

    def __len__(self):
        return len(self.imgs)

    def __getitem__(self, i):
        return {"image": self.imgs[i]}


def test_epoch_permutation_covers_dataset():
    ds = _FakeDataset(10)
    it = device_cached_batches(ds, batch_size=5, shuffle=True, seed=1)
    seen = np.concatenate([np.asarray(next(it)), np.asarray(next(it))])
    # one epoch = whole dataset, each image exactly once
    key = lambda a: tuple(np.round(a.ravel()[:4], 6))
    assert {key(x) for x in seen} == {key(x) for x in ds.imgs}


def test_batches_match_source_pixels_and_dtype():
    ds = _FakeDataset(6)
    it = device_cached_batches(ds, batch_size=3, shuffle=False)
    b = np.asarray(next(it))
    assert b.shape == (3, 8, 8, 3) and b.dtype == np.float32
    np.testing.assert_allclose(b, ds.imgs[:3], rtol=1e-6)


def test_oversized_batch_samples_with_replacement():
    ds = _FakeDataset(4)
    it = device_cached_batches(ds, batch_size=9)
    assert np.asarray(next(it)).shape == (9, 8, 8, 3)
