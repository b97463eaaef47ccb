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


def test_scanned_trainer_on_device_stack(tmp_path):
    """lax.scan-chunked denoise trainer over a device-resident stack
    (naf_tpu/train/denoise.py train_denoiser device_stack path)."""
    import jax
    import jax.numpy as jnp

    from naf_tpu.data import device_cached_stack
    from naf_tpu.models.restorers import IRCNN
    from naf_tpu.train.denoise import DenoiseConfig, train_denoiser

    ds = _FakeDataset(6, hw=16)
    stack = device_cached_stack(ds)
    assert stack.shape == (6, 16, 16, 3) and stack.dtype == jnp.float32

    cfg = DenoiseConfig(
        train_steps=5, img_size=16, use_bf16=False, log_every=2,
        log_dir=str(tmp_path), noise_params={"std": 0.3},
    )
    params = train_denoiser(
        IRCNN(nc=8), None, cfg, device_stack=stack, batch_size=2)
    leaves = jax.tree.leaves(params)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)
    logged = open(tmp_path / "metrics.jsonl").read().strip().splitlines()
    # 5 steps at log_every=2 -> chunks of 2, 2, 1
    assert len(logged) == 3
