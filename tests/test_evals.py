"""Eval harness tests: metric parity vs torch transcriptions of the
reference formulas, propagation parity, probe training smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from naf_tpu.evals import (
    DenoisingLoss,
    NoiseGenerator,
    SegMetrics,
    davis_eval_boundary,
    davis_eval_iou,
    davis_statistics,
    label_propagation,
    psnr,
    ssim,
)


def _nhwc(x):
    return np.ascontiguousarray(x.transpose(0, 2, 3, 1))


def _torch_ssim(pred, target, window_size=11):
    """Reference SSIM (denoising.py:74-106) transcribed."""
    g = torch.exp(
        -torch.arange(window_size, dtype=torch.float32).sub(window_size // 2).pow(2)
        / (2 * (window_size / 6) ** 2)
    )
    g = g / g.sum()
    w2 = (g.unsqueeze(1) @ g.unsqueeze(0)).unsqueeze(0).unsqueeze(0)
    c = pred.size(1)
    w = w2.expand(c, 1, window_size, window_size).contiguous()
    mu1 = F.conv2d(pred, w, padding=window_size // 2, groups=c)
    mu2 = F.conv2d(target, w, padding=window_size // 2, groups=c)
    s1 = F.conv2d(pred * pred, w, padding=window_size // 2, groups=c) - mu1 ** 2
    s2 = F.conv2d(target * target, w, padding=window_size // 2, groups=c) - mu2 ** 2
    s12 = F.conv2d(pred * target, w, padding=window_size // 2, groups=c) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2)
    )
    return m.mean().item()


def test_psnr_ssim_match_reference():
    rng = np.random.RandomState(0)
    target = rng.rand(2, 3, 32, 32).astype(np.float32)
    pred = np.clip(target + rng.randn(2, 3, 32, 32).astype(np.float32) * 0.1, 0, 1)
    tp, tt = torch.from_numpy(pred), torch.from_numpy(target)

    want_psnr = (20 * torch.log10(1.0 / torch.sqrt(F.mse_loss(tp, tt)))).item()
    got_psnr = float(psnr(jnp.asarray(_nhwc(pred)), jnp.asarray(_nhwc(target))))
    assert abs(want_psnr - got_psnr) < 1e-3

    want_ssim = _torch_ssim(tp, tt)
    got_ssim = float(ssim(jnp.asarray(_nhwc(pred)), jnp.asarray(_nhwc(target))))
    assert abs(want_ssim - got_ssim) < 1e-4


def test_denoising_loss_components():
    rng = np.random.RandomState(1)
    t = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    p = t + 0.1
    losses = DenoisingLoss(1.0, 5.0, 0.2)(p, t)
    assert set(losses) == {"l1", "l2", "ssim", "total"}
    np.testing.assert_allclose(float(losses["l1"]), 0.1, atol=1e-5)
    np.testing.assert_allclose(float(losses["l2"]), 5 * 0.01, atol=1e-5)
    # identical images: zero loss
    z = DenoisingLoss(1.0, 5.0, 0.2)(t, t)
    assert float(z["total"]) < 1e-6


def test_noise_generator():
    rng = jax.random.PRNGKey(0)
    img = jnp.full((1, 8, 8, 3), 0.5, jnp.float32)
    noisy = NoiseGenerator("gaussian")(rng, img, {"std": 0.2})
    assert 0.1 < float(jnp.std(noisy - img)) < 0.3
    sp = NoiseGenerator("salt_pepper")(rng, img, {"prob": 0.5})
    vals = np.unique(np.asarray(sp))
    assert set(np.round(vals, 2)).issubset({0.0, 0.5, 1.0})
    with pytest.raises(ValueError):
        NoiseGenerator("poisson")


def test_seg_metrics_confusion():
    m = SegMetrics(3)
    pred = np.array([0, 1, 2, 2, 1, 0])
    target = np.array([0, 1, 2, 1, 1, 2])
    m.update(pred, target)
    out = m.compute()
    assert abs(out["accuracy"] - 4 / 6) < 1e-9
    # per-class IoU: c0: i1/u2, c1: i2/u3, c2: i1/u3
    expect = np.mean([1 / 2, 2 / 3, 1 / 3])
    assert abs(out["iou"] - expect) < 1e-9


def test_label_propagation_matches_torch_reference():
    """Propagation math vs a transcription of eval_video_seg.py:498-560."""
    rng = np.random.RandomState(2)
    h = w = 6
    n_ctx, c, k = 3, 8, 4
    feat_tar = rng.randn(h * w, c).astype(np.float32)
    feat_sources = rng.randn(n_ctx, c, h * w).astype(np.float32)
    segs = rng.rand(n_ctx, k, h * w).astype(np.float32)
    size_mask, topk = 2, 5

    # torch reference
    ft = F.normalize(torch.from_numpy(feat_tar), dim=1, p=2)
    fs = F.normalize(torch.from_numpy(feat_sources), dim=1, p=2)
    ftr = ft.unsqueeze(0).repeat(n_ctx, 1, 1)
    aff = torch.exp(torch.bmm(ftr, fs) / 0.1)
    qi, qj = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    qi, qj = qi.flatten().unsqueeze(1), qj.flatten().unsqueeze(1)
    mask = ((qi - qi.T).abs() <= size_mask) & ((qj - qj.T).abs() <= size_mask)
    aff = aff * mask.float().unsqueeze(0)
    aff = aff.transpose(2, 1).reshape(-1, h * w)
    tk_val, _ = torch.topk(aff, dim=0, k=topk)
    tk_min, _ = torch.min(tk_val, dim=0)
    aff[aff < tk_min] = 0
    aff = aff / aff.sum(0, keepdim=True)
    segs_t = torch.from_numpy(segs).reshape(n_ctx, k, -1).transpose(2, 1).reshape(-1, k).T
    want = (segs_t @ aff).reshape(k, h, w).numpy()

    got = label_propagation(
        jnp.asarray(feat_tar), jnp.asarray(feat_sources), jnp.asarray(segs),
        h, w, size_mask=size_mask, topk=topk,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_davis_jf_metrics():
    gt = np.zeros((4, 20, 20), bool)
    gt[:, 5:15, 5:15] = True
    # perfect prediction
    j = davis_eval_iou(gt, gt)
    f = davis_eval_boundary(gt, gt)
    np.testing.assert_allclose(j, 1.0)
    np.testing.assert_allclose(f, 1.0)
    # shifted prediction: worse but positive
    pred = np.roll(gt, 2, axis=-1)
    j2 = davis_eval_iou(gt, pred)
    assert np.all(j2 < 1) and np.all(j2 > 0.3)
    m, o, d = davis_statistics(j2)
    assert 0 < m < 1 and o in (0.0, 1.0)


def test_linear_probe_learns_toy_segmentation():
    from naf_tpu.evals.seg_probing import LinearProbe, ProbeConfig

    rng = np.random.RandomState(3)
    n_cls, dim = 4, 16
    protos = rng.randn(n_cls, dim).astype(np.float32) * 3

    def feature_fn(image, target_hw):
        # image here carries the label map in channel 0 (toy)
        labels = np.asarray(image[..., 0]).astype(int)
        feats = protos[labels] + rng.randn(*labels.shape, dim) * 0.1
        return jnp.asarray(feats.astype(np.float32))

    def loader(n):
        for _ in range(n):
            labels = rng.randint(0, n_cls, (1, 8, 8)).astype(np.float32)
            yield labels[..., None], labels[0:1].astype(np.int32)

    probe = LinearProbe(feature_fn, dim, ProbeConfig(num_classes=n_cls, lr=5e-2,
                                                     steps_per_epoch=30))
    host_rng = np.random.RandomState(0)
    for _ in range(3):
        probe.train_epoch(loader(30), host_rng)
    metrics = probe.evaluate(loader(10))
    assert metrics["accuracy"] > 0.9, metrics
    assert metrics["iou"] > 0.8, metrics
