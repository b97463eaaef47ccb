"""Denoising / restoration pipeline (reference denoising.py).

NoiseGenerator (gaussian / salt-pepper, optional random strength,
denoising.py:25-58), combined L1+L2+SSIM loss (denoising.py:129-177), and
PSNR / gaussian-window SSIM metrics (denoising.py:61-126) — all pure JAX,
NHWC. The training/validation drivers live in naf_tpu.train/naf_tpu.cli.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["NoiseGenerator", "DenoisingLoss", "psnr", "ssim", "ssim_loss"]


class NoiseGenerator:
    """Noise injection; strength may be "range" for per-call U(0.1, 0.5)."""

    def __init__(self, noise_type: str = "gaussian"):
        if noise_type not in ("gaussian", "salt_pepper"):
            raise ValueError(f"Unknown noise type: {noise_type}")
        self.noise_type = noise_type

    def __call__(self, rng: jax.Array, image: jnp.ndarray, noise_params=None):
        params = noise_params or {}
        r_val, r_noise = jax.random.split(rng)
        if self.noise_type == "gaussian":
            std = params.get("std", 0.1)
            if std == "range":
                std = jax.random.uniform(r_val, (), minval=0.1, maxval=0.5)
            return image + jax.random.normal(r_noise, image.shape, image.dtype) * std
        prob = params.get("prob", 0.1)
        if prob == "range":
            prob = jax.random.uniform(r_val, (), minval=0.1, maxval=0.5)
        k_mask, k_sp = jax.random.split(r_noise)
        mask = jax.random.uniform(k_mask, image.shape) < prob
        salt = jax.random.uniform(k_sp, image.shape) > 0.5
        return jnp.where(mask, salt.astype(image.dtype), image)


def psnr(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0):
    mse = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    return 20.0 * jnp.log10(max_val / jnp.sqrt(mse))


def _gaussian_window(window_size: int) -> np.ndarray:
    x = np.arange(window_size, dtype=np.float32) - window_size // 2
    g = np.exp(-(x ** 2) / (2 * (window_size / 6.0) ** 2))
    g /= g.sum()
    return g[:, None] * g[None, :]


def _depthwise_filter(x: jnp.ndarray, window: np.ndarray) -> jnp.ndarray:
    """Per-channel 2-D filter with zero padding (torch conv2d padding=k//2)."""
    k = window.shape[0]
    c = x.shape[-1]
    w = jnp.asarray(window, x.dtype)[:, :, None, None]
    w = jnp.tile(w, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def ssim(pred, target, window_size: int = 11, c1: float = 0.01 ** 2, c2: float = 0.03 ** 2):
    """Gaussian-window SSIM (denoising.py:74-106), NHWC."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    win = _gaussian_window(window_size)
    mu1 = _depthwise_filter(pred, win)
    mu2 = _depthwise_filter(target, win)
    mu1_sq, mu2_sq, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = _depthwise_filter(pred * pred, win) - mu1_sq
    s2 = _depthwise_filter(target * target, win) - mu2_sq
    s12 = _depthwise_filter(pred * target, win) - mu12
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    )
    return jnp.mean(ssim_map)


def _avg_pool3(x):
    """3x3 stride-1 average pool, zero-padded (torch F.avg_pool2d(x,3,1,1))."""
    w = np.ones((3, 3), np.float32) / 9.0
    return _depthwise_filter(x, w)


def ssim_loss(pred, target, c1: float = 0.01 ** 2, c2: float = 0.03 ** 2):
    """Simplified avg-pool SSIM loss (denoising.py:149-166)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mu1, mu2 = _avg_pool3(pred), _avg_pool3(target)
    mu1_sq, mu2_sq, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = _avg_pool3(pred * pred) - mu1_sq
    s2 = _avg_pool3(target * target) - mu2_sq
    s12 = _avg_pool3(pred * target) - mu12
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    )
    return 1.0 - jnp.mean(ssim_map)


class DenoisingLoss:
    """w_l1 * L1 + w_l2 * L2 + w_ssim * (1 - SSIM) (denoising.py:129-177)."""

    def __init__(self, l1_weight=1.0, l2_weight=1.0, ssim_weight=0.1):
        self.l1_weight = l1_weight
        self.l2_weight = l2_weight
        self.ssim_weight = ssim_weight

    def __call__(self, pred, target):
        losses = {}
        p = pred.astype(jnp.float32)
        t = target.astype(jnp.float32)
        if self.l1_weight > 0:
            losses["l1"] = jnp.mean(jnp.abs(p - t)) * self.l1_weight
        if self.l2_weight > 0:
            losses["l2"] = jnp.mean((p - t) ** 2) * self.l2_weight
        if self.ssim_weight > 0:
            losses["ssim"] = ssim_loss(p, t) * self.ssim_weight
        losses["total"] = sum(losses.values())
        return losses
