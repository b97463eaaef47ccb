"""Spatially-varying convolution + window unfolding (NHWC).

`adaptive_conv` replaces the FeatUp CUDA extension the reference depends on
(src/model/featup.py:6,87,126 — AdaptiveConv.apply): a per-pixel k x k kernel
applied to a padded source. Expressed as k^2 shifted elementwise
multiply-adds — pure VPU work that XLA fuses into one pass; no gather ops.

`unfold_nhwc` extracts k x k neighborhoods as a leading window axis (torch
nn.Unfold semantics, used by FeatUp's learned range kernel,
featup.py:89-99).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["adaptive_conv", "unfold_nhwc", "reflect_pad2d"]


def reflect_pad2d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect-pad the two spatial axes of an ...HWC array."""
    cfg = [(0, 0)] * x.ndim
    cfg[-3] = (pad, pad)
    cfg[-2] = (pad, pad)
    return jnp.pad(x, cfg, mode="reflect")


def unfold_nhwc(x: jnp.ndarray, diameter: int) -> jnp.ndarray:
    """(B, H+2r, W+2r, C) padded input -> (B, k*k, H, W, C) windows, where
    window index p = i * k + j iterates row-major offsets (torch Unfold)."""
    b = x.shape[0]
    h = x.shape[1] - (diameter - 1)
    w = x.shape[2] - (diameter - 1)
    wins = [
        x[:, i : i + h, j : j + w, :]
        for i in range(diameter)
        for j in range(diameter)
    ]
    return jnp.stack(wins, axis=1)


def adaptive_conv(source_padded: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel convolution (FeatUp AdaptiveConv semantics, NHWC).

    On TPU, supported shapes run the fused Pallas kernel
    (naf_tpu.kernels.adaptive_conv_fused): one HBM read of source+weights
    and one write of the output. The fallback is a fori_loop over the k^2
    offsets (one multiply-add pass each — an unrolled loop makes XLA keep
    all k^2 shifted copies alive, which is GBs at 448^2 x 384).

    Args:
      source_padded: (B, H + k - 1, W + k - 1, C)
      kernel: (B, H, W, k, k) per-output-pixel weights.
    Returns:
      (B, H, W, C)
    """
    import jax

    b, hp, wp, c = source_padded.shape
    kh, kw = kernel.shape[3], kernel.shape[4]
    h, w = hp - kh + 1, wp - kw + 1
    dtype = jnp.promote_types(source_padded.dtype, kernel.dtype)

    if kh == kw and jax.default_backend() == "tpu":
        from naf_tpu.kernels.adaptive_conv_fused import (
            adaptive_conv_fused,
            adaptive_conv_fused_applicable,
        )

        if adaptive_conv_fused_applicable(h, w, c, kh, dtype.itemsize):
            return adaptive_conv_fused(source_padded, kernel)

    def body(p, acc):
        i, j = p // kw, p % kw
        win = jax.lax.dynamic_slice(source_padded, (0, i, j, 0), (b, h, w, c))
        wgt = jax.lax.dynamic_slice(kernel, (0, 0, 0, i, j), (b, h, w, 1, 1))
        return acc + win.astype(dtype) * wgt[..., 0].astype(dtype)

    return jax.lax.fori_loop(0, kh * kw, body, jnp.zeros((b, h, w, c), dtype))
