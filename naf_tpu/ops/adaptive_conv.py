"""Spatially-varying convolution + window unfolding (NHWC).

`adaptive_conv` replaces the FeatUp CUDA extension the reference depends on
(src/model/featup.py:6,87,126 — AdaptiveConv.apply): a per-pixel k x k kernel
applied to a padded source. Expressed as k^2 shifted elementwise
multiply-adds — pure VPU work that XLA fuses into one pass; no gather ops.

Differentiable end-to-end (the reference trains FeatUp/JBU through the CUDA
op's autograd): a custom VJP covers both the fused Pallas path and the XLA
fallback with one memory-bounded backward —
  d_source[u, v, c]   = sum_{i,j} kernel[u-i, v-j, i, j] * g[u-i, v-j, c]
  d_kernel[y, x, i, j] = sum_c  source[y+i, x+j, c]      * g[y, x, c]
each computed as k^2 shifted passes inside fori_loops (an unrolled or
scan-residual formulation would hold k^2 full-size slices live at once).

`unfold_nhwc` extracts k x k neighborhoods as a leading window axis (torch
nn.Unfold semantics, used by FeatUp's learned range kernel,
featup.py:89-99).
"""

from __future__ import annotations

import jax
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


def _adaptive_conv_impl(source_padded: jnp.ndarray, kernel: jnp.ndarray):
    """Primal: fused Pallas kernel on supported TPU shapes, else a fori_loop
    of k^2 shifted multiply-add passes."""
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


@jax.custom_vjp
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
    return _adaptive_conv_impl(source_padded, kernel)


def _adaptive_conv_fwd(source_padded, kernel):
    return _adaptive_conv_impl(source_padded, kernel), (source_padded, kernel)


def _adaptive_conv_bwd(res, g):
    source_padded, kernel = res
    b, hp, wp, c = source_padded.shape
    kh, kw = kernel.shape[3], kernel.shape[4]
    h, w = hp - kh + 1, wp - kw + 1
    gf = g.astype(jnp.float32)

    # d_source: scatter-add each offset's kernel-weighted cotangent into the
    # padded canvas (the transpose of the forward's shifted reads).
    def body_ds(p, acc):
        i, j = p // kw, p % kw
        wij = jax.lax.dynamic_slice(kernel, (0, 0, 0, i, j), (b, h, w, 1, 1))
        term = gf * wij[..., 0].astype(jnp.float32)
        cur = jax.lax.dynamic_slice(acc, (0, i, j, 0), (b, h, w, c))
        return jax.lax.dynamic_update_slice(acc, cur + term, (0, i, j, 0))

    d_src = jax.lax.fori_loop(
        0, kh * kw, body_ds, jnp.zeros((b, hp, wp, c), jnp.float32)
    )

    # d_kernel: per-offset channel-dot of the shifted source with the
    # cotangent (one (B, H, W) reduction pass per tap).
    def body_dk(p, acc):
        i, j = p // kw, p % kw
        win = jax.lax.dynamic_slice(source_padded, (0, i, j, 0), (b, h, w, c))
        dot = jnp.sum(win.astype(jnp.float32) * gf, axis=-1)
        return jax.lax.dynamic_update_slice(
            acc, dot[..., None, None], (0, 0, 0, i, j)
        )

    d_ker = jax.lax.fori_loop(
        0, kh * kw, body_dk, jnp.zeros((b, h, w, kh, kw), jnp.float32)
    )
    return d_src.astype(source_padded.dtype), d_ker.astype(kernel.dtype)


adaptive_conv.defvjp(_adaptive_conv_fwd, _adaptive_conv_bwd)
