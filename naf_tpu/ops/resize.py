"""Image resizing with exact PyTorch `F.interpolate` semantics.

The reference relies on three torch resize modes whose index math we must
reproduce bit-for-bit (reference: src/layers/attentions.py:49 nearest-exact
K/V upsampling; src/model/naf.py:40-48 bilinear input guard;
utils/training.py:37-43 bilinear feature-target downscale):

- ``nearest-exact``: src = floor((dst + 0.5) * in / out), clamped.
- ``bilinear`` (align_corners=False, antialias=False): src = max(0,
  (dst + 0.5) * in / out - 0.5), lerp of floor/ceil neighbours.

`jax.image.resize` antialiases on downsample (kernel widened by the scale
factor), which torch does NOT do by default, so we implement the separable
gather + lerp directly. All functions are channels-last (NHWC) and operate on
the two axes just before the channel axis; leading axes are free.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["resize_nearest_exact", "resize_bilinear", "resize_bicubic"]


@functools.lru_cache(maxsize=256)
def _nearest_exact_index(in_size: int, out_size: int) -> np.ndarray:
    """Static source-index table for one axis (torch nearest-exact rule)."""
    dst = np.arange(out_size, dtype=np.float64)
    src = np.floor((dst + 0.5) * (in_size / out_size)).astype(np.int64)
    return np.clip(src, 0, in_size - 1)


@functools.lru_cache(maxsize=256)
def _bilinear_index_weight(in_size: int, out_size: int):
    """Static (lo, hi, frac) tables for one axis (torch bilinear, no AA)."""
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * (in_size / out_size) - 0.5
    src = np.maximum(src, 0.0)
    lo = np.floor(src).astype(np.int64)
    lo = np.minimum(lo, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    return lo, hi, frac


def resize_nearest_exact(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Nearest-exact resize of an NHWC (or ...HWC) array to ``size=(H, W)``."""
    h_out, w_out = int(size[0]), int(size[1])
    h_in, w_in = x.shape[-3], x.shape[-2]
    if (h_in, w_in) == (h_out, w_out):
        return x
    if h_in != h_out:
        x = jnp.take(x, jnp.asarray(_nearest_exact_index(h_in, h_out)), axis=-3)
    if w_in != w_out:
        x = jnp.take(x, jnp.asarray(_nearest_exact_index(w_in, w_out)), axis=-2)
    return x


def _lerp_axis(x: jnp.ndarray, axis: int, in_size: int, out_size: int) -> jnp.ndarray:
    lo, hi, frac = _bilinear_index_weight(in_size, out_size)
    x_lo = jnp.take(x, jnp.asarray(lo), axis=axis)
    x_hi = jnp.take(x, jnp.asarray(hi), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    t = jnp.asarray(frac, dtype=x_lo.dtype).reshape(shape)
    return x_lo + (x_hi - x_lo) * t


@functools.lru_cache(maxsize=256)
def _bicubic_index_weight(in_size: int, out_size: int):
    """Static (idx[4], weight[4]) tables per axis (torch bicubic, A=-0.75,
    align_corners=False, no antialias; border taps clamp)."""
    a = -0.75

    def cubic(x):
        x = np.abs(x)
        w = np.where(
            x <= 1,
            ((a + 2) * x - (a + 3)) * x * x + 1,
            np.where(x < 2, (((x - 5) * x + 8) * x - 4) * a, 0.0),
        )
        return w

    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * (in_size / out_size) - 0.5
    base = np.floor(src).astype(np.int64)
    frac = src - base
    idx = np.stack([base - 1, base, base + 1, base + 2], axis=1)
    offs = np.stack([frac + 1, frac, 1 - frac, 2 - frac], axis=1)
    w = cubic(offs)
    idx = np.clip(idx, 0, in_size - 1)
    return idx, w.astype(np.float32)


def _cubic_axis(x: jnp.ndarray, axis: int, in_size: int, out_size: int) -> jnp.ndarray:
    idx, w = _bicubic_index_weight(in_size, out_size)
    out = None
    for t in range(4):
        xt = jnp.take(x, jnp.asarray(idx[:, t]), axis=axis)
        shape = [1] * x.ndim
        shape[axis] = out_size
        wt = jnp.asarray(w[:, t], dtype=xt.dtype).reshape(shape)
        out = xt * wt if out is None else out + xt * wt
    return out


def resize_bicubic(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Bicubic (align_corners=False, no antialias) resize of ...HWC array
    (torch `F.interpolate(mode="bicubic")` / `nn.Upsample` semantics)."""
    h_out, w_out = int(size[0]), int(size[1])
    h_in, w_in = x.shape[-3], x.shape[-2]
    if (h_in, w_in) == (h_out, w_out):
        return x
    orig_dtype = x.dtype
    if not jnp.issubdtype(orig_dtype, jnp.floating):
        x = x.astype(jnp.float32)
    if h_in != h_out:
        x = _cubic_axis(x, x.ndim - 3, h_in, h_out)
    if w_in != w_out:
        x = _cubic_axis(x, x.ndim - 2, w_in, w_out)
    return x if jnp.issubdtype(orig_dtype, jnp.floating) else x.astype(orig_dtype)


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Bilinear (align_corners=False, no antialias) resize of ...HWC array."""
    h_out, w_out = int(size[0]), int(size[1])
    h_in, w_in = x.shape[-3], x.shape[-2]
    if (h_in, w_in) == (h_out, w_out):
        return x
    orig_dtype = x.dtype
    if not jnp.issubdtype(orig_dtype, jnp.floating):
        x = x.astype(jnp.float32)
    if h_in != h_out:
        x = _lerp_axis(x, x.ndim - 3, h_in, h_out)
    if w_in != w_out:
        x = _lerp_axis(x, x.ndim - 2, w_in, w_out)
    return x if jnp.issubdtype(orig_dtype, jnp.floating) else x.astype(orig_dtype)
