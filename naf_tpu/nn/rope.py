"""Axial 2-D rotary position embedding (DINOv3-style, no learnable weights).

Functional JAX re-implementation of the reference RoPE
(src/layers/rope.py:15-174): per-axis coordinates normalized to [-1, 1],
geometric period spectrum of size D_head//4, angles laid out as
[u..., v..., u..., v...] and applied with rotate-half. Train-time coordinate
augmentations (shift / jitter / rescale, rope.py:107-124) are pure functions
of a PRNG key. Coordinates depend only on static shapes, so under ``jit``
XLA constant-folds them — no caching needed (reference caches per (h, w),
rope.py:159-163).

Layout is channels-last: x is (B, H, W, dim) with dim = num_heads * D_head.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["RoPE", "rope_apply", "rope_rotate_half", "rope_periods"]


def rope_rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def rope_apply(x: jnp.ndarray, sin: jnp.ndarray, cos: jnp.ndarray) -> jnp.ndarray:
    return x * cos + rope_rotate_half(x) * sin


def rope_periods(
    d_head: int,
    base: Optional[float] = 100.0,
    min_period: Optional[float] = None,
    max_period: Optional[float] = None,
) -> np.ndarray:
    """Period spectrum of size d_head//4 (reference rope.py:128-135)."""
    both = min_period is not None and max_period is not None
    if (base is None and not both) or (base is not None and both):
        raise ValueError("Either `base` or `min_period`+`max_period` must be provided.")
    n = d_head // 4
    if base is not None:
        return (base ** (2 * np.arange(n, dtype=np.float32) / (d_head // 2))).astype(
            np.float32
        )
    return np.logspace(
        math.log10(min_period), math.log10(max_period), num=n, dtype=np.float32
    )


def _normalized_coords(h: int, w: int, mode: str) -> np.ndarray:
    """(h, w, 2) coordinates in [-1, 1] (reference rope.py:89-105)."""
    if mode == "max":
        denom_h = denom_w = max(h, w)
    elif mode == "min":
        denom_h = denom_w = min(h, w)
    elif mode == "separate":
        denom_h, denom_w = h, w
    else:
        raise ValueError(f"Unknown normalize_coords: {mode}")
    ch = (np.arange(h, dtype=np.float32) + 0.5) / denom_h
    cw = (np.arange(w, dtype=np.float32) + 0.5) / denom_w
    coords = np.stack(np.meshgrid(ch, cw, indexing="ij"), axis=-1)  # (h, w, 2)
    return 2.0 * coords - 1.0


class RoPE(nn.Module):
    """Applies axial RoPE to an NHWC feature map, per attention head.

    Attributes mirror the reference constructor (rope.py:40-53).
    """

    embed_dim: int
    num_heads: int
    base: Optional[float] = 100.0
    min_period: Optional[float] = None
    max_period: Optional[float] = None
    normalize_coords: str = "separate"
    shift_coords: Optional[float] = None
    jitter_coords: Optional[float] = None
    rescale_coords: Optional[float] = None

    def setup(self):
        if self.embed_dim % (4 * self.num_heads) != 0:
            raise ValueError("embed_dim must be divisible by 4 * num_heads")
        self.d_head = self.embed_dim // self.num_heads
        self.periods = jnp.asarray(
            rope_periods(self.d_head, self.base, self.min_period, self.max_period)
        )

    def _augment(self, coords: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        """Train-time shift/jitter/rescale augmentations (rope.py:107-124)."""
        k_shift, k_jitter, k_rescale = jax.random.split(rng, 3)
        if self.shift_coords is not None:
            shift = jax.random.uniform(
                k_shift, (2,), minval=-self.shift_coords, maxval=self.shift_coords
            )
            coords = coords + shift
        if self.jitter_coords is not None:
            jmax = math.log(self.jitter_coords)
            jitter = jnp.exp(jax.random.uniform(k_jitter, (2,), minval=-jmax, maxval=jmax))
            coords = coords * jitter
        if self.rescale_coords is not None:
            rmax = math.log(self.rescale_coords)
            rescale = jnp.exp(jax.random.uniform(k_rescale, (1,), minval=-rmax, maxval=rmax))
            coords = coords * rescale
        return coords

    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        row_offset: int = 0,
        full_h: Optional[int] = None,
    ) -> jnp.ndarray:
        """Apply RoPE. `row_offset`/`full_h` support banded/streamed execution:
        x holds rows [row_offset, row_offset + h) of a full_h-tall grid and
        gets that slice of the full grid's coordinates."""
        b, h, w, c = x.shape
        if c != self.embed_dim:
            raise ValueError(f"expected {self.embed_dim} channels, got {c}")
        coords = jnp.asarray(
            _normalized_coords(full_h or h, w, self.normalize_coords)
        )[row_offset : row_offset + h]
        if train and rng is not None:
            coords = self._augment(coords, rng)

        # angles: (h, w, 2, d/4) -> flatten -> tile to (h, w, d)
        angles = 2.0 * math.pi * coords[..., None] / self.periods
        angles = angles.reshape(h, w, self.d_head // 2)
        angles = jnp.tile(angles, (1, 1, 2))
        # sin/cos in f32 for accuracy, applied in the input dtype so bf16
        # activations stay bf16 (no O(H*W*dim) f32 temporaries at 2K+).
        sin = jnp.sin(angles)[:, :, None, :].astype(x.dtype)  # (h, w, 1, d)
        cos = jnp.cos(angles)[:, :, None, :].astype(x.dtype)

        xh = x.reshape(b, h, w, self.num_heads, self.d_head)
        return rope_apply(xh, sin, cos).reshape(b, h, w, c)
