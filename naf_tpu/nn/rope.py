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

import functools
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


def _axis_coords(h: int, w: int, mode: str):
    """Per-axis coordinates in [-1, 1] (reference rope.py:89-105): the 2-D
    grid is the outer product of these, so it never needs materializing."""
    if mode == "max":
        denom_h = denom_w = max(h, w)
    elif mode == "min":
        denom_h = denom_w = min(h, w)
    elif mode == "separate":
        denom_h, denom_w = h, w
    else:
        raise ValueError(f"Unknown normalize_coords: {mode}")
    ch = 2.0 * (np.arange(h, dtype=np.float32) + 0.5) / denom_h - 1.0
    cw = 2.0 * (np.arange(w, dtype=np.float32) + 0.5) / denom_w - 1.0
    return ch, cw


@functools.lru_cache(maxsize=32)
def _rotate_half_matrix(num_heads: int, d_head: int) -> np.ndarray:
    """(C, C) signed permutation: y = x @ M gives per-head rotate-half
    ([-x2, x1], reference rope.py:139-146). Column o*dh + j reads source
    channel o*dh + (j + dh/2 with sign -1 if j < dh/2 else j - dh/2)."""
    c = num_heads * d_head
    m = np.zeros((c, c), dtype=np.float32)
    half = d_head // 2
    for head in range(num_heads):
        o = head * d_head
        for j in range(half):
            m[o + half + j, o + j] = -1.0  # out[:half] = -x2
            m[o + j, o + half + j] = 1.0  # out[half:] = x1
    return m


def _normalized_coords(h: int, w: int, mode: str) -> np.ndarray:
    """(h, w, 2) coordinates in [-1, 1] (kept for tests/introspection)."""
    ch, cw = _axis_coords(h, w, mode)
    return np.stack(np.meshgrid(ch, cw, indexing="ij"), axis=-1)


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

    def _augment_axes(self, ch: jnp.ndarray, cw: jnp.ndarray, rng: jax.Array):
        """Train-time shift/jitter/rescale augmentations (rope.py:107-124).

        All three act per-axis (shift adds a scalar per axis, jitter/rescale
        multiply), so they compose with the separable coordinate tables."""
        k_shift, k_jitter, k_rescale = jax.random.split(rng, 3)
        if self.shift_coords is not None:
            shift = jax.random.uniform(
                k_shift, (2,), minval=-self.shift_coords, maxval=self.shift_coords
            )
            ch, cw = ch + shift[0], cw + shift[1]
        if self.jitter_coords is not None:
            jmax = math.log(self.jitter_coords)
            jitter = jnp.exp(jax.random.uniform(k_jitter, (2,), minval=-jmax, maxval=jmax))
            ch, cw = ch * jitter[0], cw * jitter[1]
        if self.rescale_coords is not None:
            rmax = math.log(self.rescale_coords)
            rescale = jnp.exp(jax.random.uniform(k_rescale, (1,), minval=-rmax, maxval=rmax))
            ch, cw = ch * rescale[0], cw * rescale[0]
        return ch, cw

    def tables(
        self,
        h: int,
        w: int,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        row_offset: int = 0,
        full_h: Optional[int] = None,
    ):
        """Separable per-axis sin/cos tables: (sin_r, cos_r) of shape (h, C)
        and (sin_c, cos_c) of shape (w, C), f32. Every channel's angle
        depends on exactly one axis (the [u, v, u, v] layout of reference
        rope.py:139-146); ones fill the complementary slots, so
        ``field = row_table * col_table`` without materializing (h, w, C)."""
        fh = full_h or h
        ch, cw = _axis_coords(fh, w, self.normalize_coords)
        ch = jnp.asarray(ch)[row_offset : row_offset + h]
        cw = jnp.asarray(cw)
        if train and rng is not None:
            ch, cw = self._augment_axes(ch, cw, rng)

        # per-axis angle tables (h, d/4) and (w, d/4), f32
        au = (2.0 * math.pi) * ch[:, None] / self.periods
        av = (2.0 * math.pi) * cw[:, None] / self.periods
        one_u = jnp.ones_like(au)
        one_v = jnp.ones_like(av)
        n = self.num_heads
        sin_r = jnp.tile(
            jnp.concatenate([jnp.sin(au), one_u, jnp.sin(au), one_u], -1), (1, n)
        )
        cos_r = jnp.tile(
            jnp.concatenate([jnp.cos(au), one_u, jnp.cos(au), one_u], -1), (1, n)
        )
        sin_c = jnp.tile(
            jnp.concatenate([one_v, jnp.sin(av), one_v, jnp.sin(av)], -1), (1, n)
        )
        cos_c = jnp.tile(
            jnp.concatenate([one_v, jnp.cos(av), one_v, jnp.cos(av)], -1), (1, n)
        )
        return sin_r, cos_r, sin_c, cos_c

    def rotate_matrix(self, dtype=jnp.float32) -> jnp.ndarray:
        """(C, C) signed-permutation rotate-half matrix for this head shape."""
        return jnp.asarray(_rotate_half_matrix(self.num_heads, self.d_head), dtype)

    def pooled(
        self,
        x: jnp.ndarray,
        up_hw: tuple[int, int],
        down_hw: tuple[int, int],
        row0: int = 0,
        full_h: Optional[int] = None,
    ) -> jnp.ndarray:
        """``adaptive_pool(rope(adaptive_pool(x, up_hw)), down_hw)`` without
        materializing the (potentially huge) up_hw grid.

        This is exactly the NAF KeyEncoder path (reference src/model/naf.py:
        34,51,68: encoder output pooled up to output size, RoPE'd, pooled
        down to the LR grid). Because every RoPE channel's sin/cos factors
        into (row table) x (col table) and both pools are separable row/col
        matrices, each term collapses per channel:

          keys_c = (Pd_r diag(cos_r[:, c]) Pu_r) x_c (Pd_c diag(cos_c[:, c]) Pu_c)^T
                 + (Pd_r diag(sin_r[:, c]) Pu_r) rot_c (Pd_c diag(sin_c[:, c]) Pu_c)^T

        where rot = x @ rotate_half matrix. The bracketed matrices are
        (down, in)-shaped per channel — O(hk * hi * C) instead of O(hq^2 * C)
        work; at 448->2048->128 this replaces ~20 ms of pool-up + rope +
        keys-pool passes with ~0.5 ms of small einsums.

        Inference-only (no coordinate augmentations).

        row0/full_h support banded streaming: x holds rows
        [row0, row0 + hi) of a full_h-row encoder grid, and the return is
        that band's CONTRIBUTION to the keys (the row pool is linear, so
        summing the per-band results over a partition of the rows
        reproduces pooled(full_x) exactly). Used by the banded-encoder
        streaming path (naf_tpu.api.naf_streamed) where the full-resolution
        encoder output never exists.
        """
        from naf_tpu.ops.pool import _pool_matrix, adaptive_avg_pool2d

        b, hi, wi, c = x.shape
        fh = full_h or hi
        oh, ow = int(up_hw[0]), int(up_hw[1])
        kh, kw = int(down_hw[0]), int(down_hw[1])
        if (hi, wi) == (oh, ow) and full_h is None:
            # identity up-pool: the separable per-channel collapse below
            # degenerates to C-batched (kh, oh) x (oh, ow) einsums whose
            # minor-dim batching runs ~40 ms at 2048^2; the plain
            # rope -> pool-down path is one fused elementwise pass plus the
            # rotate matmul and is exact. (A fused Pallas rope+pool kernel
            # was tried in round 3 and measured SLOWER — 11.0 vs 6.6 ms at
            # 2048^2/C256: the out-block revisits across the sequential
            # column grid break x-tile pipelining, and the XLA path is
            # already within ~2x of its HBM floor.)
            return adaptive_avg_pool2d(self(x), (kh, kw))
        ch, cw = _axis_coords(oh, ow, self.normalize_coords)
        nfreq = self.d_head // 4

        def axis_mats(out_len, mid_len, in_len, coords):
            """Per-channel (C, out, in) pool-down * table * pool-up matrices.

            The angle tables have only d_head//4 distinct frequency columns
            (tiled across heads and u/v slots, plus all-ones slots), so the
            expensive (out, mid) x (mid, in) contraction runs on nfreq+1
            unique channels and is gathered out to C."""
            ang = (2.0 * math.pi) * jnp.asarray(coords)[:, None] / self.periods
            pu = jnp.asarray(_pool_matrix(in_len, mid_len))  # (mid, in)
            pd = jnp.asarray(_pool_matrix(mid_len, out_len))  # (out, mid)
            ones = jnp.ones((mid_len, 1), jnp.float32)
            uniq = jnp.concatenate(
                [jnp.cos(ang), jnp.sin(ang), ones], axis=-1
            )  # (mid, 2*nfreq + 1)
            a_uniq = jnp.einsum("oi,iu,ij->uoj", pd, uniq, pu)
            return a_uniq  # (2*nfreq + 1, out, in)

        def expand(a_uniq, this_axis_first: bool):
            # channel layout per head: [u(nf), v(nf), u(nf), v(nf)]; the
            # cos table has cos in this axis's slots, ones in the other's;
            # the sin table has sin here, ones there.
            f = np.arange(nfreq)
            one = 2 * nfreq
            if this_axis_first:  # row axis (u slots)
                cos_map = np.concatenate([f, [one] * nfreq] * 2)
                sin_map = np.concatenate([f + nfreq, [one] * nfreq] * 2)
            else:  # col axis (v slots)
                cos_map = np.concatenate([[one] * nfreq, f] * 2)
                sin_map = np.concatenate([[one] * nfreq, f + nfreq] * 2)
            cos_map = np.tile(cos_map, self.num_heads)
            sin_map = np.tile(sin_map, self.num_heads)
            return a_uniq[jnp.asarray(cos_map)], a_uniq[jnp.asarray(sin_map)]

        ar = axis_mats(kh, oh, fh, ch)[:, :, row0 : row0 + hi]
        ac = axis_mats(kw, ow, wi, cw)
        ar_cos, ar_sin = expand(ar, True)
        ac_cos, ac_sin = expand(ac, False)

        dt = x.dtype
        rot = jnp.einsum(
            "bhwc,cd->bhwd", x, self.rotate_matrix(dt),
            precision=(jax.lax.Precision.HIGHEST if dt == jnp.float32
                       else jax.lax.Precision.DEFAULT),
        )
        ar_cos, ar_sin = ar_cos.astype(dt), ar_sin.astype(dt)
        ac_cos, ac_sin = ac_cos.astype(dt), ac_sin.astype(dt)
        term_c = jnp.einsum("ckj,bjwc->bkwc", ar_cos, x)
        term_c = jnp.einsum("clw,bkwc->bklc", ac_cos, term_c)
        term_s = jnp.einsum("ckj,bjwc->bkwc", ar_sin, rot)
        term_s = jnp.einsum("clw,bkwc->bklc", ac_sin, term_s)
        return (term_c + term_s).astype(dt)

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
        gets that slice of the full grid's coordinates.

        Every channel's angle depends on the row coordinate only (u channels)
        or the column coordinate only (v channels) — the [u, v, u, v] layout
        of reference rope.py:139-146 — so the sin/cos fields factor into a
        (h, C) row table times a (w, C) column table with ones in the
        complementary slots. The apply is then ONE fused elementwise pass
        over x with two tiny broadcast operands: no (h, w, d) angle tensor,
        no transcendentals at HxW, and no 5-D head-split temporaries (whose
        (heads, d_head) minor dims tile-pad 2-4x in HBM at 2K+ resolutions).
        """
        b, h, w, c = x.shape
        if c != self.embed_dim:
            raise ValueError(f"expected {self.embed_dim} channels, got {c}")
        sin_r, cos_r, sin_c, cos_c = self.tables(
            h, w, train=train, rng=rng, row_offset=row_offset, full_h=full_h
        )

        dt = x.dtype
        sin_r = sin_r.astype(dt)[None, :, None, :]  # (1, h, 1, C)
        cos_r = cos_r.astype(dt)[None, :, None, :]
        sin_c = sin_c.astype(dt)[None, None, :, :]  # (1, 1, w, C)
        cos_c = cos_c.astype(dt)[None, None, :, :]

        # rotate-half per head as a matmul with a signed permutation matrix:
        # channel slicing/concat at d_head/2 granularity materializes
        # tile-padded (..., 32)-minor temporaries (4x HBM at 2K+), while the
        # MXU does the shuffle in one pass. Exact: one +-1 entry per column
        # (HIGHEST keeps f32 operands unsplit; bf16 * +-1 is exact anyway).
        rmat = self.rotate_matrix(x.dtype)
        prec = (
            jax.lax.Precision.HIGHEST
            if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        rot = jnp.einsum("bhwc,cd->bhwd", x, rmat, precision=prec)

        return x * cos_r * cos_c + rot * sin_r * sin_c
