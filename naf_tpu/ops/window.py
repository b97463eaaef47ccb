"""Neighborhood-attention window index math (natten semantics).

Dilated 2-D neighborhood attention (the natten CUDA ops the reference calls at
src/layers/attentions.py:20,24,72) is separable per axis. For a query at
position ``i`` on an axis of length ``L`` with kernel ``k`` (odd) and dilation
``d``, the attended positions are ``start(i) + t*d`` for ``t in [0, k)``, where
``start`` keeps the window inside the *subgrid* of positions sharing
``i mod d`` (windows clamp — shift inward — at borders, so every query sees
exactly ``k`` keys per axis).

Equivalent subgrid formulation (what we implement): with ``c = i // d``,
``m = i % d`` and subgrid length ``Ls = ceil((L - m)/d)``,
``start(i) = m + d * clip(c - k//2, 0, Ls - k)``. Requires ``Ls >= k``, i.e.
``L >= k*d`` (same constraint natten enforces).

Cross-scale shortcut (NAF's trick, reference src/layers/attentions.py:48-61):
K/V are nearest-exact-upsampled from a low-res grid of length ``l`` to ``L``
and attended with ``d = L // l``. Composing the window rule with the
nearest-exact index map gives the low-res cells each query actually attends.
When ``L == l*d`` exactly, that composition collapses to the standard
(non-dilated) NA window on the LR grid for "query cell" ``i // d``:
``lr_start(i) = clip(i//d - k//2, 0, l - k)`` — k *consecutive* LR cells.
This is what the fused Pallas kernel exploits: gather windows straight from
the LR grid, never materializing upsampled K/V.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = [
    "na_window_start",
    "na_gather_indices",
    "cross_scale_lr_indices",
    "nearest_exact_src_index",
]


def na_window_start(idx: np.ndarray, length: int, kernel: int, dilation: int) -> np.ndarray:
    """Window start position for each query index (one axis, natten rule)."""
    if kernel % 2 != 1:
        raise ValueError(f"kernel size must be odd, got {kernel}")
    if length < kernel * dilation:
        raise ValueError(
            f"axis length {length} must be >= kernel*dilation = {kernel * dilation}"
        )
    idx = np.asarray(idx)
    c = idx // dilation
    m = idx % dilation
    l_sub = -((-(length - m)) // dilation)  # ceil((L - m) / d), per-query
    start_sub = np.clip(c - kernel // 2, 0, l_sub - kernel)
    return m + dilation * start_sub


@functools.lru_cache(maxsize=256)
def na_gather_indices(length: int, kernel: int, dilation: int) -> np.ndarray:
    """(length, kernel) table: attended positions per query index, one axis."""
    start = na_window_start(np.arange(length), length, kernel, dilation)
    return start[:, None] + dilation * np.arange(kernel)[None, :]


@functools.lru_cache(maxsize=256)
def nearest_exact_src_index(in_size: int, out_size: int) -> np.ndarray:
    """torch nearest-exact source index per output position (one axis)."""
    dst = np.arange(out_size, dtype=np.float64)
    src = np.floor((dst + 0.5) * (in_size / out_size)).astype(np.int64)
    return np.clip(src, 0, in_size - 1)


@functools.lru_cache(maxsize=256)
def cross_scale_lr_indices(hr_size: int, lr_size: int, kernel: int) -> np.ndarray:
    """(hr_size, kernel) table of LOW-RES cells attended by each HR query.

    Exactly reproduces the reference pipeline on one axis: nearest-exact
    upsample the LR axis to ``hr_size``, then dilated-NA with
    ``dilation = hr_size // lr_size``. Valid for any sizes (integer or
    ragged ratio) with ``hr_size >= kernel * (hr_size // lr_size)``.
    """
    dilation = max(hr_size // lr_size, 1)
    if kernel * dilation > hr_size:
        # The reference pipeline (natten na2d with dilation=ratio,
        # src/layers/attentions.py:56-57) cannot run windows wider than the
        # grid; clamp to the densest dilation that fits so small training
        # grids (e.g. 16x16 targets with ratio 2, kernel 9) degrade to a
        # tighter neighborhood instead of failing.
        dilation = max(hr_size // kernel, 1)
    hr_pos = na_gather_indices(hr_size, kernel, dilation)  # (hr, k) HR positions
    src = nearest_exact_src_index(lr_size, hr_size)  # (hr,) HR pos -> LR cell
    return src[hr_pos]
