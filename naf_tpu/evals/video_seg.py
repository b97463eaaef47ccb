"""DAVIS video label propagation + J&F evaluation (reference
evaluation/eval_video_seg.py).

Non-parametric propagation (eval_video_seg.py:498-560): per frame, an
affinity exp(<normalized target feats, normalized context feats> / 0.1) over
a spatial neighborhood mask, top-k filtered and column-normalized, applied to
the context segmentations. Context = first frame + last n frames.

J (region IoU), F (boundary, Sobel edges + Euclidean distance transform) and
mean/recall/decay statistics follow the vendored DAVIS evaluator
(eval_video_seg.py:145-269).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "restrict_neighborhood",
    "label_propagation",
    "norm_mask",
    "davis_eval_iou",
    "davis_eval_boundary",
    "davis_statistics",
]


@functools.lru_cache(maxsize=16)
def restrict_neighborhood(h: int, w: int, size_mask: int) -> np.ndarray:
    """(h*w, h*w) binary mask of |di| <= m and |dj| <= m pairs
    (eval_video_seg.py:462-485)."""
    qi, qj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    qi, qj = qi.reshape(-1, 1), qj.reshape(-1, 1)
    mask = (np.abs(qi - qi.T) <= size_mask) & (np.abs(qj - qj.T) <= size_mask)
    return mask.astype(np.float32)


def norm_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """Per-channel min-max normalization of channels with positive max
    (eval_video_seg.py:488-496); mask: (C, H, W)."""
    mx = jnp.max(mask, axis=(1, 2), keepdims=True)
    mn = jnp.min(mask, axis=(1, 2), keepdims=True)
    normed = (mask - mn) / jnp.maximum(mx - mn, 1e-12)
    return jnp.where(mx > 0, normed, mask)


@functools.partial(jax.jit, static_argnames=("h", "w", "size_mask", "topk"))
def label_propagation(
    feat_tar: jnp.ndarray,  # (h*w, C) target-frame features
    feat_sources: jnp.ndarray,  # (n_ctx, C, h*w) context features
    segs: jnp.ndarray,  # (n_ctx, K, h*w) context segmentations
    h: int,
    w: int,
    size_mask: int = 12,
    topk: int = 5,
):
    """One propagation step -> (K, h, w) target segmentation scores."""
    n_ctx = feat_sources.shape[0]
    ft = feat_tar / jnp.maximum(
        jnp.linalg.norm(feat_tar, axis=1, keepdims=True), 1e-12
    )
    fs = feat_sources / jnp.maximum(
        jnp.linalg.norm(feat_sources, axis=1, keepdims=True), 1e-12
    )
    aff = jnp.exp(
        jnp.einsum(
            "qc,ncs->nqs", ft.astype(jnp.float32), fs.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
        / 0.1
    )  # (n_ctx, q=h*w, s=h*w)

    if size_mask > 0:
        aff = aff * jnp.asarray(restrict_neighborhood(h, w, size_mask))[None]

    # (n_ctx * s, q): top-k over all context keys per query
    aff = jnp.transpose(aff, (0, 2, 1)).reshape(-1, h * w)
    kth = -jnp.sort(-aff, axis=0)[topk - 1]  # per-query k-th largest
    aff = jnp.where(aff < kth, 0.0, aff)
    aff = aff / jnp.sum(aff, axis=0, keepdims=True)

    k = segs.shape[1]
    segs_flat = jnp.transpose(segs, (1, 0, 2)).reshape(k, -1)  # (K, n_ctx*s)
    seg_tar = jnp.matmul(
        segs_flat.astype(jnp.float32), aff, precision=jax.lax.Precision.HIGHEST
    )  # (K, q)
    return seg_tar.reshape(k, h, w)


# ---------------------------------------------------------------- J & F ----


def davis_eval_iou(annotation: np.ndarray, segmentation: np.ndarray) -> np.ndarray:
    """Region similarity J (eval_video_seg.py:145-167)."""
    a = annotation.astype(bool)
    s = segmentation.astype(bool)
    inters = np.sum(a & s, axis=(-2, -1))
    union = np.sum(a | s, axis=(-2, -1))
    j = inters / np.maximum(union, 1e-12)
    j = np.where(np.isclose(union, 0), 1.0, j)
    return j


def _seg2bmap(seg: np.ndarray) -> np.ndarray:
    """Sobel boundary map (eval_video_seg.py:209-227); mirror border like
    cv2.filter2D's default BORDER_REFLECT_101."""
    from scipy.ndimage import correlate

    s = seg.astype(bool).astype(np.float32)
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
    ky = kx.T
    ex = correlate(s, kx, mode="mirror")
    ey = correlate(s, ky, mode="mirror")
    return np.sqrt(ex ** 2 + ey ** 2) > 0.1


def _f_measure(fg: np.ndarray, gt: np.ndarray, bound_th: float = 0.008) -> float:
    from scipy.ndimage import distance_transform_edt

    bound_pix = bound_th if bound_th >= 1 else np.ceil(
        bound_th * np.linalg.norm(fg.shape)
    )
    fb = _seg2bmap(fg)
    gb = _seg2bmap(gt)
    fg_dist = distance_transform_edt(~fb)
    gt_dist = distance_transform_edt(~gb)
    precision = np.sum(fb * (gt_dist <= bound_pix)) / (np.sum(fb) + 1e-10)
    recall = np.sum(gb * (fg_dist <= bound_pix)) / (np.sum(gb) + 1e-10)
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


def davis_eval_boundary(annotation: np.ndarray, segmentation: np.ndarray) -> np.ndarray:
    """Boundary F per frame (eval_video_seg.py:231-250)."""
    if annotation.ndim == 3:
        return np.array(
            [
                _f_measure(segmentation[i], annotation[i])
                for i in range(annotation.shape[0])
            ]
        )
    return np.array(_f_measure(segmentation, annotation))


def davis_statistics(per_frame: np.ndarray) -> Tuple[float, float, float]:
    """(mean, recall, decay) statistics (eval_video_seg.py:253-269)."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", category=RuntimeWarning)
        m = np.nanmean(per_frame)
        o = np.nanmean(per_frame > 0.5)
    n_bins = 4
    ids = np.round(np.linspace(1, len(per_frame), n_bins + 1) + 1e-10) - 1
    ids = ids.astype(int)
    bins = [per_frame[ids[i] : ids[i + 1] + 1] for i in range(n_bins)]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", category=RuntimeWarning)
        d = np.nanmean(bins[0]) - np.nanmean(bins[3])
    return float(m), float(o), float(d)
