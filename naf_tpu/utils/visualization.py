"""Feature visualization: joint-PCA RGB projection + side-by-side panels
(reference utils/visualization.py:18-190, torch.pca_lowrank based).

`pca_rgb(feats_list)` fits one PCA over all given feature maps jointly (so
colors are comparable across panels) and returns [0,1] RGB images;
`plot_feats` writes a horizontal panel image (image | lr | hr ...) via PIL.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

__all__ = ["pca_rgb", "plot_feats"]


def pca_rgb(feats: Sequence[np.ndarray], dim: int = 3):
    """Joint PCA of NHWC feature maps -> list of (H, W, dim) in [0, 1]."""
    flats = [np.asarray(f, np.float32).reshape(-1, f.shape[-1]) for f in feats]
    stacked = np.concatenate(flats, axis=0)
    mean = stacked.mean(0, keepdims=True)
    centered = stacked - mean
    # top components via SVD (torch.pca_lowrank equivalent)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    comps = vt[:dim].T  # (C, dim)

    projected = [(f - mean) @ comps for f in flats]
    allp = np.concatenate(projected, axis=0)
    lo = np.percentile(allp, 1, axis=0)
    hi = np.percentile(allp, 99, axis=0)
    out = []
    for f, feat in zip(projected, feats):
        rgb = np.clip((f - lo) / np.maximum(hi - lo, 1e-8), 0, 1)
        out.append(rgb.reshape(*feat.shape[:-1], dim))
    return out


def plot_feats(
    image: Optional[np.ndarray],
    feats: Sequence[np.ndarray],
    path: Optional[str] = None,
    panel_size: Optional[int] = None,
):
    """Horizontal panel [image | pca(feat_0) | pca(feat_1) | ...] -> uint8
    array (and PNG at `path` if given). `image` is (H, W, 3) in [0, 1]."""
    from PIL import Image

    rgbs = pca_rgb([np.asarray(f)[0] if f.ndim == 4 else np.asarray(f) for f in feats])
    panels = []
    if image is not None:
        img = np.asarray(image)
        if img.ndim == 4:
            img = img[0]
        panels.append(np.clip(img, 0, 1))
    panels.extend(rgbs)

    size = panel_size or max(p.shape[0] for p in panels)
    resized = []
    for p in panels:
        im = Image.fromarray((p * 255).astype(np.uint8))
        scale = size / p.shape[0]
        im = im.resize((max(int(p.shape[1] * scale), 1), size), Image.NEAREST)
        resized.append(np.asarray(im))
    panel = np.concatenate(resized, axis=1)
    if path is not None:
        Image.fromarray(panel).save(path)
    return panel
