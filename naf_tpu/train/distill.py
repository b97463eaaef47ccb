"""Self-distillation feature targets (reference utils/training.py:24-50).

hr_feats = backbone(image); lr_feats = backbone(bilinear_downscale(image)).
The model is trained to predict hr_feats from (image, lr_feats) — features
extracted at full resolution from features extracted at low resolution —
which is what makes NAF zero-shot across scales.

JAX twist: the downscale size must be static under jit, so the random factor
is sampled on the HOST per step and rounded to a patch multiple; the small
set of distinct sizes each compile once.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

from naf_tpu.ops.resize import resize_bilinear

__all__ = ["round_to_nearest_multiple", "sample_lr_size", "compute_feats"]


def round_to_nearest_multiple(value: float, multiple: int = 14) -> int:
    return int(multiple * round(value / multiple))


def sample_lr_size(
    hw: Tuple[int, int],
    patch_size: int,
    down_factor: str = "fixed",
    rng: Optional[np.random.RandomState] = None,
    min_rescale: float = 0.25,
    max_rescale: float = 0.60,
) -> Tuple[int, int]:
    """Host-side LR image size (utils/training.py:36-46)."""
    if down_factor == "random":
        rng = rng or np.random
        factor = float(rng.uniform(min_rescale, max_rescale))
    elif down_factor == "fixed":
        factor = 0.5
    else:
        raise ValueError(f"unknown down_factor {down_factor}")
    return (
        round_to_nearest_multiple(hw[0] * factor, patch_size),
        round_to_nearest_multiple(hw[1] * factor, patch_size),
    )


def compute_feats(
    backbone_apply: Callable,
    image: "jax.Array",  # noqa: F821
    lr_size: Tuple[int, int],
):
    """hr/lr feature targets. backbone_apply: NHWC image -> NHWC features;
    wrap in jax.lax.stop_gradient by the caller if used inside a grad."""
    hr_feats = backbone_apply(image)
    lr_image = resize_bilinear(image, lr_size)
    lr_feats = backbone_apply(lr_image)
    return hr_feats, lr_feats
