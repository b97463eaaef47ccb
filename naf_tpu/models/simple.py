"""Trivial upsampler baselines (reference src/model/bilinear.py, nearest.py)."""

from __future__ import annotations

from flax import linen as nn

from naf_tpu.ops.resize import resize_bilinear, resize_nearest_exact

__all__ = ["Bilinear", "Nearest"]


class Bilinear(nn.Module):
    def __call__(self, image, features, output_size, *args, **kwargs):
        return resize_bilinear(features, output_size)


class Nearest(nn.Module):
    def __call__(self, image, features, output_size, *args, **kwargs):
        return resize_nearest_exact(features, output_size)
