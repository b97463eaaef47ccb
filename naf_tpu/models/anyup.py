"""AnyUp baseline slot (reference src/model/anyup.py:8-15).

The reference wraps the external `torch.hub.load("wimmerth/anyup")` model —
third-party pretrained weights, not part of the reference codebase. This
environment has no network egress, so the slot is a gated stub: it keeps the
registry entry and forward contract and raises with instructions unless a
local checkpoint adapter is provided.
"""

from __future__ import annotations

from flax import linen as nn

__all__ = ["AnyUpsampler"]


class AnyUpsampler(nn.Module):
    dim: int = 256
    radius: int = 3
    groups: int = 8

    def __call__(self, image, features, output_size, *args, **kwargs):
        raise NotImplementedError(
            "AnyUp is an external torch.hub model (wimmerth/anyup) in the "
            "reference; its pretrained weights are not redistributable here. "
            "Convert a locally downloaded checkpoint and register a custom "
            "model via naf_tpu.models.registry.register()."
        )
