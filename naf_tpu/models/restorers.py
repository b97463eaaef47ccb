"""Image-restoration baselines: IRCNN and REDNet (reference
src/model/ircnn.py:27-67, src/model/rednet.py:11-59).

Both follow the restoration forward contract `(noisy_norm, noisy,
output_size)` and predict the noise residual. IRCNN: 7-layer dilated conv
chain (dilations 1,2,3,4,3,2,1). REDNet: stride-2 conv encoder + transposed
conv decoder with skip connections every other layer.
"""

from __future__ import annotations

import math

from flax import linen as nn

from naf_tpu.ops.resize import resize_bilinear

__all__ = ["IRCNN", "REDNet"]


class IRCNN(nn.Module):
    in_nc: int = 3
    out_nc: int = 3
    nc: int = 64

    @nn.compact
    def __call__(self, noisy_norm, noisy, output_size=None, *args, **kwargs):
        x = resize_bilinear(noisy, output_size) if output_size else noisy
        inp = x
        for i, dil in enumerate((1, 2, 3, 4, 3, 2, 1)):
            feats = self.out_nc if i == 6 else self.nc
            x = nn.Conv(
                feats, (3, 3), kernel_dilation=(dil, dil),
                padding=((dil, dil), (dil, dil)), name=f"conv{i}",
            )(x)
            if i < 6:
                x = nn.relu(x)
        return inp - x  # predicts noise (ircnn.py:64-67)


class REDNet(nn.Module):
    input_dim: int = 3
    num_layers: int = 15
    num_features: int = 64

    @nn.compact
    def __call__(self, noisy_norm, noisy, output_size=None, *args, **kwargs):
        x = resize_bilinear(noisy, output_size) if output_size else noisy
        residual = x

        conv_feats = []
        n_skips = math.ceil(self.num_layers / 2) - 1
        for i in range(self.num_layers):
            stride = 2 if i == 0 else 1
            x = nn.Conv(
                self.num_features, (3, 3), strides=(stride, stride),
                padding=((1, 1), (1, 1)), name=f"conv{i}",
            )(x)
            x = nn.relu(x)
            if (i + 1) % 2 == 0 and len(conv_feats) < n_skips:
                conv_feats.append(x)

        skip_idx = 0
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            if last:
                x = nn.ConvTranspose(
                    self.input_dim, (3, 3), strides=(2, 2), padding="SAME",
                    name=f"deconv{i}",
                )(x)
            else:
                x = nn.ConvTranspose(
                    self.num_features, (3, 3), padding=((1, 1), (1, 1)),
                    name=f"deconv{i}",
                )(x)
                x = nn.relu(x)
            if (i + 1 + self.num_layers) % 2 == 0 and skip_idx < len(conv_feats):
                x = x + conv_feats[-(skip_idx + 1)]
                skip_idx += 1
                if not last:
                    x = nn.relu(x)
        return residual - x  # predicts noise (rednet.py:57-59)
