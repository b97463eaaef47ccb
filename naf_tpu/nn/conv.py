"""Conv encoder stack (reference src/layers/convolutions.py:6-92), NHWC.

``Encoder`` = entry Conv (reflect pad) + N ``EncBlock``s, where
EncBlock = GN -> SiLU -> Conv -> GN -> SiLU -> Conv (+ optional 1x1 shortcut
and residual add; NAF's default is plain feed-forward, residual=False).

Reflect padding is applied explicitly with ``jnp.pad`` (flax Conv only zero-
pads); GroupNorm uses torch's eps=1e-5 and contiguous channel grouping so
converted weights are numerically interchangeable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["Encoder", "EncBlock", "reflect_conv"]


class ReflectConv(nn.Module):
    """Conv2d with 'same' reflect padding (torch padding_mode='reflect')."""

    features: int
    kernel_size: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        p = self.kernel_size // 2
        if p > 0:
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
        # HIGHEST: keep float32 runs numerically faithful to the reference;
        # bf16 inputs still take the native MXU path.
        return nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            padding="VALID",
            use_bias=self.use_bias,
            precision=jax.lax.Precision.HIGHEST,
            name="conv",
        )(x)


def reflect_conv(features: int, kernel_size: int, use_bias: bool = True, name=None):
    return ReflectConv(features, kernel_size, use_bias, name=name)


class EncBlock(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: int = 3
    num_groups: int = 8
    use_conv_shortcut: bool = False
    use_bias: bool = True
    residual: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        x = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5, name="norm1")(x)
        x = nn.silu(x)
        x = reflect_conv(self.out_channels, self.kernel_size, self.use_bias, name="conv1")(x)
        x = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5, name="norm2")(x)
        x = nn.silu(x)
        x = reflect_conv(self.out_channels, self.kernel_size, self.use_bias, name="conv2")(x)
        if self.use_conv_shortcut or self.in_channels != self.out_channels:
            residual = reflect_conv(self.out_channels, 1, self.use_bias, name="shortcut")(residual)
        if self.residual:
            return x + residual
        return x


class Encoder(nn.Module):
    """Entry conv + ``num_layers`` EncBlocks (reference encoder(), conv.py:67-92)."""

    hidden_dim: int
    kernel_size: int = 1
    ks_res: int = 1
    num_layers: int = 2
    use_bias: bool = True
    num_groups: int = 8
    residual: bool = False

    @nn.compact
    def __call__(self, x):
        x = reflect_conv(self.hidden_dim, self.kernel_size, self.use_bias, name="stem")(x)
        for i in range(self.num_layers):
            x = EncBlock(
                in_channels=self.hidden_dim,
                out_channels=self.hidden_dim,
                kernel_size=self.ks_res,
                num_groups=self.num_groups,
                use_bias=self.use_bias,
                residual=self.residual,
                name=f"block{i}",
            )(x)
        return x
