"""Restormer restoration transformer (reference src/model/restormer.py).

4-level U-Net of transformer blocks with transposed-channel attention (MDTA:
attention over the CHANNEL axis, L2-normalized tokens, learned per-head
temperature) and gated depthwise-conv FFN (GDFN), PixelShuffle/Unshuffle
up/downsampling, global residual to the input image.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from naf_tpu.ops.resize import resize_bilinear

__all__ = ["Restormer"]


class ChanLayerNorm(nn.Module):
    """LayerNorm over channels (restormer.py:22-68); optional bias."""

    with_bias: bool = True

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        if self.with_bias:
            mu = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.var(x, axis=-1, keepdims=True)
            x = (x - mu) / jnp.sqrt(var + 1e-5)
            x = x * self.param("weight", nn.initializers.ones, (dim,))
            return x + self.param("bias", nn.initializers.zeros, (dim,))
        var = jnp.var(x, axis=-1, keepdims=True)
        return x / jnp.sqrt(var + 1e-5) * self.param(
            "weight", nn.initializers.ones, (dim,)
        )


class MDTA(nn.Module):
    """Transposed (channel-axis) self-attention (restormer.py:93-124)."""

    dim: int
    num_heads: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        n = self.num_heads
        d = c // n
        qkv = nn.Conv(c * 3, (1, 1), use_bias=self.use_bias, name="qkv")(x)
        qkv = nn.Conv(
            c * 3, (3, 3), feature_group_count=c * 3, use_bias=self.use_bias,
            padding=((1, 1), (1, 1)), name="qkv_dwconv",
        )(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # (b, hw, n, d) -> (b, n, d, hw)
            t = t.reshape(b, h * w, n, d)
            return jnp.transpose(t, (0, 2, 3, 1))

        q, k, v = heads(q), heads(k), heads(v)
        q = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.clip(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        temp = self.param("temperature", nn.initializers.ones, (n, 1, 1))
        attn = jnp.einsum(
            "bndt,bnet->bnde", q, k, preferred_element_type=jnp.float32
        ) * temp
        attn = nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bnde,bnet->bndt", attn, v)
        out = jnp.transpose(out, (0, 3, 1, 2)).reshape(b, h, w, c)
        return nn.Conv(c, (1, 1), use_bias=self.use_bias, name="project_out")(out)


class GDFN(nn.Module):
    """Gated depthwise-conv feed-forward (restormer.py:71-90)."""

    dim: int
    expansion: float = 2.66
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.expansion)
        x = nn.Conv(hidden * 2, (1, 1), use_bias=self.use_bias, name="project_in")(x)
        x = nn.Conv(
            hidden * 2, (3, 3), feature_group_count=hidden * 2,
            use_bias=self.use_bias, padding=((1, 1), (1, 1)), name="dwconv",
        )(x)
        x1, x2 = jnp.split(x, 2, axis=-1)
        x = nn.gelu(x1, approximate=False) * x2
        return nn.Conv(self.dim, (1, 1), use_bias=self.use_bias, name="project_out")(x)


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    expansion: float = 2.66
    use_bias: bool = False
    ln_bias: bool = True

    @nn.compact
    def __call__(self, x):
        x = x + MDTA(self.dim, self.num_heads, self.use_bias, name="attn")(
            ChanLayerNorm(self.ln_bias, name="norm1")(x)
        )
        x = x + GDFN(self.dim, self.expansion, self.use_bias, name="ffn")(
            ChanLayerNorm(self.ln_bias, name="norm2")(x)
        )
        return x


def _pixel_unshuffle(x, r):
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    return jnp.transpose(x, (0, 1, 3, 5, 2, 4)).reshape(b, h // r, w // r, c * r * r)


def _pixel_shuffle(x, r):
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, c // (r * r), r, r)
    return jnp.transpose(x, (0, 1, 4, 2, 5, 3)).reshape(b, h * r, w * r, c // (r * r))


class Restormer(nn.Module):
    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    ln_bias: bool = True  # "WithBias" LayerNorm

    @nn.compact
    def __call__(self, noisy_norm, noisy, output_size=None, *args, **kwargs):
        inp = resize_bilinear(noisy, output_size) if output_size else noisy
        d = self.dim

        def blocks(x, dim, heads, n, name):
            for i in range(n):
                x = TransformerBlock(
                    dim, heads, self.ffn_expansion_factor, self.use_bias,
                    self.ln_bias, name=f"{name}{i}",
                )(x)
            return x

        def down(x, dim, name):  # (restormer.py:155-164)
            x = nn.Conv(dim // 2, (3, 3), use_bias=False,
                        padding=((1, 1), (1, 1)), name=name)(x)
            return _pixel_unshuffle(x, 2)

        def up(x, dim, name):  # (restormer.py:167-176)
            x = nn.Conv(dim * 2, (3, 3), use_bias=False,
                        padding=((1, 1), (1, 1)), name=name)(x)
            return _pixel_shuffle(x, 2)

        x1 = nn.Conv(d, (3, 3), use_bias=self.use_bias,
                     padding=((1, 1), (1, 1)), name="patch_embed")(inp)
        e1 = blocks(x1, d, self.heads[0], self.num_blocks[0], "enc1_")
        e2 = blocks(down(e1, d, "down1_2"), d * 2, self.heads[1],
                    self.num_blocks[1], "enc2_")
        e3 = blocks(down(e2, d * 2, "down2_3"), d * 4, self.heads[2],
                    self.num_blocks[2], "enc3_")
        lat = blocks(down(e3, d * 4, "down3_4"), d * 8, self.heads[3],
                     self.num_blocks[3], "latent_")

        x = jnp.concatenate([up(lat, d * 8, "up4_3"), e3], axis=-1)
        x = nn.Conv(d * 4, (1, 1), use_bias=self.use_bias, name="reduce3")(x)
        x = blocks(x, d * 4, self.heads[2], self.num_blocks[2], "dec3_")

        x = jnp.concatenate([up(x, d * 4, "up3_2"), e2], axis=-1)
        x = nn.Conv(d * 2, (1, 1), use_bias=self.use_bias, name="reduce2")(x)
        x = blocks(x, d * 2, self.heads[1], self.num_blocks[1], "dec2_")

        x = jnp.concatenate([up(x, d * 2, "up2_1"), e1], axis=-1)
        x = blocks(x, d * 2, self.heads[0], self.num_blocks[0], "dec1_")
        x = blocks(x, d * 2, self.heads[0], self.num_refinement_blocks, "refine_")

        out = nn.Conv(self.out_channels, (3, 3), use_bias=self.use_bias,
                      padding=((1, 1), (1, 1)), name="output")(x)
        return out + inp
