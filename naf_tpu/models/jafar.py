"""JAFAR: global cross-attention upsampler (reference src/model/jafar.py).

Prior work by the NAF authors — the main contrast baseline: attention over
ALL h*w low-res keys (O(N * hw), the reason it OOMs at high ratios where NAF
stays O(N * k^2); SURVEY §5 long-context note). Components: conv image
encoder + learnable-frequency RoPE (jafar.py:73-98), SFT modulation of keys
by encoded LR features (jafar.py:101-111,156), multi-head attention whose
head-averaged scores are re-applied to the *raw* values (jafar.py:35-42).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from naf_tpu.nn.conv import Encoder
from naf_tpu.ops.pool import adaptive_avg_pool2d

__all__ = ["JAFAR"]


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


class JafarRoPE(nn.Module):
    """Learnable-frequency RoPE (jafar.py:73-98); init matches
    _device_weight_init, frequencies stored as a trainable param."""

    dim: int
    theta: float = 100.0

    @nn.compact
    def __call__(self, x, coords):
        def init(key, shape, dtype=jnp.float32):
            f1 = self.theta ** np.linspace(0, -1, self.dim // 4, dtype=np.float32)
            f1 = np.concatenate([f1, f1])
            f2 = np.zeros((2, self.dim), np.float32)
            f2[0, : self.dim // 2] = f1
            f2[1, self.dim // 2 :] = f1
            return jnp.asarray(f2 * 2 * math.pi, dtype)

        freqs = self.param("freqs", init, (2, self.dim))
        angle = coords @ freqs  # (b, hw, dim)
        return x * jnp.cos(angle) + _rotate_half(x) * jnp.sin(angle)


class SFT(nn.Module):
    """Spatial feature transform modulation (jafar.py:101-111)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 1

    @nn.compact
    def __call__(self, image, features):
        gamma = nn.Conv(
            self.out_channels, (self.kernel_size,) * 2, use_bias=False, name="gamma"
        )(features)
        beta = nn.Conv(
            self.out_channels, (self.kernel_size,) * 2, use_bias=False, name="beta"
        )(features)
        normed = nn.GroupNorm(
            num_groups=8, epsilon=1e-5, use_bias=False, use_scale=False, name="norm"
        )(image)
        return gamma * normed + beta


class GlobalCrossAttention(nn.Module):
    """Head-averaged attention scores applied to raw values (jafar.py:21-42)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, q, k, v_raw):
        q = nn.RMSNorm(name="norm_q")(q)
        k = nn.RMSNorm(name="norm_k")(k)
        n, d = self.num_heads, self.dim // self.num_heads
        qh = nn.DenseGeneral((n, d), name="q_proj")(q)
        kh = nn.DenseGeneral((n, d), name="k_proj")(k)
        logits = jnp.einsum(
            "bind,bjnd->bnij", qh * (d ** -0.5), kh,
            preferred_element_type=jnp.float32,
        )
        scores = nn.softmax(logits, axis=-1).mean(axis=1)  # avg heads
        return jnp.einsum("bij,bjd->bid", scores.astype(v_raw.dtype), v_raw)


class JAFAR(nn.Module):
    dim: int = 128
    v_dim: int = 384
    kernel_size: int = 1
    num_heads: int = 4

    @nn.compact
    def __call__(self, image, features, output_size, *args, **kwargs):
        b = image.shape[0]
        oh, ow = int(output_size[0]), int(output_size[1])
        hk, wk = features.shape[1], features.shape[2]

        x = Encoder(
            self.dim, kernel_size=self.kernel_size, ks_res=self.kernel_size,
            num_layers=2, use_bias=False, residual=True, name="image_encoder",
        )(image)
        h, w = x.shape[1], x.shape[2]

        # coords: linspace(0,1) grid (utils/img.py:11-20)
        ch = np.linspace(0, 1, h, dtype=np.float32)
        cw = np.linspace(0, 1, w, dtype=np.float32)
        coords = np.stack(np.meshgrid(ch, cw, indexing="ij"), -1).reshape(-1, 2)
        x = x.reshape(b, h * w, self.dim)
        x = JafarRoPE(self.dim, name="rope")(x, jnp.asarray(coords))
        x = x.reshape(b, h, w, self.dim)

        queries = Encoder(
            self.dim, kernel_size=1, ks_res=1, num_layers=2,
            use_bias=False, residual=True, name="query_encoder",
        )(x)
        queries = adaptive_avg_pool2d(queries, (oh, ow))
        queries = nn.GroupNorm(
            num_groups=8, epsilon=1e-5, use_bias=False, use_scale=False, name="norm"
        )(queries)

        keys = Encoder(
            self.dim, kernel_size=1, ks_res=1, num_layers=2,
            use_bias=False, residual=True, name="key_encoder",
        )(x)
        keys = adaptive_avg_pool2d(keys, (hk, wk))
        f_normed = features / jnp.clip(
            jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-12
        )
        f_enc = Encoder(
            self.dim, kernel_size=1, ks_res=1, num_layers=2,
            use_bias=False, residual=True, name="key_features_encoder",
        )(f_normed)
        keys = SFT(self.dim, self.dim, name="sft_key")(keys, f_enc)

        # cross_decode: 3x3 conv on queries then global attention
        q = nn.Conv(self.dim, (3, 3), use_bias=False, name="cross_decode_conv")(queries)
        q = q.reshape(b, oh * ow, self.dim)
        k = keys.reshape(b, hk * wk, self.dim)
        v = features.reshape(b, hk * wk, self.v_dim)
        out = GlobalCrossAttention(self.dim, self.num_heads, name="cross_decode")(
            q, k, v
        )
        return out.reshape(b, oh, ow, self.v_dim)
