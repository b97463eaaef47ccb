"""Flax Vision Transformer for frozen VFM feature extraction.

Covers the reference's backbone contract (src/backbone/vit_wrapper.py:139-180):
``(B, H, W, 3) normalized image -> (B, H/ps, W/ps, C)`` patch-token feature
map from the last block, layer-normed (timm `forward_intermediates(n=1,
norm=True, output_fmt="NCHW")` semantics, NHWC here).

Architecture knobs cover the DINO / DINOv2(+registers) / MAE / CLIP-style
families: conv patchify, cls + register tokens, learned position embeddings
with bicubic interpolation for dynamic image sizes, pre-norm blocks with
optional LayerScale, GELU MLP. (DINOv3's RoPE variant: see naf_tpu.nn.rope,
planned.)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["ViT", "ViTConfig"]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 14
    # "highest" keeps float32 extraction faithful to the torch reference;
    # bf16 inputs use the native MXU path either way.
    precision: str = "highest"
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    num_reg_tokens: int = 0
    layerscale: bool = True  # DINOv2: yes; DINO/MAE: no
    ln_eps: float = 1e-6
    pos_grid: int = 37  # position-embedding grid side at pretrain time
    use_cls_pos: bool = True  # cls token has its own position embedding
    # DINOv3 family: rotary position embedding on q/k patch tokens per block
    # (no learned position embeddings). None disables.
    rope_theta: Optional[float] = None
    # "rotate_half" (DINOv3: halves paired, [-x2, x1]) or "interleaved"
    # (PE-Core/PE-Spatial: adjacent pairs as complex numbers, integer patch
    # coordinates, x-angles in the first d/4 pairs, y-angles in the second —
    # Meta perception_models core/vision_encoder/rope.py Rope2D semantics).
    rope_style: str = "rotate_half"
    # None = auto (learned positions iff no rope). PE uses BOTH a learned
    # absolute position table and per-block Rope2D, so it sets True.
    use_abs_pos: Optional[bool] = None
    ln_pre: bool = False  # CLIP/PE: LayerNorm before the first block
    patch_bias: bool = True  # CLIP/PE patchify conv has no bias


def _prec(name):
    return dict(
        highest=jax.lax.Precision.HIGHEST, default=jax.lax.Precision.DEFAULT
    )[name]


def _rope_tables(coords, d_head, theta):
    """DINOv3 rotary tables: coords (T, 2) in [-1, 1] -> (T, d_head) sin/cos
    (HF modeling_dinov3_vit.get_patches_center_coordinates semantics; the
    same axial-RoPE math as naf_tpu.nn.rope)."""
    import math as _math

    n = d_head // 4
    inv_freq = 1.0 / (theta ** (2 * np.arange(n, dtype=np.float32) / (d_head // 2)))
    angles = 2 * _math.pi * coords[:, :, None] * inv_freq[None, None, :]
    angles = angles.reshape(coords.shape[0], d_head // 2)
    angles = jnp.tile(angles, (1, 2))
    return jnp.sin(angles), jnp.cos(angles)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _rope_tables_pe(gh, gw, d_head, theta):
    """PE Rope2D tables (perception_models core/vision_encoder/rope.py):
    integer patch coordinates, freqs 1/theta^(4k/d) for k < d/4, angle vector
    per token = [x*f_0..x*f_{d/4-1}, y*f_0..y*f_{d/4-1}] applied to adjacent
    (2p, 2p+1) pairs as complex rotations. Returns (T, d/2) sin/cos."""
    n = d_head // 4
    freqs = 1.0 / (theta ** (4 * np.arange(n, dtype=np.float32) / d_head))
    t = np.arange(gh * gw, dtype=np.float32)
    t_x, t_y = t % gw, np.floor(t / gw)
    angles = np.concatenate(
        [t_x[:, None] * freqs[None, :], t_y[:, None] * freqs[None, :]], axis=1
    )  # (T, d/2)
    return jnp.sin(angles), jnp.cos(angles)


def _apply_rope_interleaved(x, sin, cos):
    """x (..., d) with adjacent pairs (2p, 2p+1) rotated by angles[p]."""
    shape = x.shape
    xp = x.reshape(*shape[:-1], shape[-1] // 2, 2)
    even, odd = xp[..., 0], xp[..., 1]
    out = jnp.stack(
        [even * cos - odd * sin, even * sin + odd * cos], axis=-1
    )
    return out.reshape(shape)


class Attention(nn.Module):
    dim: int
    num_heads: int
    precision: str = "highest"
    rope_style: str = "rotate_half"

    @nn.compact
    def __call__(self, x, rope=None, n_prefix=0):
        b, t, c = x.shape
        d = self.dim // self.num_heads
        prec = _prec(self.precision)
        qkv = nn.DenseGeneral((3, self.num_heads, d), precision=prec, name="qkv")(x)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if rope is not None:  # rotate patch tokens only (prefix = identity)
            sin, cos = rope  # (T_patch, d) rotate_half / (T_patch, d/2) PE
            sin = sin[None, :, None, :].astype(x.dtype)
            cos = cos[None, :, None, :].astype(x.dtype)

            def rot(a):
                patch = a[:, n_prefix:]
                if self.rope_style == "interleaved":
                    patch = _apply_rope_interleaved(patch, sin, cos)
                else:
                    patch = patch * cos + _rotate_half(patch) * sin
                return jnp.concatenate([a[:, :n_prefix], patch], axis=1)

            q, k = rot(q), rot(k)
        q = q * (d ** -0.5)
        logits = jnp.einsum(
            "bqnd,bknd->bnqk", q, k,
            preferred_element_type=jnp.float32, precision=prec,
        )
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bnqk,bknd->bqnd", w, v, precision=prec)
        return nn.DenseGeneral(self.dim, axis=(-2, -1), precision=prec, name="proj")(out)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    layerscale: bool
    ln_eps: float
    precision: str = "highest"
    rope_style: str = "rotate_half"

    @nn.compact
    def __call__(self, x, rope=None, n_prefix=0):
        prec = _prec(self.precision)
        h = nn.LayerNorm(epsilon=self.ln_eps, name="norm1")(x)
        h = Attention(
            self.dim, self.num_heads, self.precision, self.rope_style,
            name="attn",
        )(h, rope=rope, n_prefix=n_prefix)
        if self.layerscale:
            h = h * self.param("ls1", nn.initializers.ones, (self.dim,))
        x = x + h
        h = nn.LayerNorm(epsilon=self.ln_eps, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), precision=prec, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, precision=prec, name="fc2")(h)
        if self.layerscale:
            h = h * self.param("ls2", nn.initializers.ones, (self.dim,))
        return x + h


class ViT(nn.Module):
    config: ViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) -> (B, H/ps, W/ps, C) last-block patch features."""
        cfg = self.config
        b, h, w, _ = x.shape
        ps = cfg.patch_size
        if h % ps or w % ps:
            raise ValueError(f"image size {(h, w)} not divisible by patch {ps}")
        gh, gw = h // ps, w // ps

        x = nn.Conv(
            cfg.embed_dim, (ps, ps), strides=(ps, ps), padding="VALID",
            use_bias=cfg.patch_bias,
            precision=_prec(cfg.precision), name="patch_embed",
        )(x)
        x = x.reshape(b, gh * gw, cfg.embed_dim)

        use_abs_pos = (
            cfg.use_abs_pos if cfg.use_abs_pos is not None
            else cfg.rope_theta is None
        )
        cls_pos = None
        if use_abs_pos:
            pos = self.param(
                "pos_embed",
                nn.initializers.normal(0.02),
                (1, (1 if cfg.use_cls_pos else 0) + cfg.pos_grid ** 2, cfg.embed_dim),
            )
            cls_pos = pos[:, :1] if cfg.use_cls_pos else None
            patch_pos = pos[:, 1:] if cfg.use_cls_pos else pos
            if (gh, gw) != (cfg.pos_grid, cfg.pos_grid):
                grid = patch_pos.reshape(1, cfg.pos_grid, cfg.pos_grid, cfg.embed_dim)
                grid = jax.image.resize(
                    grid.astype(jnp.float32), (1, gh, gw, cfg.embed_dim), "bicubic"
                ).astype(patch_pos.dtype)
                patch_pos = grid.reshape(1, gh * gw, cfg.embed_dim)
            x = x + patch_pos

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.embed_dim))
        cls = jnp.broadcast_to(cls, (b, 1, cfg.embed_dim))
        if cls_pos is not None:
            cls = cls + cls_pos
        tokens = [cls, x]
        if cfg.num_reg_tokens:
            reg = self.param(
                "reg_tokens", nn.initializers.zeros,
                (1, cfg.num_reg_tokens, cfg.embed_dim),
            )
            tokens = [cls, jnp.broadcast_to(reg, (b, cfg.num_reg_tokens, cfg.embed_dim)), x]
        x = jnp.concatenate(tokens, axis=1)

        n_prefix = 1 + cfg.num_reg_tokens
        rope = None
        if cfg.rope_theta is not None:
            if cfg.rope_style == "interleaved":  # PE Rope2D
                rope = _rope_tables_pe(
                    gh, gw, cfg.embed_dim // cfg.num_heads, cfg.rope_theta
                )
            else:
                ch = (np.arange(gh, dtype=np.float32) + 0.5) / gh
                cw = (np.arange(gw, dtype=np.float32) + 0.5) / gw
                coords = np.stack(np.meshgrid(ch, cw, indexing="ij"), -1).reshape(-1, 2)
                coords = 2.0 * coords - 1.0
                rope = _rope_tables(coords, cfg.embed_dim // cfg.num_heads,
                                    cfg.rope_theta)

        if cfg.ln_pre:
            x = nn.LayerNorm(epsilon=cfg.ln_eps, name="norm_pre")(x)

        for i in range(cfg.depth):
            x = Block(
                cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio,
                cfg.layerscale, cfg.ln_eps, cfg.precision, cfg.rope_style,
                name=f"block{i}",
            )(x, rope=rope, n_prefix=n_prefix)

        x = nn.LayerNorm(epsilon=cfg.ln_eps, name="norm")(x)
        return x[:, n_prefix:].reshape(b, gh, gw, cfg.embed_dim)
