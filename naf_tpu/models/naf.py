"""NAF: zero-shot feature upsampling via cross-scale neighborhood attention.

TPU-native re-design of the reference model (src/model/naf.py:11-116), NHWC:

  image (B, H_img, W_img, 3) --ImageEncoder--> x (B, H_o, W_o, dim) w/ RoPE
  queries = x                                  (QueryEncoder, naf.py:55-60)
  keys    = adaptive_avg_pool(x -> (h, w))     (KeyEncoder, naf.py:63-69)
  values  = lr_feats (B, h, w, C)
  out     = CrossScaleAttention(q, k, v)       (B, H_o, W_o, C)

The image encoder concatenates a 1x1-kernel "pixel" stack and a 3x3-kernel
"semantic" stack (dim/2 channels each), adaptive-avg-pools to the output
size, guards >4x-output inputs by bilinear downscale, then applies RoPE
(naf.py:26-51).

Banded (streamed) execution: `band_rows=R` runs the ATTENTION in row bands
with global window indexing — exact, inference-only — which bounds the
attention stage's working set (its padded/intermediate tensors) to O(R * W).
The encoder output and the final features remain O(H * W): GroupNorm
statistics are global per image, so the encoder runs at full resolution
(see `_banded`). With the flat-layout NA kernel the unbanded path usually
fits (and is faster) at 2048^2; banding is for the sizes beyond that where
the attention stage would otherwise not fit residency.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from naf_tpu.kernels.encoder_fused import fused_encoder_applicable
from naf_tpu.nn.attention import CrossScaleAttention
from naf_tpu.nn.conv import Encoder
from naf_tpu.nn.rope import RoPE
from naf_tpu.ops.pool import adaptive_avg_pool2d
from naf_tpu.ops.resize import resize_bilinear

__all__ = ["NAF", "ImageEncoder"]


class ImageEncoder(nn.Module):
    out_channels: int = 256
    heads_rope: int = 4
    use_encoder: bool = True
    rope_base: Optional[float] = 100.0
    rope_rescale: Optional[float] = None
    img_layers: int = 2

    def setup(self):
        if self.use_encoder:
            self.encoder = Encoder(
                self.out_channels // 2, kernel_size=1, ks_res=1,
                num_layers=self.img_layers, name="encoder",
            )
            self.sem_encoder = Encoder(
                self.out_channels // 2, kernel_size=3, ks_res=3,
                num_layers=self.img_layers, name="sem_encoder",
            )
        self.rope = RoPE(
            embed_dim=self.out_channels,
            num_heads=self.heads_rope,
            base=self.rope_base,
            rescale_coords=self.rope_rescale,
            name="rope",
        )

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """Dual conv stacks only (no pooling / RoPE).

        bf16 inference on TPU routes through the fused Pallas encoder
        (naf_tpu.kernels.encoder_fused) — same parameters, same math, one
        pass per GN->SiLU->conv layer instead of XLA's conv lowering."""
        if not self.use_encoder:
            return x
        hidden = self.out_channels // 2
        if (
            not self.is_initializing()
            and x.dtype == jnp.bfloat16
            and jax.default_backend() == "tpu"
            and x.shape[1] * x.shape[2] >= 448 * 448
            and fused_encoder_applicable(x.shape, 1, hidden)
            and fused_encoder_applicable(x.shape, 3, hidden)
        ):
            from naf_tpu.kernels.encoder_fused import encoder_stack_fused_packed

            return encoder_stack_fused_packed(
                self.encoder.variables["params"],
                self.sem_encoder.variables["params"],
                x, hidden, self.img_layers,
            )
        return jnp.concatenate([self.encoder(x), self.sem_encoder(x)], axis=-1)

    def encode_guarded(
        self, x: jnp.ndarray, output_size: Tuple[int, int]
    ) -> jnp.ndarray:
        """Input guard + dual conv stacks, WITHOUT pooling or RoPE (those are
        fused downstream by the fused-q inference path). When the fused
        kernels apply, the two stacks write one PACKED output buffer
        (kernels.encoder_fused.encoder_stack_fused_packed, differentiable
        via its concat-twin VJP) — no pix|sem concat pass."""
        from naf_tpu.kernels.encoder_fused import encoder_stack_fused_packed

        oh, ow = int(output_size[0]), int(output_size[1])
        h, w = x.shape[1], x.shape[2]
        if (h, w) != self.guard_size(h, w, oh, ow):
            x = resize_bilinear(x, self.guard_size(h, w, oh, ow))
        hidden = self.out_channels // 2
        if (
            self.use_encoder
            and not self.is_initializing()
            and x.dtype == jnp.bfloat16
            and jax.default_backend() == "tpu"
            and x.shape[1] * x.shape[2] >= 448 * 448
            and fused_encoder_applicable(x.shape, 1, hidden)
            and fused_encoder_applicable(x.shape, 3, hidden)
        ):
            return encoder_stack_fused_packed(
                self.encoder.variables["params"],
                self.sem_encoder.variables["params"],
                x, hidden, self.img_layers,
            )
        return self.encode(x)

    @staticmethod
    def guard_size(h: int, w: int, oh: int, ow: int) -> Tuple[int, int]:
        """Post-guard input size: >4x-output inputs are bilinear-downscaled
        (reference naf.py:39-48, including its odd min(h, 4oh, 4ow) form)."""
        if h > 4 * oh or w > 4 * ow:
            return (min(h, 4 * oh, 4 * ow), min(w, 4 * ow, 4 * oh))
        return (h, w)

    def __call__(
        self,
        x: jnp.ndarray,
        output_size: Tuple[int, int],
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        oh, ow = int(output_size[0]), int(output_size[1])
        h, w = x.shape[1], x.shape[2]
        # Input guard: bilinear downscale very large inputs (naf.py:39-48).
        if (h, w) != self.guard_size(h, w, oh, ow):
            x = resize_bilinear(x, self.guard_size(h, w, oh, ow))
        x = self.encode(x)
        x = adaptive_avg_pool2d(x, (oh, ow))
        return self.rope(x, train=train, rng=rng)


class NAF(nn.Module):
    """Flagship upsampler. ``__call__(image, features, output_size)``.

    Args (reference defaults, src/model/naf.py:73-84 / config/model/naf.yaml):
      dim: encoder/attention embedding width.
      heads_attn / heads_rope: attention / rope head counts.
      kernel_size: neighborhood window size (odd).
      rope_rescale: train-time log-uniform coordinate rescale bound.
      na_impl: attention implementation ("auto" | "pallas" | "xla" |
        "fused_q"). "auto" prefers, in order: the fully-fused inference
        path (pool-up + RoPE + NA in one Pallas kernel,
        kernels/na2d_fused_q.py), the fused NA kernel (kernels/
        na2d_fused.py), then the XLA oracle. "fused_q" forces the first
        (interpret-mode off-TPU; used by parity tests).
    """

    dim: int = 256
    heads_attn: int = 4
    heads_rope: int = 4
    kernel_size: int = 9
    use_encoder: bool = True
    rope_base: Optional[float] = 100.0
    rope_rescale: Optional[float] = 2.0
    img_layers: int = 2
    na_impl: str = "auto"

    def setup(self):
        self.image_encoder = ImageEncoder(
            out_channels=self.dim,
            heads_rope=self.heads_rope,
            use_encoder=self.use_encoder,
            rope_base=self.rope_base,
            rope_rescale=self.rope_rescale,
            img_layers=self.img_layers,
            name="image_encoder",
        )
        self.upsampler = CrossScaleAttention(
            dim=self.dim,
            num_heads=self.heads_attn,
            kernel_size=self.kernel_size,
            impl=self.na_impl,
            name="upsampler",
        )

    def __call__(
        self,
        image: jnp.ndarray,
        features: jnp.ndarray,
        output_size: Tuple[int, int],
        return_weights: bool = False,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        band_rows: Optional[int] = None,
    ):
        # band_rows is an inference-only memory knob: training grids are
        # small (the distillation objective predicts at feature resolution,
        # reference train.py:123-127) and the banded fused kernel has no
        # backward, so it is deliberately ignored when train=True.
        if band_rows is not None and not return_weights and not train:
            return self._banded(image, features, output_size, band_rows)

        if not train and not return_weights and self._fused_q_ok(
            image, features, output_size
        ):
            return self._fused_q(image, features, output_size)

        x = self.image_encoder(image, output_size, train=train, rng=rng)
        queries = x  # QueryEncoder is the identity (naf.py:55-60)
        keys = adaptive_avg_pool2d(x, features.shape[1:3])  # KeyEncoder
        return self.upsampler(queries, keys, features, return_weights=return_weights)

    def _fused_q_ok(self, image, features, output_size) -> bool:
        """Whether the fully-fused inference path applies: pool-up + RoPE +
        NA in one Pallas kernel (naf_tpu/kernels/na2d_fused_q.py) plus the
        separable keys collapse (RoPE.pooled) — neither the pooled-up grid
        nor the queries ever touch HBM."""
        from naf_tpu.kernels.na2d_fused_q import fused_q_applicable

        if self.is_initializing():
            return False
        force = self.na_impl == "fused_q"  # test hook (interpret off-TPU)
        if not force and jax.default_backend() != "tpu":
            return False
        if not force and self.na_impl not in ("auto", "pallas"):
            return False
        oh, ow = int(output_size[0]), int(output_size[1])
        hi, wi = ImageEncoder.guard_size(
            image.shape[1], image.shape[2], oh, ow
        )
        hk, wk = features.shape[1], features.shape[2]
        if features.shape[-1] % self.heads_attn:
            return False
        return fused_q_applicable(
            oh, ow, hi, wi, hk, wk, self.kernel_size,
            n=self.heads_attn, d=self.dim // self.heads_attn,
            dv=features.shape[-1] // self.heads_attn,
            itemsize=image.dtype.itemsize,
        )

    def _fused_q(self, image, features, output_size):
        from naf_tpu.kernels.na2d_fused_q import naf_upsample_attention

        oh, ow = int(output_size[0]), int(output_size[1])
        hk, wk = features.shape[1], features.shape[2]
        enc = self.image_encoder.encode_guarded(image, output_size)
        rope = self.image_encoder.rope
        keys = rope.pooled(enc, (oh, ow), (hk, wk))
        sin_r, cos_r, sin_c, cos_c = rope.tables(oh, ow)
        rows_tab = jnp.concatenate([cos_r, sin_r], axis=-1)
        cols_tab = jnp.concatenate([cos_c, sin_c], axis=-1)
        return naf_upsample_attention(
            enc, keys, features, rows_tab, cols_tab, rope.d_head,
            num_heads=self.heads_attn, kernel_size=self.kernel_size,
            interpret=jax.default_backend() != "tpu",
        )

    def _banded(self, image, features, output_size, band_rows):
        """Row-banded attention (exact; inference only).

        The encoder runs at full resolution (GroupNorm statistics are global
        per image, so banding it would change every value); the attention —
        whose head-split/head-major temporaries are the peak-memory driver at
        2K+ outputs — runs per row band with global window indexing.
        """
        oh, ow = int(output_size[0]), int(output_size[1])
        hk, wk = features.shape[1], features.shape[2]
        if oh % hk or oh % band_rows or band_rows % (oh // hk):
            raise ValueError(
                "band_rows must divide output height and be a multiple of the "
                "cell stride (output_height // lr_height)"
            )
        cells_per_band = band_rows // (oh // hk)
        if self._fused_q_ok(image, features, output_size):
            from naf_tpu.kernels.na2d_fused_q import pick_geometry

            geom = pick_geometry(
                oh, ow, *ImageEncoder.guard_size(
                    image.shape[1], image.shape[2], oh, ow
                ), hk, wk, self.kernel_size, self.heads_attn,
                self.dim // self.heads_attn,
                features.shape[-1] // self.heads_attn,
                image.dtype.itemsize,
            )
            if geom and cells_per_band % geom[0] == 0:
                return self._fused_q_banded(
                    image, features, output_size, cells_per_band
                )

        x = self.image_encoder(image, output_size)
        keys = adaptive_avg_pool2d(x, (hk, wk))
        outs = [
            self.upsampler(
                x[:, i0 : i0 + band_rows], keys, features,
                row_cell0=(i0 // band_rows) * cells_per_band, full_hq=oh,
            )
            for i0 in range(0, oh, band_rows)
        ]
        return jnp.concatenate(outs, axis=1)

    def _fused_q_banded(self, image, features, output_size, cells_per_band):
        """Banded fully-fused path: each band re-runs the kernel over a
        cell-row range with its own (small) K/V tile footprint. The encoder
        output, keys, and RoPE tables are computed once and shared."""
        from naf_tpu.kernels.na2d_fused_q import naf_upsample_attention

        oh, ow = int(output_size[0]), int(output_size[1])
        hk, wk = features.shape[1], features.shape[2]
        enc = self.image_encoder.encode_guarded(image, output_size)
        rope = self.image_encoder.rope
        keys = rope.pooled(enc, (oh, ow), (hk, wk))
        sin_r, cos_r, sin_c, cos_c = rope.tables(oh, ow)
        rows_tab = jnp.concatenate([cos_r, sin_r], axis=-1)
        cols_tab = jnp.concatenate([cos_c, sin_c], axis=-1)
        # Each band ALIASES the result buffer into the kernel and writes its
        # rows in place: peak memory is the output plus one band's K/V tiles
        # (a concat — or even a separate band slab — pushes 4096^2 past HBM).
        out = jnp.zeros(
            (image.shape[0], oh, ow, features.shape[-1]), enc.dtype
        )
        for c0 in range(0, hk, cells_per_band):
            # barrier: each band's K/V tile gather must not be hoisted ahead
            # of the previous band (all bands' tiles live at once re-OOMs
            # what banding exists to bound)
            out, feats_b, keys_b = jax.lax.optimization_barrier(
                (out, features, keys)
            )
            out = naf_upsample_attention(
                enc, keys_b, feats_b, rows_tab, cols_tab, rope.d_head,
                num_heads=self.heads_attn, kernel_size=self.kernel_size,
                interpret=jax.default_backend() != "tpu",
                row_cell0=c0, band_cells=cells_per_band, out_acc=out,
            )
        return out
