"""Public zero-shot upsampling API (reference hub path, hubconf.py:8-24).

The reference exposes `naf = torch.hub.load("valeoai/NAF", "naf")` then
`naf(image, lr_feats, target_size)` with NCHW tensors. Equivalents here:

    model, params = load_naf_params()                  # random init
    model, params = load_naf_params("naf_release.pth") # converted weights
    hr = naf(model, params, image, lr_feats, (H, W))   # NCHW in/out

or the stateful convenience wrapper:

    ups = NAFUpsampler(params_or_path)
    hr = ups(image, lr_feats, (H, W))

Arrays may be numpy or jax; NCHW is accepted for reference-interface parity
(`channels_last=True` skips the transposes and is the TPU-native layout).
Calls are jit-compiled and cached per (shapes, target_size).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from naf_tpu.convert import naf_params_from_torch
from naf_tpu.models.naf import NAF

__all__ = ["naf", "load_naf_params", "NAFUpsampler", "naf_streamed"]


def load_naf_params(
    checkpoint: Optional[str] = None,
    seed: int = 0,
    **model_kwargs,
):
    """Build a NAF model definition and parameters.

    Args:
      checkpoint: optional path to a reference-format torch state dict
        (e.g. the released naf_release.pth); converted to a flax pytree.
      model_kwargs: NAF hyperparameters (dim, heads_attn, kernel_size, ...).

    Returns:
      (model, params)
    """
    model = NAF(**model_kwargs)
    if checkpoint is not None:
        params = naf_params_from_torch(
            checkpoint, img_layers=model.img_layers, rope_base=model.rope_base,
        )
        params = jax.tree.map(jnp.asarray, params)
    else:
        rng = jax.random.PRNGKey(seed)
        dummy_img = jnp.zeros((1, 32, 32, 3), jnp.float32)
        dummy_feat = jnp.zeros((1, 16, 16, model.heads_attn * 8), jnp.float32)
        params = model.init(rng, dummy_img, dummy_feat, (32, 32))["params"]
    return model, params


@functools.partial(
    jax.jit, static_argnames=("model", "target_size", "channels_last")
)
def _naf_apply(model, params, image, lr_feats, target_size, channels_last):
    if not channels_last:
        image = jnp.transpose(image, (0, 2, 3, 1))
        lr_feats = jnp.transpose(lr_feats, (0, 2, 3, 1))
    out = model.apply({"params": params}, image, lr_feats, target_size)
    if not channels_last:
        out = jnp.transpose(out, (0, 3, 1, 2))
    return out


def naf(
    model: NAF,
    params,
    image,
    lr_feats,
    target_size: Tuple[int, int],
    channels_last: bool = False,
):
    """Upsample `lr_feats` to `target_size`, guided by `image`.

    Mirrors the reference forward contract (src/model/naf.py:104-116):
    image (B, 3, H_img, W_img), lr_feats (B, C, h, w) -> (B, C, *target_size)
    (NHWC when channels_last=True).
    """
    return _naf_apply(
        model,
        params,
        jnp.asarray(image),
        jnp.asarray(lr_feats),
        (int(target_size[0]), int(target_size[1])),
        channels_last,
    )


class NAFUpsampler:
    """Stateful convenience wrapper mirroring the hub module's usage."""

    def __init__(self, params=None, checkpoint=None, **model_kwargs):
        if params is not None:
            self.model = NAF(**model_kwargs)
            self.params = params
        else:
            self.model, self.params = load_naf_params(checkpoint, **model_kwargs)

    def __call__(self, image, lr_feats, target_size, channels_last=False):
        return naf(
            self.model, self.params, image, lr_feats, target_size, channels_last
        )


def naf_streamed(
    model,
    params,
    image,
    lr_feats,
    target_size: Tuple[int, int],
    band_rows: int,
    interpret: bool = False,
    stream_encoder: Optional[bool] = None,
):
    """Streamed huge-output upsampling (4096^2+): one donated jit per band.

    A single-jit banded forward cannot avoid duplicating the output at the
    jit boundary (XLA copies the in-place-assembled result into the program
    output buffer: 2 x 12.9 GB at 4096^2 bf16, which exceeds HBM). Here the
    output buffer lives across jit calls and is DONATED to each band call,
    which aliases it straight into the fused kernel
    (naf_tpu.kernels.na2d_fused_q out_acc): peak memory is the output plus
    one band's K/V tiles. Channels-last (NHWC) only; inference only.

    When the guarded guide image is itself large (>= ~2K^2; enc would not
    coexist with the output), `stream_encoder` kicks in: the encoder runs
    via the banded two-pass-GroupNorm pipeline
    (naf_tpu.kernels.encoder_banded) — one sweep accumulates the pooled
    keys band by band (RoPE.pooled is row-linear), then each attention band
    recomputes only its own encoder rows. The full-resolution encoder
    output never exists. Auto-enabled when enc would exceed ~1.5 GB.

    The reference's maximum feature size is 2048^2 (README.md:98).
    """
    from naf_tpu.kernels.na2d_fused_q import (
        naf_upsample_attention,
        pick_geometry,
    )
    from naf_tpu.models.naf import ImageEncoder

    oh, ow = int(target_size[0]), int(target_size[1])
    image = jnp.asarray(image)
    lr_feats = jnp.asarray(lr_feats)
    hk, wk = lr_feats.shape[1], lr_feats.shape[2]
    if oh % hk or oh % band_rows or band_rows % (oh // hk):
        raise ValueError(
            "band_rows must divide output height and be a multiple of the "
            "cell stride (output_height // lr_height)"
        )
    cells_per_band = band_rows // (oh // hk)
    hi, wi = ImageEncoder.guard_size(image.shape[1], image.shape[2], oh, ow)
    geom = pick_geometry(
        oh, ow, hi, wi, hk, wk, model.kernel_size, model.heads_attn,
        model.dim // model.heads_attn,
        lr_feats.shape[-1] // model.heads_attn, image.dtype.itemsize,
    )
    if geom is None or cells_per_band % geom[0]:
        raise ValueError(
            f"no fused-q tile geometry for image {hi}x{wi} -> {oh}x{ow} "
            f"(geometry {geom}, band of {cells_per_band} cell rows). The "
            "kernel needs integer input rows per tile: pick an image size "
            "with hi*r_h % oh == 0 (e.g. a 512^2 image for 4096^2 output) "
            "and band_rows a multiple of geometry[0] * (oh // lr_h)."
        )
    d_head = model.dim // model.heads_rope
    if stream_encoder is None:
        enc_bytes = hi * wi * model.dim * image.dtype.itemsize
        stream_encoder = enc_bytes > 1.5 * 2**30
    if stream_encoder:
        return _naf_streamed_banded_encoder(
            model, params, image, lr_feats, oh, ow, hi, wi,
            cells_per_band, interpret,
        )

    @jax.jit
    def prep(params, image):
        b = model.bind({"params": params})
        enc = b.image_encoder.encode_guarded(image, (oh, ow))
        keys = b.image_encoder.rope.pooled(enc, (oh, ow), (hk, wk))
        sin_r, cos_r, sin_c, cos_c = b.image_encoder.rope.tables(oh, ow)
        rows_tab = jnp.concatenate([cos_r, sin_r], axis=-1)
        cols_tab = jnp.concatenate([cos_c, sin_c], axis=-1)
        return enc, keys, rows_tab, cols_tab

    enc, keys, rows_tab, cols_tab = prep(params, image)

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(5,))
    def band(out, enc, keys, feats, tabs, c0):
        rows_tab, cols_tab = tabs
        return naf_upsample_attention(
            enc, keys, feats, rows_tab, cols_tab, d_head,
            num_heads=model.heads_attn, kernel_size=model.kernel_size,
            row_cell0=c0, band_cells=cells_per_band, out_acc=out,
            interpret=interpret,
        )

    out = jnp.zeros(
        (image.shape[0], oh, ow, lr_feats.shape[-1]), enc.dtype
    )
    for c0 in range(0, hk, cells_per_band):
        out = band(out, enc, keys, lr_feats, (rows_tab, cols_tab), c0)
    return out


def _naf_streamed_banded_encoder(
    model, params, image, lr_feats, oh, ow, hi, wi, cells_per_band, interpret
):
    """Fully-streamed path: banded two-pass encoder + banded fused
    attention. See naf_streamed. The encoder's final chain runs twice (once
    for the pooled-keys accumulation, once feeding each attention band);
    FLOPs are cheap at this scale, residency is not."""
    from naf_tpu.kernels.encoder_banded import (
        encoder_stack_banded_rows,
        encoder_stack_stats,
    )
    from naf_tpu.kernels.na2d_fused_q import naf_upsample_attention
    from naf_tpu.ops.resize import resize_bilinear

    hk, wk = lr_feats.shape[1], lr_feats.shape[2]
    r_h = oh // hk
    d_head = model.dim // model.heads_rope
    if (cells_per_band * r_h * hi) % oh:
        raise ValueError(
            "attention band does not map to integer encoder rows; adjust "
            "band_rows or the image size"
        )
    eb = cells_per_band * r_h * hi // oh  # encoder rows per band
    if image.shape[1:3] != (hi, wi):
        image = resize_bilinear(image, (hi, wi))

    enc_p = params["image_encoder"]["encoder"]
    sem_p = params["image_encoder"]["sem_encoder"]

    @jax.jit
    def prep_stats(params, image):
        s_pix = encoder_stack_stats(
            enc_p, image, 1, 1, model.img_layers, band_rows=eb,
            interpret=interpret,
        )
        s_sem = encoder_stack_stats(
            sem_p, image, 3, 3, model.img_layers, band_rows=eb,
            interpret=interpret,
        )
        b = model.bind({"params": params})
        sin_r, cos_r, sin_c, cos_c = b.image_encoder.rope.tables(oh, ow)
        rows_tab = jnp.concatenate([cos_r, sin_r], axis=-1)
        cols_tab = jnp.concatenate([cos_c, sin_c], axis=-1)
        return s_pix, s_sem, rows_tab, cols_tab

    s_pix, s_sem, rows_tab, cols_tab = prep_stats(params, image)

    def enc_band(params, image, stats, r0):
        s_pix, s_sem = stats
        pix = encoder_stack_banded_rows(
            enc_p, image, r0, eb, s_pix, 1, 1, model.img_layers,
            interpret=interpret,
        )
        sem = encoder_stack_banded_rows(
            sem_p, image, r0, eb, s_sem, 3, 3, model.img_layers,
            interpret=interpret,
        )
        return jnp.concatenate([pix, sem], axis=-1)

    # sweep 1: accumulate the pooled keys (row-linear, exact)
    @functools.partial(jax.jit, static_argnums=(3,))
    def keys_contrib(params, image, stats, r0):
        band = enc_band(params, image, stats, r0)
        rope = model.bind({"params": params}).image_encoder.rope
        return rope.pooled(
            band, (oh, ow), (hk, wk), row0=r0, full_h=hi
        )

    keys = None
    for r0 in range(0, hi, eb):
        kb = keys_contrib(params, image, (s_pix, s_sem), r0)
        kb = kb.astype(jnp.float32)  # exact band sum, cast once at the end
        keys = kb if keys is None else keys + kb
    keys = keys.astype(image.dtype)

    # sweep 2: attention bands, each feeding only its own encoder rows
    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(7,))
    def band_step(out, params, image, stats, keys, feats, tabs, c0):
        rows_tab, cols_tab = tabs
        band = enc_band(params, image, stats, c0 * r_h * hi // oh)
        return naf_upsample_attention(
            band, keys, feats, rows_tab, cols_tab, d_head,
            num_heads=model.heads_attn, kernel_size=model.kernel_size,
            row_cell0=c0, band_cells=cells_per_band, out_acc=out,
            enc_banded=True, interpret=interpret,
        )

    out = jnp.zeros(
        (image.shape[0], oh, ow, lr_feats.shape[-1]), image.dtype
    )
    for c0 in range(0, hk, cells_per_band):
        out = band_step(
            out, params, image, (s_pix, s_sem), keys, lr_feats,
            (rows_tab, cols_tab), c0,
        )
    return out
