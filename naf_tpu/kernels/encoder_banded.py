"""Row-banded encoder stack with two-pass GroupNorm — bounded peak memory.

The NAF image encoder (reference src/model/naf.py:26-51) runs at the guarded
input resolution; at 4096^2 one stack's activations are 4.3 GB each (bf16,
128 ch) and the full-resolution chain cannot coexist with a 12.9 GB output
buffer. GroupNorm statistics are global per image, so naive banding would
change every value. This module makes band_rows bound the TRUE peak of the
encoder by splitting each stack into

  1. a stats phase: for each layer depth d, a banded sweep recomputes the
     chain from the image up to conv_d (using the already-finalized stats of
     shallower layers) and accumulates conv_d's channel sums over each
     band's assigned rows. Activations are never stored across bands, so the
     working set is one band (+ halo) regardless of image size. The price is
     recompute: sum_d (d+1) = (L+1)(L+2)/2 banded layer passes for an
     L-layer stack instead of L+1 (L = 2*num_layers; ~3x FLOPs for NAF's
     L = 4). FLOPs are cheap at this scale; residency is not.
  2. an output phase: `encoder_stack_banded_rows` produces any row range of
     the final output from the image + the precomputed stats, so a consumer
     (the banded fused attention, naf_tpu/kernels/na2d_fused_q.py) can
     stream encoder bands without the full encoder output ever existing.

Halo rule: producing depth-d rows [r0, r1) needs image rows
[r0 - H, r1 + H), H = k_stem//2 + d*(k_res//2). Interior band edges carry an
H-row halo recomputed from the image; the chain's reflect padding is only
trusted where a band edge IS the image edge, and each conv invalidates p
halo rows per interior side (tracked explicitly, never read).

Numerics are identical to encoder_stack_fused / naf_tpu.nn.Encoder: same
stats (biased variance over the full image), same fused layer kernels on
TPU, same reflect-pad convs. Parity: tests/test_encoder_banded.py.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from naf_tpu.kernels.encoder_fused import (
    _channel_sums,
    _gn_affine,
    _reflect_conv_xla,
    _stem_conv_matmul,
    fused_encoder_applicable,
    gn_silu_conv_fused,
)

__all__ = [
    "encoder_stack_stats",
    "encoder_stack_banded_rows",
    "encoder_stack_banded",
]


def _layer_params(params, num_layers):
    """[(kernel, bias, gamma, beta), ...] for the L = 2*num_layers GN->SiLU->
    conv layers, in execution order (same tree as naf_tpu.nn.Encoder)."""
    out = []
    for i in range(num_layers):
        blk = params[f"block{i}"]
        for norm_name, conv_name in (("norm1", "conv1"), ("norm2", "conv2")):
            out.append(
                (
                    blk[conv_name]["conv"]["kernel"],
                    blk[conv_name]["conv"]["bias"],
                    blk[norm_name]["scale"],
                    blk[norm_name]["bias"],
                )
            )
    return out


def _apply_layer(y, scale, shift, kernel, bias, kk, interpret):
    """One GN(folded)->SiLU->conv layer; fused Pallas when the band shape
    supports it, pure-XLA twin otherwise (identical numerics)."""
    hidden = kernel.shape[-1]
    if (
        y.dtype == jnp.bfloat16
        and (jax.default_backend() == "tpu" or interpret)
        and fused_encoder_applicable(y.shape, kk, hidden)
    ):
        out, _ = gn_silu_conv_fused(
            y, scale, shift, kernel, bias, kernel_size=kk, interpret=interpret
        )
        return out
    z = y.astype(jnp.float32) * scale[:, None, None] + shift[:, None, None]
    z = (z * jax.nn.sigmoid(z)).astype(y.dtype)
    return _reflect_conv_xla(z, kernel, bias, kk)


def _band_chain(
    params, layers, x, r0, r1, depth, stats, kernel_size, ks_res, interpret
):
    """Rows [r0, r1) of conv_depth's output (depth 0 = stem), computed from
    the image with an interior halo. `stats` holds (scale, shift) for the
    `depth` GN layers the chain passes through."""
    h = x.shape[1]
    p_s, p_r = kernel_size // 2, ks_res // 2
    halo = p_s + depth * p_r
    a = max(0, r0 - halo)
    b = min(h, r1 + halo)
    band = x[:, a:b]
    # the chain's own reflect pad is the true image pad only at image edges;
    # interior halo rows degrade by p per conv and are sliced away at the end
    y = _stem_conv_matmul(
        band,
        params["stem"]["conv"]["kernel"],
        params["stem"]["conv"]["bias"],
        kernel_size,
    )
    for d in range(depth):
        kernel, bias, _, _ = layers[d]
        scale, shift = stats[d]
        y = _apply_layer(y, scale, shift, kernel, bias, ks_res, interpret)
    return y[:, r0 - a : r1 - a]


def encoder_stack_stats(
    params,
    x,
    kernel_size: int = 3,
    ks_res: int = 3,
    num_layers: int = 2,
    num_groups: int = 8,
    eps: float = 1e-5,
    band_rows: int = 512,
    interpret: bool = False,
):
    """Per-layer folded GroupNorm (scale, shift) pairs, computed in row bands
    so peak memory is O(band_rows * W) activations. Returns a list of L
    (B, C) f32 pairs, in layer order."""
    b, h, wd, _ = x.shape
    layers = _layer_params(params, num_layers)
    hw = h * wd
    stats = []
    for depth in range(len(layers)):
        psums = None
        for r0 in range(0, h, band_rows):
            r1 = min(h, r0 + band_rows)
            y = _band_chain(
                params, layers, x, r0, r1, depth, stats, kernel_size,
                ks_res, interpret,
            )
            ps = _channel_sums(y)
            psums = ps if psums is None else psums + ps
        _, _, gamma, beta = layers[depth]
        stats.append(_gn_affine(psums, gamma, beta, hw, num_groups, eps))
    return stats


def encoder_stack_banded_rows(
    params,
    x,
    row0: int,
    nrows: int,
    stats,
    kernel_size: int = 3,
    ks_res: int = 3,
    num_layers: int = 2,
    interpret: bool = False,
):
    """Rows [row0, row0 + nrows) of the stack's final output, from the image
    and precomputed `stats` (encoder_stack_stats). The streaming consumer
    entry point: no full-resolution activation is ever materialized."""
    layers = _layer_params(params, num_layers)
    return _band_chain(
        params, layers, x, row0, row0 + nrows, len(layers), stats,
        kernel_size, ks_res, interpret,
    )


def encoder_stack_banded(
    params,
    x,
    hidden: int,
    kernel_size: int = 3,
    ks_res: int = 3,
    num_layers: int = 2,
    num_groups: int = 8,
    eps: float = 1e-5,
    band_rows: int = 512,
    interpret: bool = False,
):
    """Full stack output via the banded two-pass pipeline — numerically
    identical to encoder_stack_fused(params, x, ...) but with intermediate
    activations bounded to O(band_rows * W). (The assembled output itself is
    O(H * W); stream encoder_stack_banded_rows to avoid even that.)"""
    h = x.shape[1]
    stats = encoder_stack_stats(
        params, x, kernel_size, ks_res, num_layers, num_groups, eps,
        band_rows, interpret,
    )
    bands = [
        encoder_stack_banded_rows(
            params, x, r0, min(h, r0 + band_rows) - r0, stats,
            kernel_size, ks_res, num_layers, interpret,
        )
        for r0 in range(0, h, band_rows)
    ]
    return jnp.concatenate(bands, axis=1)
