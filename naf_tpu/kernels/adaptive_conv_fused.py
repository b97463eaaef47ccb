"""Spatially-varying convolution — Pallas TPU kernel.

Replaces FeatUp's AdaptiveConv CUDA extension (reference
src/model/featup.py:6,87,126): out[b, y, x, :] = sum_{i,j} kernel[b, y, x,
i, j] * source_padded[b, y+i, x+j, :].

The XLA fallback (naf_tpu.ops.adaptive_conv) is k^2 shifted multiply-add
passes — ~3 full HBM passes per tap, tens of GB of traffic at 448^2 x 384.
Here each program loads one (bh+k-1, bw+k-1, C) halo tile of the padded
source and the (bh, bw, k^2) weights into VMEM once, then runs the k^2
multiply-adds entirely in registers: HBM traffic drops to one read of
source+weights and one write of the output.

Halo tiles use `pl.Element` block indexing with stride < extent (same
technique as naf_tpu/kernels/encoder_fused.py); the source is right-padded
so column blocks satisfy Mosaic's 8-divisibility rule on the second-to-last
block dimension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["adaptive_conv_fused", "adaptive_conv_fused_applicable"]


def _pick_tiles(h: int, w: int, c: int, kk: int, itemsize: int):
    halo = kk - 1
    pad_c = halo + (-halo) % 8
    best = None
    for bh in (16, 8, 4, 2, 1):
        if h % bh:
            continue
        for bw in (256, 128, 64, 32, 16, 8):
            if w % bw:
                continue
            src = (bh + halo) * (bw + pad_c) * c * itemsize
            out = bh * bw * c * itemsize
            wgt = bh * bw * 128 * 4  # k^2 lanes pad to 128
            use = 3 * src + 5 * out + 2 * wgt
            if use < 10 * 2**20 and (best is None or bh * bw > best[0]):
                best = (bh * bw, bh, bw)
    return (best[1], best[2]) if best else None


def adaptive_conv_fused_applicable(h, w, c, kk, itemsize=4) -> bool:
    if kk % 2 != 1 or kk * kk > 128 or c % 128:
        return False
    return _pick_tiles(h, w, c, kk, itemsize) is not None


def _kernel(src_ref, wgt_ref, out_ref, acc_ref, *, kk, bh, bw):
    for i in range(kk):
        rows = src_ref[0, i : i + bh]  # (bh, bw+halo+extra, C)
        acc = None
        for j in range(kk):
            win = rows[:, j : j + bw, :]
            wij = wgt_ref[0, :, :, i * kk + j]  # (bh, bw), static lane
            term = win.astype(jnp.float32) * wij[..., None]
            acc = term if acc is None else acc + term
        # scratch-ref sync per row tap bounds the number of live f32
        # accumulator chains (cf. encoder_fused kernel notes)
        if i == 0:
            acc_ref[...] = acc
        else:
            acc_ref[...] = acc_ref[...] + acc
    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def adaptive_conv_fused(source_padded, kernel, interpret: bool = False):
    """source_padded (B, H+k-1, W+k-1, C), kernel (B, H, W, k, k) ->
    (B, H, W, C). Requires `adaptive_conv_fused_applicable`."""
    b, hp, wp, c = source_padded.shape
    kk = kernel.shape[-1]
    h, w = hp - kk + 1, wp - kk + 1
    dtype = jnp.promote_types(source_padded.dtype, kernel.dtype)
    tiles = _pick_tiles(h, w, c, kk, dtype.itemsize)
    if tiles is None:
        raise ValueError(f"unsupported shapes: {source_padded.shape}, {kernel.shape}")
    bh, bw = tiles
    halo = kk - 1
    extra = (-halo) % 8  # right padding so column blocks are 8-divisible

    src = source_padded.astype(dtype)
    if extra:
        src = jnp.pad(src, ((0, 0), (0, 0), (0, extra), (0, 0)))
    wgt = kernel.reshape(b, h, w, kk * kk).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, kk=kk, bh=bh, bw=bw),
        grid=(b, h // bh, w // bw),
        in_specs=[
            pl.BlockSpec(
                (
                    pl.Element(1),
                    pl.Element(bh + halo),
                    pl.Element(bw + halo + extra),
                    pl.Element(c),
                ),
                lambda bb, i, j: (bb, i * bh, j * bw, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bh, bw, kk * kk),
                lambda bb, i, j: (bb, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bh, bw, c), lambda bb, i, j: (bb, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), dtype),
        scratch_shapes=[pltpu.VMEM((bh, bw, c), jnp.float32)],
        interpret=interpret,
    )(src, wgt)
    return out
