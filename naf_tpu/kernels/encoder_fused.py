"""Fused encoder layers — Pallas TPU kernels.

The NAF image encoder (reference src/layers/convolutions.py:6-92) is a chain
of [GroupNorm -> SiLU -> reflect-pad Conv] layers. Run as separate XLA ops at
2K^2 resolutions this costs ~170 ms on a v5e: XLA's conv runs at ~26% of the
chip's realizable matmul throughput, every GroupNorm is two extra full passes
over HBM, and the activation traffic triggers rematerialization copies.

This module fuses each layer into ONE Pallas pass (plus, for 3x3, a cheap
XLA reflect-pad of the input):

    y = conv_k(silu(x * scale + shift)) + bias        (+ channel sums of y)

- `scale`/`shift` are the GroupNorm normalization and affine folded into a
  per-channel multiply-add (stats come from the PREVIOUS layer's fused
  channel sums, finalized by a tiny XLA op — so GroupNorm costs nothing at
  the HxW scale).
- The conv runs as kh*kw shifted (bh*W, C) @ (C, F) matmuls accumulating in
  f32 — full-depth MXU work instead of XLA's conv lowering.
- Halos: blocks over the reflect-padded input use `pl.Element` indexing
  with stride bh/bw and block extents bh+2 / bw+8 (overlapping reads, which
  plain Blocked specs cannot express). The column block is 8-wide-padded —
  Mosaic requires the second-to-last block dim to be a multiple of 8, so the
  array is right-padded and each tile carries 6 unused columns. No in-kernel
  border handling is needed at all.
- Each program also emits per-channel sum / sum-of-squares of its y tile, so
  the next layer's GroupNorm stats need no extra pass over the activations.

The driver `encoder_stack_fused` mirrors naf_tpu.nn.Encoder exactly (same
parameter tree) and is used by ImageEncoder for bf16 inference on TPU;
tests/test_encoder_fused.py checks it against the flax stack.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gn_silu_conv_fused", "encoder_stack_fused", "fused_encoder_applicable"]


def _kernel(
    x_ref,  # k=3: (1, bh+2, bw+8, C) halo tile of padded input; k=1: (1, bh, bw, C)
    scale_ref,  # (1, 1, C) f32 (leading 1 keeps the block legal at B > 1)
    shift_ref,  # (1, 1, C) f32
    w_ref,  # (kh*kw, C, F) VMEM
    b_ref,  # (1, F) f32
    y_ref,  # (1, bh, bw, F) VMEM out
    ps_ref,  # (1, 1, 1, 2, F) f32 out — per-program [sum, sumsq] of y
    z_ref,  # (kk, bh+pad, bw+pad, C) VMEM scratch — activated input, one
    #         sublane-rolled copy per column tap (k=3; (1, bh, bw, C) for k=1)
    *,
    kernel_size: int,
    bh: int,
    bw: int,
    activation: bool,
    psum_cols: None,  # (col_shift, W): mask psums to valid interior columns
    diag: str = "",  # timing-only ablations ("nopsum"/"notaps")
):
    kk = kernel_size

    # 4-D block for k=1 / Element k=3; 6-D for the pre-sliced halo layout
    xt = x_ref[0] if x_ref.ndim == 4 else x_ref[0, 0, :, 0]
    zf = xt.astype(jnp.float32) * scale_ref[0, 0] + shift_ref[0, 0]
    if activation and diag != "noact":  # noact: isolate the silu VPU cost
        zf = zf * jax.nn.sigmoid(zf)

    prec = (
        jax.lax.Precision.HIGHEST
        if x_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    f_out = w_ref.shape[-1]
    if kk == 1:
        # no scratch round-trip: the activated value feeds the dot directly.
        # Operands flattened to 2-D: a rank-3 lhs with a minor contraction
        # makes Mosaic emit per-row mini-matmuls instead of one MXU pass.
        acc = jax.lax.dot_general(
            zf.astype(x_ref.dtype).reshape(bh * bw, -1),
            w_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        ).reshape(bh, bw, f_out)
    else:
        # Static unroll of the kk*kk taps with two interleaved accumulation
        # chains. The previous fori_loop over row taps serialized the MXU at
        # ~25% of its bound at 2048^2 (each iteration's dots waited on the
        # loop-carried scratch accumulate); a static unroll lets the
        # scheduler pipeline the dots. Two chains (instead of the original
        # single fully-unrolled chain) bound the number of accumulator-sized
        # f32 values the scheduler keeps live — _pick_tiles budgets for
        # kk + 1 of them.
        #
        # Column taps: the scratch holds one sublane-rolled copy of the
        # activated tile per dx, written once, so every dot's lhs is a
        # sublane-ALIGNED slice — Mosaic lowers an unaligned (dx = 1, 2)
        # operand slice as per-row realignment shuffles on the critical
        # path of each matmul (measured ~3 ms/layer at 2048^2).
        wcols = zf.shape[1]
        z_ref[0] = zf.astype(x_ref.dtype)
        for dx in range(1, kk):
            if diag == "norolls":  # skip the rolled copies; dots read src 0
                break
            # roll left by dx: out[w] = in[w + dx]. Mosaic's rotate only
            # handles 32-bit data, so roll the f32 value pre-cast.
            z_ref[dx] = pltpu.roll(zf, wcols - dx, 1).astype(x_ref.dtype)
        if diag == "nodots":  # skip the MXU entirely (timing floor)
            acc = (jnp.zeros((bh * bw, f_out), jnp.float32)
                   + jnp.sum(z_ref[0, 0, 0])).reshape(bh, bw, f_out)
            y = acc + b_ref[0]
            y_ref[0] = y.astype(y_ref.dtype)
            ps_ref[0, 0, 0, 0, :] = y[0, 0]
            ps_ref[0, 0, 0, 1, :] = y[0, 0]
            return
        acc0 = acc1 = None
        for dy in range(kk):
            for dx in range(kk):
                src = 0 if diag in ("notaps", "norolls") else dx
                part = jax.lax.dot_general(
                    z_ref[src, dy : dy + bh, 0:bw, :].reshape(bh * bw, -1),
                    w_ref[dy * kk + dx],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
                if (dy * kk + dx) % 2 == 0:
                    acc0 = part if acc0 is None else acc0 + part
                else:
                    acc1 = part if acc1 is None else acc1 + part
        acc = (acc0 + acc1).reshape(bh, bw, f_out)

    # acc stays a value (no f32 scratch round-trip — a (bh, bw, F) f32
    # write+read per program costs real VMEM bandwidth on the critical path)
    y = acc + b_ref[0]
    yc = y.astype(y_ref.dtype)
    y_ref[0] = yc

    if diag == "nopsum":
        ps_ref[0, 0, 0, 0, :] = y[0, 0]
        ps_ref[0, 0, 0, 1, :] = y[0, 0]
    else:
        if psum_cols is not None:
            # Column-shifted carry output: block 0's first `sc` columns and
            # the extra last block's tail are outside the interior — exclude
            # them from the GroupNorm stats (select, not multiply: the
            # garbage may be NaN from uninitialized buffer reads).
            sc, w_int = psum_cols
            j = pl.program_id(2)
            col = jax.lax.broadcasted_iota(jnp.int32, (1, bw, 1), 1)
            gcol = j * bw + col
            y = jnp.where((gcol >= sc) & (gcol < w_int + sc), y, 0.0)
        ps_ref[0, 0, 0, 0, :] = jnp.sum(y, axis=(0, 1))
        ps_ref[0, 0, 0, 1, :] = jnp.sum(y * y, axis=(0, 1))


def _dual_kernel(
    x_ref,      # (1, bh+2, bw+8, 2C) Element halo tile of the padded PACKED
    #             [pix|sem] input (reflect ring used by sem; pix reads interior)
    scale_ref,  # (1, 1, 2C) f32 — per-channel GN affine, [pix|sem]
    shift_ref,  # (1, 1, 2C) f32
    wp_ref,     # (1, C, C) pix 1x1 conv weight
    ws_ref,     # (9, C, C) sem 3x3 conv weights (tap-major dy*3+dx)
    bp_ref,     # (1, C) f32
    bs_ref,     # (1, C) f32
    y_ref,      # (1, bh, bw, 2C) packed out
    ps_ref,     # (1, 1, 1, 2, 2C) f32 out — [sum, sumsq] of y, packed
    z_ref,      # (4, bh+2, bw+8, C) scratch: [0..2] sem col-rolled copies,
    #             [3] pix rolled by one column (so its slices stay aligned)
    *,
    bh: int,
    bw: int,
):
    """One PACKED dual-stack encoder layer: both stacks' GN->SiLU->conv in a
    single pass over one (.., 2C) buffer. The pixel stack's conv is 1x1, so
    its HBM traffic rides along the MXU-bound 3x3 pass for free — run
    separately it costs its own full read+write of the grid per layer
    (measured 5.4 ms/layer at 2048^2). Channel halves are lane slices at a
    128 multiple, so every slice below is Mosaic-legal."""
    c = wp_ref.shape[-1]
    xt = x_ref[0]
    zf = xt.astype(jnp.float32) * scale_ref[0, 0] + shift_ref[0, 0]
    zf = zf * jax.nn.sigmoid(zf)

    prec = (
        jax.lax.Precision.HIGHEST
        if x_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    wcols = zf.shape[1]
    zsem = zf[:, :, c:]
    z_ref[0] = zsem.astype(x_ref.dtype)
    z_ref[1] = pltpu.roll(zsem, wcols - 1, 1).astype(x_ref.dtype)
    z_ref[2] = pltpu.roll(zsem, wcols - 2, 1).astype(x_ref.dtype)
    # pix input = interior of the padded tile = (rows 1..bh+1, cols 1..bw+1);
    # a col-rolled copy turns the col offset into an aligned 0..bw slice
    z_ref[3] = pltpu.roll(zf[:, :, :c], wcols - 1, 1).astype(x_ref.dtype)

    accp = jax.lax.dot_general(
        z_ref[3, 1 : 1 + bh, 0:bw, :].reshape(bh * bw, c),
        wp_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    acc0 = acc1 = None
    for dy in range(3):
        for dx in range(3):
            part = jax.lax.dot_general(
                z_ref[dx, dy : dy + bh, 0:bw, :].reshape(bh * bw, c),
                ws_ref[dy * 3 + dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            if (dy * 3 + dx) % 2 == 0:
                acc0 = part if acc0 is None else acc0 + part
            else:
                acc1 = part if acc1 is None else acc1 + part

    yp = (accp + bp_ref[0]).reshape(bh, bw, c)
    ys = ((acc0 + acc1) + bs_ref[0]).reshape(bh, bw, c)
    y_ref[0, :, :, :c] = yp.astype(y_ref.dtype)
    y_ref[0, :, :, c:] = ys.astype(y_ref.dtype)
    ps_ref[0, 0, 0, 0, :c] = jnp.sum(yp, axis=(0, 1))
    ps_ref[0, 0, 0, 0, c:] = jnp.sum(ys, axis=(0, 1))
    ps_ref[0, 0, 0, 1, :c] = jnp.sum(yp * yp, axis=(0, 1))
    ps_ref[0, 0, 0, 1, c:] = jnp.sum(ys * ys, axis=(0, 1))


def _pick_tiles_dual(h: int, w: int, c: int, itemsize: int):
    """(bh, bw) for the dual kernel; c is the per-stack channel count.

    Live set: double-buffered (.., 2C) x/y blocks, the f32 activated tile,
    4 scratch slabs, and the sem tap chains + pix accumulator (f32).
    Tie-break on halo inflation ((bh+2)(bw+8)/(bh*bw) — the overlapping
    Element reads are re-fetched HBM bytes), so (16, 64) beats (64, 16)."""
    best = None
    for bh in (64, 32, 16, 8, 4, 2, 1):
        if h % bh:
            continue
        for bw in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
            if w % bw:
                continue
            x_t = (bh + 2) * (bw + 8) * 2 * c * itemsize
            y_t = bh * bw * 2 * c * itemsize
            zf_t = (bh + 2) * (bw + 8) * 2 * c * 4
            z_t = 4 * (bh + 2) * (bw + 8) * c * itemsize
            acc = bh * bw * c * 4
            live_parts = 5 * acc  # 2 sem chains + transients + pix acc
            use = 3 * x_t + zf_t + z_t + 2 * y_t + live_parts + 10 * c * c * itemsize
            score = (bh * bw, -((bh + 2) * (bw + 8)) / (bh * bw))
            if use < 12 * 2**20 and (best is None or score > best[0]):
                best = (score, bh, bw)
    return (best[1], best[2]) if best else None


def dual_encoder_applicable(x_shape, hidden: int) -> bool:
    _, h, w, _ = x_shape
    if hidden % 128 or w % 8:
        return False
    return _pick_tiles_dual(h, w, hidden, 2) is not None


@functools.partial(jax.jit, static_argnames=("interpret", "tiles"))
def gn_silu_conv_dual_fused(x, scale, shift, wp, ws, bp, bs,
                            interpret: bool = False, tiles=None):
    """One packed dual-stack layer. x (B,H,W,2C) [pix|sem] -> (y, psums).

    y[..., :C] = conv1x1(silu(x[..., :C]*scale_p + shift_p))
    y[..., C:] = conv3x3_reflect(silu(x[..., C:]*scale_s + shift_s))
    psums (B, 2, 2C) f32 [sum, sumsq] of y, for the next layer's GroupNorms.
    """
    bsz, h, wd, c2 = x.shape
    c = c2 // 2
    tiles = tiles or _pick_tiles_dual(h, wd, c, x.dtype.itemsize)
    if tiles is None:
        raise ValueError(f"unsupported shape for dual encoder layer: {x.shape}")
    bh, bw = tiles
    np_i, np_j = h // bh, wd // bw

    xin = _reflect_pad_fast(x)
    x_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(bh + 2), pl.Element(bw + 8), pl.Element(c2)),
        lambda bb, i, j: (bb, i * bh, j * bw, 0),
        memory_space=pltpu.VMEM,
    )
    small = lambda shape: pl.BlockSpec(
        shape, lambda bb, i, j: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    # GroupNorm is per-sample: scale/shift are (B, 1, C), indexed by batch.
    # The middle singleton keeps the block's last-two dims (1, C) equal to
    # the array's trailing extents — a (1, C) block over a (B, C) array is
    # Mosaic-illegal for B > 1 (second-to-last block dim must be 8k or full).
    per_b = lambda ch: pl.BlockSpec(
        (1, 1, ch), lambda bb, i, j: (bb, 0, 0), memory_space=pltpu.VMEM
    )

    y, ps = pl.pallas_call(
        functools.partial(_dual_kernel, bh=bh, bw=bw),
        grid=(bsz, np_i, np_j),
        in_specs=[
            x_spec,
            per_b(c2),
            per_b(c2),
            small((1, c, c)),
            small((9, c, c)),
            small((1, c)),
            small((1, c)),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, bh, bw, c2), lambda bb, i, j: (bb, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, 2, c2), lambda bb, i, j: (bb, i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, wd, c2), x.dtype),
            jax.ShapeDtypeStruct((bsz, np_i, np_j, 2, c2), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((4, bh + 2, bw + 8, c), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(
        xin,
        jnp.broadcast_to(jnp.atleast_2d(scale)[:, None, :], (bsz, 1, c2)).astype(jnp.float32),
        jnp.broadcast_to(jnp.atleast_2d(shift)[:, None, :], (bsz, 1, c2)).astype(jnp.float32),
        wp.reshape(1, c, c),
        ws.reshape(9, c, c),
        bp.reshape(1, c).astype(jnp.float32),
        bs.reshape(1, c).astype(jnp.float32),
    )
    return y, jnp.sum(ps, axis=(1, 2))


def _pick_tiles(h: int, w: int, c: int, f: int, kk: int, itemsize: int):
    """(bh, bw) maximizing tile area under a conservative VMEM model.

    Live set: double-buffered x/y blocks, the f32 affine+silu value + its
    cast, the scratch accumulator, and a couple of transient tap values."""
    pad_r, pad_c = (2, 8) if kk == 3 else (0, 0)
    best = None
    for bh in (64, 32, 16, 8, 4, 2, 1):
        if h % bh:
            continue
        for bw in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
            if w % bw:
                continue
            x_t = (bh + pad_r) * (bw + pad_c) * c * itemsize
            y_t = bh * bw * f * itemsize
            acc = bh * bw * f * 4
            live_parts = ((kk + 1) if kk == 3 else 1) * acc
            z_t = kk * x_t if kk == 3 else 0  # per-column-tap rolled copies
            use = (
                3 * x_t + z_t + 2 * y_t + acc + live_parts
                + kk * kk * c * f * itemsize
            )
            if use < 12 * 2**20 and (best is None or bh * bw > best[0]):
                best = (bh * bw, bh, bw)
    return (best[1], best[2]) if best else None


def fused_encoder_applicable(x_shape, kernel_size: int, hidden: int) -> bool:
    _, h, w, _ = x_shape
    if kernel_size not in (1, 3):
        return False
    if hidden % 128 or w % 8:
        return False
    return _pick_tiles(h, w, hidden, hidden, kernel_size, 2) is not None


@functools.partial(
    jax.jit,
    static_argnames=("kernel_size", "activation", "interpret", "out_total_f",
                     "out_ch_block", "in_layout", "out_padded",
                     "out_col_shift", "_diag", "_tiles"),
)
def gn_silu_conv_fused(
    x, scale, shift, w, b, kernel_size: int, activation: bool = True,
    interpret: bool = False, out_total_f=None, out_ch_block: int = 0,
    out_acc=None, in_layout=None, out_padded: bool = False,
    out_col_shift: int = 0, _diag: str = "", _tiles=None,
):
    """One fused encoder layer. x (B,H,W,C) -> (y (B,H,W,F), psums (B,2,F)).

    y = conv(silu(x*scale + shift)) with exact reflect padding; psums are
    f32 [sum, sum-of-squares] of y over (H, W), for the next GroupNorm.
    scale/shift broadcast from (C,) or are per-sample (B, C).

    Packed output (inference): out_total_f widens the output buffer to
    (B, H, W, out_total_f) with this layer's F channels written at channel
    block out_ch_block; out_acc (same shape) is ALIASED in so two stacks'
    final layers share one buffer — the (H, W, 2F) pix|sem concatenation
    pass (2 GB of pure copy traffic at 2048^2) never happens.

    Padded carry (k=3 chains): in_layout=(off_r, col_shift, H, W) declares
    x as a carry buffer — rows interior at off_r with a reflect ring at
    off_r-1/off_r+H, columns interior at col_shift with a ring at
    col_shift-1/col_shift+W — so NO reflect-pad copy of the input happens
    (~GB and 5.5 ms per layer at 2048^2; `_reflect_pad_fast` now runs ONCE
    per stack, producing the stem carry via `_stem_carry_pad`).
    out_padded=True + out_col_shift=s writes the output as the next carry.
    Mosaic constraint shaping the scheme: Element windows take arbitrary
    ROW offsets but ZERO column offset — so each layer's column interior
    shifts LEFT by one (s_out = s_in - 1, final layer landing at 0 = plain
    layout) which makes every read window start exactly at j*bw while
    containing the taps at the same in-window positions as the plain path.
    The price: one extra column block of garbage compute per row (masked
    out of the psums in-kernel), bw/W of the layer.
    Numerics identical: the rings hold exactly the reflect rows/cols the
    kernel taps would have read from a padded copy."""
    kk = kernel_size
    f = w.shape[-1]
    if in_layout is not None:
        off_r, s_in, h, wd = in_layout
        bsz, c = x.shape[0], x.shape[-1]
        if kk != 3:
            raise ValueError("in_layout is for k=3 layers only")
        if out_padded and out_col_shift != s_in - 1:
            raise ValueError("carry chain must decrement the column shift")
    else:
        bsz, h, wd, c = x.shape
    tiles = _tiles or _pick_tiles(h, wd, c, f, kk, x.dtype.itemsize)
    if tiles is None:
        raise ValueError(
            f"unsupported shape for fused encoder layer: {(bsz, h, wd, c)}"
        )
    bh, bw = tiles
    np_i, np_j = h // bh, wd // bw
    if out_padded:
        if kk != 3 or out_total_f or out_acc is not None:
            raise ValueError("out_padded is for plain k=3 carry chains only")
        if in_layout is None:
            raise ValueError(
                "out_padded requires a carry input (the extra column block "
                "reads past a plain reflect-pad buffer)"
            )
        if not 1 <= out_col_shift <= bw:
            raise ValueError("out_col_shift must be in [1, bw]")
        np_j = -(-(wd + out_col_shift) // bw)  # extra garbage column block

    if kk == 3 and _diag == "blocked":
        # Timing-only ablation: regular Blocked specs, no halos (numerics
        # wrong at tile edges) — isolates whether pl.Element overlapping
        # blocks defeat the automatic cross-program DMA pipeline.
        xin = jnp.pad(x, ((0, 0), (0, 2), (0, 8), (0, 0)))
        mi = (h + 2) // (bh + 2)
        mj = (wd + 8) // (bw + 8)
        x_spec = pl.BlockSpec(
            (1, bh + 2, bw + 8, c),
            lambda bb, i, j: (bb, i % mi, j % mj, 0),
            memory_space=pltpu.VMEM,
        )
    elif kk == 3 and _diag == "presliced":
        # REJECTED experiment (kept for the record): pre-slicing the padded
        # input into non-overlapping halo tiles via one flat gather makes
        # every block a regular Blocked spec — but the (256 B)-row gather
        # measured 81 ms/layer at 2048^2 vs 22.8 for Element halos; XLA's
        # gather emitter cannot stream c-granular rows. Element blocks stay
        # the default.
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 7), (0, 0)), mode="reflect")
        np_i_, np_j_ = h // bh, wd // bw
        row_id = (
            np.arange(np_i_)[:, None] * bh + np.arange(bh + 2)[None, :]
        ).reshape(-1)  # (np_i * (bh+2),)
        col_id = (
            np.arange(np_j_)[:, None] * bw + np.arange(bw + 8)[None, :]
        ).reshape(-1)  # (np_j * (bw+8),)
        flat = (row_id[:, None] * (wd + 8) + col_id[None, :]).reshape(-1)
        xin = jnp.take(
            xp.reshape(bsz, (h + 2) * (wd + 8), c), jnp.asarray(flat), axis=1
        ).reshape(bsz, np_i_, bh + 2, np_j_, bw + 8, c)
        x_spec = pl.BlockSpec(
            (1, 1, bh + 2, 1, bw + 8, c),
            lambda bb, i, j: (bb, i, 0, j, 0, 0),
            memory_space=pltpu.VMEM,
        )
    elif kk == 3:
        # Reflect-pad 1px; the right edge gets 6 extra columns so that
        # Element column blocks are 8-divisible (Mosaic's second-to-last
        # block dim rule). Const-pad + ring updates (_reflect_pad_fast):
        # 8.6 vs 13.9 ms for XLA's rev+concat reflect lowering at 2048^2.
        # A padded-carry input (in_layout) is already ring-padded: row
        # windows start at off_r-1 (arbitrary row offsets are Mosaic-legal);
        # column windows start exactly at j*bw (column offsets must be 0),
        # which lands the taps at the same in-window columns as the plain
        # path because the interior's column shift decrements per layer.
        if in_layout is not None:
            xin = x
            ir = off_r - 1
        else:
            xin = _reflect_pad_fast(x)
            ir = 0
        x_spec = pl.BlockSpec(
            (
                pl.Element(1),
                pl.Element(bh + 2),
                pl.Element(bw + 8),
                pl.Element(c),
            ),
            lambda bb, i, j: (bb, i * bh + ir, j * bw, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        xin = x
        x_spec = pl.BlockSpec(
            (1, bh, bw, c), lambda bb, i, j: (bb, i, j, 0),
            memory_space=pltpu.VMEM,
        )

    small = lambda shape: pl.BlockSpec(
        shape, lambda bb, i, j: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    # GroupNorm is per-sample: scale/shift are (B, 1, C), indexed by batch.
    # The middle singleton keeps the block's last-two dims (1, C) equal to
    # the array's trailing extents — a (1, C) block over a (B, C) array is
    # Mosaic-illegal for B > 1 (second-to-last block dim must be 8k or full).
    per_b = lambda ch: pl.BlockSpec(
        (1, 1, ch), lambda bb, i, j: (bb, 0, 0), memory_space=pltpu.VMEM
    )

    y, ps = pl.pallas_call(
        functools.partial(
            _kernel, kernel_size=kk, bh=bh, bw=bw, activation=activation,
            psum_cols=(out_col_shift, wd) if out_padded else None, diag=_diag,
        )
        if out_acc is None
        else (
            lambda x_r, s_r, sh_r, w_r, b_r, _acc_r, y_r, ps_r, z_r: _kernel(
                x_r, s_r, sh_r, w_r, b_r, y_r, ps_r, z_r,
                kernel_size=kk, bh=bh, bw=bw, activation=activation,
                psum_cols=None, diag=_diag,
            )
        ),
        grid=(bsz, np_i, np_j),
        in_specs=[
            x_spec,
            per_b(c),
            per_b(c),
            small((kk * kk, c, f)),
            small((1, f)),
        ]
        + ([pl.BlockSpec(memory_space=pl.ANY)] if out_acc is not None else []),
        out_specs=[
            pl.BlockSpec(
                (1, bh, bw, f),
                (lambda bb, i, j: (bb, i + 1, j, 0))
                if out_padded
                else (lambda bb, i, j: (bb, i, j, out_ch_block)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, 2, f), lambda bb, i, j: (bb, i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(
                (bsz, h + bh + 2, np_j * bw + 8, f)
                if out_padded
                else (bsz, h, wd, out_total_f or f),
                x.dtype,
            ),
            jax.ShapeDtypeStruct((bsz, np_i, np_j, 2, f), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM(
                ((kk, bh + 2, bw + 8) if kk == 3 else (1, bh, bw)) + (c,),
                x.dtype,
            ),
        ],
        input_output_aliases={5: 0} if out_acc is not None else {},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(
        *(
            [
                xin,
                jnp.broadcast_to(jnp.atleast_2d(scale)[:, None, :], (bsz, 1, c)).astype(jnp.float32),
                jnp.broadcast_to(jnp.atleast_2d(shift)[:, None, :], (bsz, 1, c)).astype(jnp.float32),
                w.reshape(kk * kk, c, f),
                b.reshape(1, f).astype(jnp.float32),
            ]
            + ([out_acc] if out_acc is not None else [])
        )
    )
    if out_padded:
        # Fill the reflect ring in place (rows first, then columns, so the
        # corner elements pick up the already-reflected rows — same order as
        # _reflect_pad_fast). Interior occupies rows [bh, bh+h), columns
        # [out_col_shift, out_col_shift+wd).
        orow, ocol = bh, out_col_shift
        y = jax.lax.dynamic_update_slice(
            y, y[:, orow + 1 : orow + 2], (0, orow - 1, 0, 0)
        )
        y = jax.lax.dynamic_update_slice(
            y, y[:, orow + h - 2 : orow + h - 1], (0, orow + h, 0, 0)
        )
        y = jax.lax.dynamic_update_slice(
            y, y[:, :, ocol + 1 : ocol + 2], (0, 0, ocol - 1, 0)
        )
        y = jax.lax.dynamic_update_slice(
            y, y[:, :, ocol + wd - 2 : ocol + wd - 1], (0, 0, ocol + wd, 0)
        )
        # the matching in_layout for the next layer is carry_layout(...) —
        # computed OUTSIDE this jitted function (a returned tuple would be
        # traced into arrays and unusable as a static argument)
    return y, jnp.sum(ps, axis=(1, 2))


def _stem_carry_pad(x, col_shift: int, bw: int):
    """Const-pad + rings turning a plain (B,H,W,C) array into the chain's
    initial carry buffer: rows interior at 1 with reflect ring rows 0/h+1;
    columns interior at `col_shift` with reflect ring cols col_shift-1 and
    w+col_shift; total cols w + bw + 8 (what a bw-tiled reader's shifted
    windows can reach). Generalizes `_reflect_pad_fast`."""
    b, h, w, c = x.shape
    s = col_shift
    y = jax.lax.pad(
        x, jnp.asarray(0, x.dtype),
        ((0, 0, 0), (1, 1, 0), (s, bw + 8 - s, 0), (0, 0, 0)),
    )
    y = jax.lax.dynamic_update_slice(y, y[:, 2:3], (0, 0, 0, 0))
    y = jax.lax.dynamic_update_slice(y, y[:, h - 1 : h], (0, h + 1, 0, 0))
    y = jax.lax.dynamic_update_slice(
        y, y[:, :, s + 1 : s + 2], (0, 0, s - 1, 0)
    )
    y = jax.lax.dynamic_update_slice(
        y, y[:, :, s + w - 2 : s + w - 1], (0, 0, s + w, 0)
    )
    return y


def carry_layout(h: int, w: int, c: int, f: int, itemsize: int,
                 col_shift: int, off_r: int = None):
    """Static in_layout tuple (off_r, col_shift, H, W) describing a carry
    buffer: rows interior at off_r (reflect ring at off_r-1 / off_r+H),
    columns interior at col_shift (ring at col_shift-1 / col_shift+W).
    off_r defaults to the writer layer's row tile (what out_padded wrote);
    pass off_r=1 for the stem carry buffer (`_stem_carry_pad`)."""
    if off_r is None:
        tiles = _pick_tiles(h, w, c, f, 3, itemsize)
        if tiles is None:
            return None
        off_r = tiles[0]
    return (off_r, col_shift, h, w)


def _gn_affine(psums, gamma, beta, hw: int, num_groups: int, eps: float):
    """Fold GroupNorm stats + affine into per-channel, per-sample scale/shift.

    psums: (B, 2, C) f32 [sum, sumsq] over (H, W). Returns (B, C) f32 pairs
    such that gn(x) = x * scale + shift (reference GroupNorm eps=1e-5,
    biased variance, contiguous channel grouping)."""
    b, _, c = psums.shape
    cg = c // num_groups
    count = hw * cg
    s = psums.reshape(b, 2, num_groups, cg).sum(axis=-1)  # (B, 2, G)
    mean = s[:, 0] / count
    var = s[:, 1] / count - mean * mean
    rstd = jax.lax.rsqrt(var + eps)  # (B, G)
    mean_c = jnp.repeat(mean, cg, axis=-1)  # (B, C)
    rstd_c = jnp.repeat(rstd, cg, axis=-1)
    scale = rstd_c * gamma[None]
    shift = beta[None] - mean_c * scale
    return scale, shift


def _channel_sums(x):
    """(B, H, W, C) -> (B, 2, C) f32 [sum, sumsq] (for the first GroupNorm,
    whose input is the stem conv output produced by XLA)."""
    xf = x.astype(jnp.float32)
    return jnp.stack(
        [jnp.sum(xf, axis=(1, 2)), jnp.sum(xf * xf, axis=(1, 2))], axis=1
    )


def _reflect_pad_fast(x):
    """((1,1),(1,7)) reflect pad as const-pad + 4 ring updates.

    XLA lowers jnp.pad(mode="reflect") through rev+concat at ~14 ms for a
    1 GB operand at 2048^2 — 3.5x the copy floor. A constant lax.pad runs at
    5.5 ms, and the reflect ring is four sliver-sized dynamic updates
    (measured total: 8.6 ms). Bit-identical to the reflect pad on every
    element the Element-halo kernel reads (the 6 right-edge alignment
    columns stay zero instead of reflected; the kernel never reads them
    into any output tap)."""
    b, h, w, c = x.shape
    y = jax.lax.pad(
        x, jnp.asarray(0, x.dtype), ((0, 0, 0), (1, 1, 0), (1, 7, 0), (0, 0, 0))
    )
    # rows first, then columns (so corners pick up the reflected rows):
    # padded row 0 <- x row 1 (== padded row 2), padded row h+1 <- x row h-2
    y = jax.lax.dynamic_update_slice(y, y[:, 2:3], (0, 0, 0, 0))
    y = jax.lax.dynamic_update_slice(y, y[:, h - 1 : h], (0, h + 1, 0, 0))
    y = jax.lax.dynamic_update_slice(y, y[:, :, 2:3], (0, 0, 0, 0))
    y = jax.lax.dynamic_update_slice(y, y[:, :, w - 1 : w], (0, 0, w + 1, 0))
    return y


def _stem_conv_matmul(x, kernel, bias, kernel_size: int):
    """Stem conv (3->F) as an im2col matmul — numerics-identical to
    _reflect_conv_xla.

    XLA's conv lowering runs the 3-input-channel stem at a small fraction of
    the MXU bound (8.7 ms at 2048^2); gathering the 3*k^2 input taps into
    lanes and contracting in ONE matmul runs at ~3 ms. The patches array is
    small (k*k*3 channels) so the extra materialization is cheap.
    Replaces: reference src/layers/convolutions.py:67-74 stem conv."""
    kk = kernel_size
    p = kk // 2
    if p > 0:
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    b, hp, wp, c = x.shape
    h, w = hp - 2 * p, wp - 2 * p
    f = kernel.shape[-1]
    if kk == 1:
        patches = x
    else:
        patches = jnp.concatenate(
            [
                x[:, dy : dy + h, dx : dx + w, :]
                for dy in range(kk)
                for dx in range(kk)
            ],
            axis=-1,
        )  # (b, h, w, kk*kk*c) — flat tap index (dy*kk + dx)*c + ci
    y = jax.lax.dot_general(
        patches.reshape(b * h * w, kk * kk * c),
        kernel.reshape(kk * kk * c, f),  # HWIO flattens in the same order
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(b, h, w, f)
    # round the accumulator to the io dtype BEFORE the bias add, exactly as
    # the conv lowering does
    return y.astype(x.dtype) + bias


def _reflect_conv_xla(x, kernel, bias, kernel_size: int):
    """Functional twin of naf_tpu.nn.conv.ReflectConv (same numerics)."""
    p = kernel_size // 2
    if p > 0:
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y + bias


def _encoder_stack_xla(params, x, hidden, kernel_size, ks_res, num_layers,
                       num_groups, eps):
    """Pure-XLA functional twin of naf_tpu.nn.Encoder (same param tree, same
    math) — used as the differentiation surface for the fused stack."""
    y = _reflect_conv_xla(
        x, params["stem"]["conv"]["kernel"], params["stem"]["conv"]["bias"],
        kernel_size,
    )
    b = y.shape[0]
    for i in range(num_layers):
        blk = params[f"block{i}"]
        for norm_name, conv_name in (("norm1", "conv1"), ("norm2", "conv2")):
            ps = _channel_sums(y)
            scale, shift = _gn_affine(
                ps, blk[norm_name]["scale"], blk[norm_name]["bias"],
                y.shape[1] * y.shape[2], num_groups, eps,
            )
            z = y.astype(jnp.float32) * scale[:, None, None] + shift[:, None, None]
            z = (z * jax.nn.sigmoid(z)).astype(y.dtype)
            y = _reflect_conv_xla(
                z, blk[conv_name]["conv"]["kernel"],
                blk[conv_name]["conv"]["bias"], ks_res,
            )
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def encoder_stack_fused(
    params, x, hidden: int, kernel_size: int = 3, ks_res: int = 3,
    num_layers: int = 2, num_groups: int = 8, eps: float = 1e-5,
    interpret: bool = False,
):
    """Fused equivalent of naf_tpu.nn.Encoder.__call__ (same param tree).

    The stem conv stays in XLA (3 input channels are Pallas-hostile and it
    is a tiny fraction of the FLOPs); every GN->SiLU->conv layer runs fused.
    Differentiable: the backward runs through the pure-XLA twin (training
    grids are small in NAF's scheme, and the fused gate only engages at
    448^2+ anyway)."""
    return _stack_fwd_impl(
        params, x, hidden, kernel_size, ks_res, num_layers, num_groups, eps,
        interpret,
    )


def _stack_fwd_impl(params, x, hidden, kernel_size, ks_res, num_layers,
                    num_groups, eps, interpret):
    b, h, wd, _ = x.shape
    y = _stem_conv_matmul(
        x, params["stem"]["conv"]["kernel"], params["stem"]["conv"]["bias"],
        kernel_size,
    )
    ps = _channel_sums(y)
    hw = h * wd
    n_lay = num_layers * 2
    tiles = (
        _pick_tiles(h, wd, hidden, hidden, 3, x.dtype.itemsize)
        if ks_res == 3
        else None
    )
    carry = tiles is not None and n_lay <= tiles[1]  # col shift must fit bw
    layout = None
    if carry:
        y = _stem_carry_pad(y, n_lay, tiles[1])
        layout = (1, n_lay, h, wd)  # stem carry: rows interior at 1
    li = 0
    for i in range(num_layers):
        blk = params[f"block{i}"]
        for norm_name, conv_name in (("norm1", "conv1"), ("norm2", "conv2")):
            scale, shift = _gn_affine(
                ps, blk[norm_name]["scale"], blk[norm_name]["bias"],
                hw, num_groups, eps,
            )
            carry_out = carry and li < n_lay - 1
            s_out = n_lay - 1 - li if carry_out else 0
            y, ps = gn_silu_conv_fused(
                y, scale, shift,
                blk[conv_name]["conv"]["kernel"], blk[conv_name]["conv"]["bias"],
                kernel_size=ks_res, interpret=interpret,
                in_layout=layout, out_padded=carry_out, out_col_shift=s_out,
            )
            layout = (
                carry_layout(h, wd, hidden, hidden, x.dtype.itemsize, s_out)
                if carry_out
                else None
            )
            li += 1
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def encoder_stack_fused_packed(
    params_pix,
    params_sem,
    x,
    hidden: int,
    num_layers: int = 2,
    num_groups: int = 8,
    eps: float = 1e-5,
    interpret: bool = False,
):
    """Dual-stack encoder with a packed output.

    Runs the pixel (k=1) and semantic (k=3) stacks and has each stack's
    FINAL fused layer write its half of one (B, H, W, 2*hidden) buffer
    (channel-block indexed output + input_output_aliases) — the pix|sem
    `jnp.concatenate` of ImageEncoder.encode (reference src/model/naf.py:34:
    torch.cat of the two encoder outputs), 2 GB of pure copy traffic at
    2048^2, never happens. Numerics identical to
    concat(encoder_stack_fused(pix), encoder_stack_fused(sem)).
    Differentiable: the custom VJP differentiates that concat twin, whose
    per-stack backward is encoder_stack_fused's own XLA-twin VJP."""
    return _packed_fwd_impl(
        params_pix, params_sem, x, hidden, num_layers, num_groups, eps,
        interpret,
    )


def _stem_dual_matmul(x, kp, bp, ks_, bs_):
    """Both stems as ONE im2col matmul: the pixel stack's 1x1 stem embeds at
    the 3x3 grid's center tap (zero rows elsewhere contribute exactly 0 in
    the f32 accumulator, so numerics match the separate k=1 stem)."""
    c = kp.shape[-1]
    pix3 = jnp.zeros((3, 3, 3, c), kp.dtype).at[1, 1].set(kp[0, 0])
    wcat = jnp.concatenate([pix3, ks_], axis=-1)  # (3, 3, 3, 2C)
    bcat = jnp.concatenate([bp, bs_])
    return _stem_conv_matmul(x, wcat, bcat, 3)


def _dual_fwd_impl(params_pix, params_sem, x, hidden, num_layers,
                   num_groups, eps, interpret):
    """Packed dual-stack forward: one merged stem matmul + one dual kernel
    per layer (both stacks per pass). Numerically identical to
    concat(encoder_stack_fused(pix), encoder_stack_fused(sem))."""
    c = hidden
    y = _stem_dual_matmul(
        x,
        params_pix["stem"]["conv"]["kernel"], params_pix["stem"]["conv"]["bias"],
        params_sem["stem"]["conv"]["kernel"], params_sem["stem"]["conv"]["bias"],
    )
    ps = _channel_sums(y)  # (B, 2, 2C)
    hw = x.shape[1] * x.shape[2]
    for i in range(num_layers):
        blk_p = params_pix[f"block{i}"]
        blk_s = params_sem[f"block{i}"]
        for norm_name, conv_name in (("norm1", "conv1"), ("norm2", "conv2")):
            sc_p, sh_p = _gn_affine(
                ps[:, :, :c], blk_p[norm_name]["scale"],
                blk_p[norm_name]["bias"], hw, num_groups, eps,
            )
            sc_s, sh_s = _gn_affine(
                ps[:, :, c:], blk_s[norm_name]["scale"],
                blk_s[norm_name]["bias"], hw, num_groups, eps,
            )
            y, ps = gn_silu_conv_dual_fused(
                y,
                jnp.concatenate([sc_p, sc_s], axis=-1),
                jnp.concatenate([sh_p, sh_s], axis=-1),
                blk_p[conv_name]["conv"]["kernel"],
                blk_s[conv_name]["conv"]["kernel"],
                blk_p[conv_name]["conv"]["bias"],
                blk_s[conv_name]["conv"]["bias"],
                interpret=interpret,
            )
    return y


# Measured on v5e (tools/dual_encoder_profile.py): the dual-pass route LOSES
# to per-stack fused layers end-to-end — 127.6 vs 99.7 ms @2048^2, 4.21 vs
# 3.40 ms @448^2 (c=128/stack). Packing doubles the channel width, which
# halves the feasible tile area under the VMEM budget and inflates the
# Element-halo re-reads (the (bh+2)(bw+8)/(bh*bw) factor) on BOTH halves,
# including the pix half that needs no halo at all. Kept as an opt-in
# ablation; flip only with fresh measurements.
DUAL_ROUTE = False


def _packed_fwd_impl(params_pix, params_sem, x, hidden, num_layers,
                     num_groups, eps, interpret):
    if DUAL_ROUTE and dual_encoder_applicable(
        (x.shape[0], x.shape[1], x.shape[2], 2 * hidden), hidden
    ):
        return _dual_fwd_impl(
            params_pix, params_sem, x, hidden, num_layers, num_groups, eps,
            interpret,
        )
    hw_h, hw_w = x.shape[1], x.shape[2]
    hw = hw_h * hw_w
    out = None
    for idx, (prm, ks) in enumerate(((params_pix, 1), (params_sem, 3))):
        y = _stem_conv_matmul(
            x, prm["stem"]["conv"]["kernel"], prm["stem"]["conv"]["bias"], ks
        )
        ps = _channel_sums(y)
        n_lay = num_layers * 2
        li = 0
        tiles = (
            _pick_tiles(hw_h, hw_w, hidden, hidden, 3, x.dtype.itemsize)
            if ks == 3
            else None
        )
        carry = tiles is not None and n_lay <= tiles[1]
        layout = None
        if carry:
            y = _stem_carry_pad(y, n_lay, tiles[1])
            layout = (1, n_lay, hw_h, hw_w)
        for i in range(num_layers):
            blk = prm[f"block{i}"]
            for norm_name, conv_name in (("norm1", "conv1"), ("norm2", "conv2")):
                scale, shift = _gn_affine(
                    ps, blk[norm_name]["scale"], blk[norm_name]["bias"],
                    hw, num_groups, eps,
                )
                last = li == n_lay - 1
                carry_out = carry and not last
                s_out = n_lay - 1 - li if carry_out else 0
                y, ps = gn_silu_conv_fused(
                    y, scale, shift,
                    blk[conv_name]["conv"]["kernel"],
                    blk[conv_name]["conv"]["bias"],
                    kernel_size=ks, interpret=interpret,
                    out_total_f=2 * hidden if last else None,
                    out_ch_block=idx if last else 0,
                    out_acc=out if (last and idx == 1) else None,
                    in_layout=layout, out_padded=carry_out,
                    out_col_shift=s_out,
                )
                layout = (
                    carry_layout(hw_h, hw_w, hidden, hidden,
                                 x.dtype.itemsize, s_out)
                    if carry_out
                    else None
                )
                li += 1
        if idx == 0:
            out = y  # packed buffer, pix half written; sem half garbage
    # y is the SEM stack's final output: the complete packed buffer (its
    # out_acc aliased the pix buffer, so both halves are live in y)
    return y


def _packed_vjp_fwd(params_pix, params_sem, x, hidden, num_layers,
                    num_groups, eps, interpret):
    out = _packed_fwd_impl(
        params_pix, params_sem, x, hidden, num_layers, num_groups, eps,
        interpret,
    )
    return out, (params_pix, params_sem, x)


def _packed_vjp_bwd(hidden, num_layers, num_groups, eps, interpret, res, g):
    params_pix, params_sem, x = res

    def concat_twin(pp, ps, v):
        return jnp.concatenate(
            [
                encoder_stack_fused(pp, v, hidden, 1, 1, num_layers,
                                    num_groups, eps, interpret),
                encoder_stack_fused(ps, v, hidden, 3, 3, num_layers,
                                    num_groups, eps, interpret),
            ],
            axis=-1,
        )

    _, vjp = jax.vjp(concat_twin, params_pix, params_sem, x)
    return vjp(g)


encoder_stack_fused_packed.defvjp(_packed_vjp_fwd, _packed_vjp_bwd)


def _stack_vjp_fwd(params, x, hidden, kernel_size, ks_res, num_layers,
                   num_groups, eps, interpret):
    out = _stack_fwd_impl(
        params, x, hidden, kernel_size, ks_res, num_layers, num_groups, eps,
        interpret,
    )
    return out, (params, x)


def _stack_vjp_bwd(hidden, kernel_size, ks_res, num_layers, num_groups, eps,
                   interpret, res, g):
    params, x = res
    _, vjp = jax.vjp(
        lambda p, v: _encoder_stack_xla(
            p, v, hidden, kernel_size, ks_res, num_layers, num_groups, eps
        ),
        params, x,
    )
    return vjp(g)


encoder_stack_fused.defvjp(_stack_vjp_fwd, _stack_vjp_bwd)
