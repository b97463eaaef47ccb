"""Fully-fused NAF upsampling attention — Pallas TPU kernel.

The reference inference path (src/model/naf.py:34,51,104-116) materializes,
at output resolution H x W: the adaptively pooled-up encoder output, its
RoPE'd copy (the queries), and nearest-upsampled K/V. At 2048^2 that is
three+ full passes over multi-GB arrays before attention even starts. Here
ONE kernel computes, per (bh x bw) output tile, entirely in VMEM:

  x_up = adaptive pool-up of the (hi x wi) encoder-output tile
         (column pool as small MXU matmuls + static row blends; the tile
         geometry is chosen so bh * hi / H is an integer, which makes the
         pool-up weight pattern identical for every tile and the encoder
         block index map affine -- no gathers, no halos)
  q    = RoPE(x_up)  (rotate-half via in-VMEM lane rolls + separable
         row/col sin/cos tables; same math as naf_tpu.nn.rope)
  out  = cross-scale neighborhood attention over k x k LR-cell windows
         (per-head MXU matmuls against union K/V tiles with <=128 cells,
         f32 softmax; window rule identical to naf_tpu.kernels.na2d_fused)

so neither the pooled-up grid, the queries, nor upsampled K/V ever touch
HBM: traffic is one read of the encoder output + K/V tiles and one write of
the output. Keys are computed separately by the separable collapse
RoPE.pooled (naf_tpu/nn/rope.py) -- also without touching the H x W grid.

K/V union tiles are built host-side by a single 1 KB-row gather over a
cell-major source, RAW (no zero padding shipped through HBM); each head's
block-diag QK operand — head j's K occupying lanes [j*d, (j+1)*d) of its
g*d block (g = lcm(d,128)/d heads share q's aligned lane slice), zeros
elsewhere — is expanded in-VMEM on the MXU via a 0/1 diagonal matmul, so
the QK stays one 128-contraction matmul per head.

Inference-only (training grids are small; the modular path is used there).
Replaces: natten fused NA + the pool/rope glue around it
(reference src/layers/attentions.py:69-75, src/model/naf.py:34-51).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from naf_tpu.kernels.na2d_fused import _head_group
from naf_tpu.ops.pool import _pool_matrix

__all__ = ["naf_upsample_attention", "fused_q_applicable", "pick_geometry"]


def _ceil8(x: int) -> int:
    return -(-x // 8) * 8


def _pad_heads(a, n: int, d: int, dp: int):
    """(..., n*d) -> (..., n*dp): zero-pad each head's channels to dp."""
    if dp == d:
        return a
    sh = a.shape[:-1]
    a5 = a.reshape(*sh, n, d)
    a5 = jnp.pad(a5, ((0, 0),) * (a5.ndim - 1) + ((0, dp - d),))
    return a5.reshape(*sh, n * dp)


def _pad_tables(tab, n: int, d: int, dp: int):
    """RoPE table (L, 2*n*d) cos|sin -> (L, 2*n*dp), each half head-padded.

    Padded table lanes are ZERO, so q's padded lanes come out exactly zero
    (q = x*cos + rot*sin) regardless of what the padded x/rot lanes hold."""
    c = n * d
    return jnp.concatenate(
        [_pad_heads(tab[:, :c], n, d, dp), _pad_heads(tab[:, c:], n, d, dp)],
        axis=-1,
    )


# queries per in-kernel chunk; tunable (live f32 = ~n_heads * 2 * this * 512B)
_CHUNK_Q_BUDGET = 1024


def _head_pad(d: int, pool_identity: bool) -> int:
    """Padded per-head q/k width for the pool-up case.

    Pool-up programs zero-pad every head's d channels to dp = ceil128(d)
    lanes when that is STRICTLY smaller than the block-diag expansion
    g*d = lcm(d, 128): each head's QK becomes ONE lane-aligned
    (cq, dp) x (dp, 128) matmul — at d = 96 that is 3x fewer QK FLOPs (the
    dominant MXU cost at 2048^2 outputs). When dp == lcm(d, 128) (e.g.
    d = 64: both are 128) padding buys nothing and only inflates the
    enc/q/scratch lanes, so the block-diag layout stays. The identity-pool
    case also keeps the original layout: its q source is the
    full-resolution encoder output read straight from HBM, and re-laying it
    out would cost a full output-resolution HBM pass."""
    if pool_identity or d % 128 == 0:
        return d
    dp = -(-d // 128) * 128
    gd = d * 128 // math.gcd(d, 128)  # lcm: block-diag contraction width
    return dp if dp < gd else d


@functools.lru_cache(maxsize=512)
def pick_geometry(hq, wq, hi, wi, hk, wk, kernel, n, d, dv, itemsize=4):
    """Choose (bc_h, bc_w) cell-block sizes, or None if unsupported.

    Constraints:
      - integer cell ratios r = hq/hk, wq/wk; cell blocks divide the LR grid
      - union tile (bc_h+k-1)(bc_w+k-1) <= 128 (single lane group: QK and AV
        both run at the MXU's 128-lane floor)
      - bh*hi % hq == 0 and bw*wi % wq == 0 (integer input rows/cols per
        tile -> affine encoder blocks, tile-invariant pool-up pattern)
      - q-tile dims (bh, bw) multiples of 8 (Mosaic sublane rule)
    Preference: maximize cells per block (fewer programs), then squarer.
    """
    if hq % hk or wq % wk or hk < kernel or wk < kernel:
        return None
    d = _head_pad(d, (hi, wi) == (hq, wq))
    if n * d < 128 or (n * d) % 128:
        return None
    r_h, r_w = hq // hk, wq // wk
    best = None
    for bc_h in range(1, hk + 1):
        if hk % bc_h or bc_h + kernel - 1 > hk:
            continue
        bh = bc_h * r_h
        if bh % 8 or (bh * hi) % hq:
            continue
        for bc_w in range(1, wk + 1):
            if wk % bc_w or bc_w + kernel - 1 > wk:
                continue
            if (bc_h + kernel - 1) * (bc_w + kernel - 1) > 128:
                continue
            bw = bc_w * r_w
            if bw % 8 or (bw * wi) % wq:
                continue
            if bh * bw * (n * d + dv * n) * itemsize > 3 * 2 ** 20:  # q+out
                continue
            score = (bc_h * bc_w, -abs(bc_h - bc_w))
            if best is None or score > best[0]:
                best = (score, (bc_h, bc_w))
    return best[1] if best else None


def fused_q_applicable(hq, wq, hi, wi, hk, wk, kernel, n=4, d=64, dv=96,
                       itemsize=4):
    return pick_geometry(
        hq, wq, hi, wi, hk, wk, kernel, n, d, dv, itemsize
    ) is not None


@functools.lru_cache(maxsize=512)
def _cell_index_table(hk, wk, bc_h, bc_w, kernel, cell0=0, n_cells=None):
    """(nCH, nCW, 128) int32 cell indices into the flat (hk*wk + 1)-row
    source (last row zero) for every union tile; padded slots point at the
    zero row AND decode to tile-cell rows >= kb_h, so the window mask
    excludes them without a separate pad predicate. cell0/n_cells select a
    band of cell rows (banded execution); clamping uses the full hk so
    windows match the global rule."""
    kb_h = bc_h + kernel - 1
    kb_w = bc_w + kernel - 1
    nc = kb_h * kb_w
    nh = kernel // 2
    if n_cells is None:
        n_cells = hk - cell0
    row0 = np.clip(
        cell0 + np.arange(n_cells // bc_h) * bc_h - nh, 0, hk - kb_h
    )
    col0 = np.clip(np.arange(wk // bc_w) * bc_w - nh, 0, wk - kb_w)
    c = np.arange(128)
    t, s = c // kb_w, c % kb_w
    idx = (row0[:, None, None] + t) * wk + (col0[None, :, None] + s)
    idx = np.where(c < nc, idx, hk * wk)
    return idx.astype(np.int32)


def _build_tiles_q(k_scaled, v, g, bc_h, bc_w, kernel, cell0=0, n_cells=None,
                   idx=None):
    """Host-side K/V union tiles via one 1KB-row gather each.

    k_scaled: (b, hk, wk, n, d) with softmax scale folded in.
    idx: optional precomputed (traced) cell-index table — used by the
      spatially-sharded path, where the band origin is dynamic per device.
    Returns ONE combined (b, nCH, nCW, 128, n*d + n*dv) tile: RAW per-head
    K cell rows in lanes [0, n*d) and raw V cell rows in lanes [n*d, end);
    the kernel slices the two ranges in VMEM. The per-head block-diag QK
    operand (head j of a group occupying lanes [j*d, (j+1)*d) of a g*d
    block, zeros elsewhere) is expanded IN-KERNEL on the MXU via a 0/1
    diagonal matmul — gathering pre-expanded tiles shipped g x the K bytes
    through HBM twice (gather write + kernel read; ~0.27 GB/pass at
    448^2 -> 2048^2) for zeros the MXU can materialize for free.
    """
    b, hk, wk, n, d = k_scaled.shape
    dv = v.shape[-1]
    if idx is None:
        idx = jnp.asarray(
            _cell_index_table(hk, wk, bc_h, bc_w, kernel, cell0, n_cells)
        )

    # ONE gather for K and V together: the take's cost is per-row-overhead
    # dominated at these row sizes (CLAUDE.md: fine-grained XLA gathers run
    # far below the moved bytes), so gathering one (n*d + n*dv)-lane row
    # beats two takes of n*d- and n*dv-lane rows from the same index table.
    # The kernel slices the two lane ranges out of the combined tile in VMEM.
    src = jnp.pad(
        jnp.concatenate(
            [k_scaled.reshape(b, hk * wk, n * d),
             v.reshape(b, hk * wk, n * dv)], axis=-1,
        ),
        ((0, 0), (0, 1), (0, 0)),
    )
    return jnp.take(src, idx, axis=1)  # (b, nCH, nCW, 128, n*(d + dv))


def _kernel(
    enc_ref,   # (1, ih|bh, iwe|bw, C) VMEM encoder tile (Element blocks)
    kv_ref,    # (1, 1, 1, 128, n*dp + n*dv) VMEM combined K|V union tile
    rows_ref,  # (bh, 2C) VMEM row cos|sin table slice
    cols_ref,  # (bw, 2C) VMEM col cos|sin table slice
    o_ref,     # (1, bh, bw, n*dv) VMEM output tile
    xc_ref,    # scratch (ih, bw, C) f32 column-pooled rows (None if identity)
    xup_ref,   # scratch (bh, bw, C) io-dtype pooled-up tile (None if identity)
    col_pool_ref=None,  # (bw, iwe) f32 local col-pool matrix (None if identity)
    *,
    kernel_size: int,
    num_heads: int,
    group: int,
    r_h: int,
    r_w: int,
    bc_h: int,
    bc_w: int,
    hk: int,
    wk: int,
    chunk_rows: int,
    pool_identity: bool,
    row_taps: tuple,        # per out row: ((in_row, weight), ...) (static)
    rope_d_head: int = 64,  # RoPE head width (for rotate-half rolls)
    cell0: int = 0,         # first (global) cell row of this band
    w_tiles: int = 1,       # merged column tiles per program
    diag: str = "",         # timing-only ablations ("noexp"/"nomask"/"norope")
    rot_in_kernel: bool = False,  # enc arrives WITHOUT the pre-rotated copy
    cell0_ref=None,         # SMEM (1,) int32: dynamic band origin (sharded)
):
    kk = kernel_size
    nh = kk // 2
    kb_h = bc_h + kk - 1
    kb_w = bc_w + kk - 1
    c0 = cell0 if cell0_ref is None else cell0_ref[0]
    ci0 = c0 + pl.program_id(1) * bc_h
    row0 = jnp.clip(ci0 - nh, 0, hk - kb_h)

    n = num_heads
    g = group
    bh = bc_h * r_h
    bw = bc_w * r_w
    c_dim = rows_ref.shape[1] // 2
    gd = g * (c_dim // n)
    dv = (kv_ref.shape[-1] - c_dim) // n
    nc_pad = 128

    dtype = o_ref.dtype
    prec = (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    # ---- pieces shared across chunks and merged tiles ----
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, nc_pad), 1)
    t_idx = lane // kb_w
    s_idx = lane - t_idx * kb_w
    cq = chunk_rows * bw
    rows_c = jax.lax.broadcasted_iota(jnp.int32, (cq, 1), 0)
    i_loc = rows_c // bw
    j_loc = rows_c - i_loc * bw
    # Transposed-softmax layout: queries on lanes, union cells on sublanes.
    lane_q = jax.lax.broadcasted_iota(jnp.int32, (1, cq), 1)
    i_loc_t = lane_q // bw
    j_loc_t = lane_q - i_loc_t * bw
    sub_c = jax.lax.broadcasted_iota(jnp.int32, (nc_pad, 1), 0)
    t_idx_t = sub_c // kb_w
    s_idx_t = sub_c - t_idx_t * kb_w

    # Identity-pool only: rotate-half as two lane rolls + select:
    # rot[c] = -x[c + dh/2] for the first half of each rope head,
    # x[c - dh/2] for the second (both stay within the head, so whole-row
    # rolls are exact). The HBM-level code (nn/rope.py) uses a signed-
    # permutation matmul because channel slicing materializes tile-padded
    # minor-dim temporaries THERE; in VMEM the rolls are vreg shuffles.
    # In the POOL-UP case the rolls are gone entirely: rotate-half is a
    # signed channel permutation, so it commutes with the (per-channel,
    # linear) pool-up — the caller ships enc with a pre-rotated copy
    # concatenated on channels and both get pooled together (exact).
    dh2 = rope_d_head // 2
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c_dim), 2)
    first_half = (lane_c % rope_d_head) < dh2

    n_chunks = bh // chunk_rows
    for tt in range(w_tiles):
        cj0 = (pl.program_id(2) * w_tiles + tt) * bc_w
        col0 = jnp.clip(cj0 - nh, 0, wk - kb_w)
        cell_w = cj0 + j_loc // r_w
        ws_w = jnp.clip(cell_w - nh, 0, wk - kk) - col0
        ok_w = (s_idx >= ws_w) & (s_idx < ws_w + kk)  # (cq, nc_pad)
        bias_w = jnp.where(ok_w, 0.0, -1e30).astype(jnp.float32)
        cell_w_t = cj0 + j_loc_t // r_w
        ws_w_t = jnp.clip(cell_w_t - nh, 0, wk - kk) - col0  # (1, cq)
        ok_w_t = (s_idx_t >= ws_w_t) & (s_idx_t < ws_w_t + kk)
        # Column-window bias, chunk-invariant: built ONCE per column tile so
        # the per-chunk mask work shrinks to a broadcast add of the
        # (nc_pad, 1) row-window column (the full (nc_pad, cq) compare/
        # select chain per chunk was ~half the mask/bias VPU stage).
        bias_w_t = jnp.where(ok_w_t, 0.0, -1e30).astype(jnp.float32)

        cols_t = cols_ref[pl.ds(tt * bw, bw)]
        cos_c3 = cols_t[:, :c_dim][None]  # (1, bw, C)
        sin_c3 = cols_t[:, c_dim:][None]
        kv_t = kv_ref[0, 0, tt]   # (128, n*dp + n*dv) combined K|V rows
        k2_t = kv_t[:, :c_dim]    # (128, n*dp) RAW per-head cell rows
        v_t = kv_t[:, c_dim:]     # (128, n*dv)
        dp = c_dim // n
        if g == 1:
            # raw == block-diag when each head already fills its gd lanes
            kms = [k2_t[:, h * gd : (h + 1) * gd] for h in range(n)]
        else:
            # Per-head block-diag QK operands from the raw group tile, ON
            # THE MXU: km_h = kraw_p @ diag_j zeroes every lane outside
            # head j's [j*dp, (j+1)*dp) range while keeping its values in
            # place — exact (x*1), emitted in io dtype, chunk-invariant
            # (built once per column tile), and it keeps the operand path
            # MXU->MXU (a VPU where-mask here measured +2.2 ms in round 3).
            lane_i = jax.lax.broadcasted_iota(jnp.int32, (gd, gd), 0)
            lane_o = jax.lax.broadcasted_iota(jnp.int32, (gd, gd), 1)
            kms = []
            for h in range(n):
                p, j = divmod(h, g)
                kraw_p = k2_t[:, p * gd : (p + 1) * gd]  # (128, g*dp)
                diag_j = (
                    (lane_i == lane_o)
                    & (lane_o >= j * dp)
                    & (lane_o < (j + 1) * dp)
                ).astype(k2_t.dtype)
                kms.append(
                    jax.lax.dot_general(
                        kraw_p, diag_j,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec,
                    ).astype(k2_t.dtype)  # exact: each value is x*1
                )

        # ---- pool-up into the xup scratch (skipped when hi == hq) ----
        # BOTH RoPE table factors fold into the pool-up itself: the column
        # tables into the column-pool epilogue (xc channel layout is
        # (x | rot), cols_t is (cos_c | sin_c) — one (ih, bw, 2C) multiply),
        # and the row tables into the row-blend epilogue (the blend's f32
        # accumulator is already in registers, so q[o] = acc_x * cos_r[o] +
        # acc_rot * sin_r[o] costs two multiplies and one add over C lanes,
        # writes HALF the scratch, and leaves the chunk loop with ZERO RoPE
        # work — ablations measured the per-chunk rope at ~4 ms of VPU time
        # at 2048^2 outputs).
        if not pool_identity and diag != "nopool":
            ih = enc_ref.shape[2]
            pcol = col_pool_ref[...].astype(enc_ref.dtype)  # (bw, iwe)
            ctab = cols_t.astype(jnp.float32)  # (bw, 2C) = cos_c | sin_c
            first2 = (
                jax.lax.broadcasted_iota(jnp.int32, (1, c_dim), 1)
                % rope_d_head
            ) < dh2
            for r in range(ih):
                if diag == "nocolpool":  # timing ablation: skip the dots
                    xc_ref[r] = jnp.zeros_like(xc_ref[r])
                    continue
                xr = enc_ref[0, tt, r]  # (iwe, C or 2C)
                if rot_in_kernel:
                    # Build the rotated copy HERE, on the tiny low-res input
                    # row, instead of shipping it from HBM: halves the enc
                    # stream and the host-side stacked layout. Rolls are
                    # exact (rotate-half is a signed permutation within each
                    # rope head; see the identity-path note below).
                    if xr.dtype == jnp.bfloat16:
                        xi = pltpu.bitcast(xr, jnp.int32)
                        r1 = pltpu.bitcast(
                            pltpu.roll(xi, c_dim - dh2, 1), jnp.bfloat16
                        )
                        r2 = pltpu.bitcast(
                            pltpu.roll(xi, dh2, 1), jnp.bfloat16
                        )
                    else:
                        r1 = pltpu.roll(xr, c_dim - dh2, 1)
                        r2 = pltpu.roll(xr, dh2, 1)
                    rot_r = jnp.where(first2, -r1, r2).astype(xr.dtype)
                    xr = jnp.concatenate([xr, rot_r], axis=-1)  # (iwe, 2C)
                xc_ref[r] = jax.lax.dot_general(
                    pcol, xr,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                ) * ctab
            for o in range(0 if diag == "norowblend" else bh):
                taps = row_taps[o]
                acc = taps[0][1] * xc_ref[taps[0][0]]
                for i, wgt in taps[1:]:
                    acc = acc + wgt * xc_ref[i]
                if diag == "norope":
                    q_o = acc[:, :c_dim]
                else:
                    q_o = (
                        acc[:, :c_dim] * rows_ref[o, :c_dim]
                        + acc[:, c_dim:] * rows_ref[o, c_dim:]
                    )
                xup_ref[o] = q_o.astype(dtype)

        for ck in range(n_chunks):
            o0 = ck * chunk_rows
            if pool_identity:
                x3 = enc_ref[0, pl.ds(o0, chunk_rows), pl.ds(tt * bw, bw)]
                # ---- RoPE (identity pool only; the pool-up case folds BOTH
                # table factors into the pool epilogues above) ----
                if diag == "norope":
                    q3 = x3
                else:
                    cos_r3 = rows_ref[pl.ds(o0, chunk_rows), :c_dim][:, None]
                    sin_r3 = rows_ref[pl.ds(o0, chunk_rows), c_dim:][:, None]
                    # rotate-half via lane rolls. Mosaic's rotate only
                    # handles 32-bit lanes; for bf16 the sublane-packed i32
                    # VIEW (pltpu.bitcast packs the second-minor dim, lanes
                    # unchanged) rolls channel PAIRS-of-rows as one word, so
                    # a lane-roll of the view is bit-exactly the bf16
                    # channel roll — no f32 widening pass per chunk.
                    if x3.dtype == jnp.bfloat16:
                        xi = pltpu.bitcast(x3, jnp.int32)
                        r1 = pltpu.bitcast(
                            pltpu.roll(xi, c_dim - dh2, 2), jnp.bfloat16
                        )
                        r2 = pltpu.bitcast(
                            pltpu.roll(xi, dh2, 2), jnp.bfloat16
                        )
                        rot = jnp.where(first_half, -r1, r2)
                    else:
                        x3f = x3.astype(jnp.float32)
                        r1 = pltpu.roll(x3f, c_dim - dh2, 2)  # x[c + dh/2]
                        r2 = pltpu.roll(x3f, dh2, 2)          # x[c - dh/2]
                        rot = jnp.where(first_half, -r1, r2).astype(x3.dtype)
                    q3 = x3 * (cos_r3 * cos_c3) + rot * (sin_r3 * sin_c3)
            else:
                q3 = xup_ref[pl.ds(o0, chunk_rows)]  # ready-made queries
            q2 = q3.reshape(cq, c_dim)

            if dtype != jnp.float32:
                # ---- bf16 fast path: TRANSPOSED softmax ----
                # Logits live as (union cells, queries): K is the dot LHS, so
                # the softmax denominator is a SUBLANE reduction (one
                # vreg-add per 8 cells — ~10x fewer vreg ops than the lane
                # tree-reduce, measured 15.7 -> 12.3 ms at 448^2->2048^2),
                # the 1/sum broadcast rides sublanes for free, and the AV
                # matmul contracts dim 0 of both operands (the MXU-natural
                # stationary layout). Logits are bounded (RoPE'd encodings,
                # scale folded) so no max pass: exp2 never overflows and the
                # masked -1e30 underflows to exactly 0. The caller folds
                # log2(e) into the K scale so exp2 here IS the natural-base
                # softmax (base-invariant under that rescale).
                if chunk_rows <= r_h:
                    # one cell row per chunk: ws_h is a scalar, ok_h_t a
                    # (nc_pad, 1) column — the bias add below broadcasts it
                    cell_h0 = ci0 + (o0 // r_h)
                    ws_h = jnp.clip(cell_h0 - nh, 0, hk - kk) - row0
                    ok_h_t = (t_idx_t >= ws_h) & (t_idx_t < ws_h + kk)
                else:
                    cell_h_t = ci0 + (o0 + i_loc_t) // r_h
                    ws_h_t = jnp.clip(cell_h_t - nh, 0, hk - kk) - row0
                    ok_h_t = (t_idx_t >= ws_h_t) & (t_idx_t < ws_h_t + kk)
                # NOTE round-5 negative results (measured, reverted): (a)
                # replacing the f32 bias add with a bf16 0/1 mask multiply
                # post-exp plus an MXU softmax sum lost 1.4-3.9 ms — an N=1
                # ones-column sum dot pads N to 128 lanes (a full AV-matmul
                # cost per head), and even the M=1 ones-row variant plus
                # bf16 normalize was net slower than this VPU formulation.
                bias_t = bias_w_t + jnp.where(
                    ok_h_t, 0.0, -1e30
                ).astype(jnp.float32)  # (nc_pad, cq); -2e30 masks like -1e30
                if diag == "nomask":
                    bias_t = jnp.zeros_like(bias_t)
                lts = []
                for h in range(n):
                    p = h // g
                    qg = q2[:, p * gd : (p + 1) * gd]
                    km = kms[h]  # (128, gd)
                    if diag == "noqk":  # timing ablation: skip QK matmuls
                        lts.append(jnp.sum(qg) + bias_t)
                        continue
                    lt = jax.lax.dot_general(
                        km, qg,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec,
                    )
                    if diag != "nobias":  # timing ablation: skip bias adds
                        lt = lt + bias_t
                    lts.append(lt)
                outs = []
                for h in range(n):
                    vm = v_t[:, h * dv : (h + 1) * dv]  # (128, dv)
                    if diag == "noexp":  # timing ablation: skip exp+sum+norm
                        en = (lts[h] * 1e-4).astype(vm.dtype)
                        outs.append(
                            jax.lax.dot_general(
                                en, vm,
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec,
                            ).astype(o_ref.dtype)
                        )
                        continue
                    e = jnp.exp2(lts[h])
                    if diag == "nosum":  # timing floor: skip sum+normalize
                        en = e.astype(vm.dtype)
                    else:
                        s = jnp.sum(e, axis=0, keepdims=True)  # (1, cq)
                        en = (e * (1.0 / s)).astype(vm.dtype)
                    outs.append(
                        jax.lax.dot_general(
                            en, vm,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec,
                        ).astype(o_ref.dtype)
                    )
                out = jnp.concatenate(outs, axis=-1) if n > 1 else outs[0]
                o_ref[0, pl.ds(o0, chunk_rows), pl.ds(tt * bw, bw)] = (
                    out.reshape(chunk_rows, bw, n * dv).astype(o_ref.dtype)
                )
                continue

            # ---- f32 path (bit-parity with the oracle's natural exp) ----
            # When the chunk spans exactly one LR cell row (chunk_rows ==
            # r_h at high ratios), every query shares the same window row:
            # ws_h is a per-chunk scalar and ok_h a (1, nc) row vector.
            if chunk_rows <= r_h:
                cell_h0 = ci0 + (o0 // r_h)
                ws_h = jnp.clip(cell_h0 - nh, 0, hk - kk) - row0
                ok_h = (t_idx >= ws_h) & (t_idx < ws_h + kk)  # (1, nc_pad)
            else:
                cell_h = ci0 + (o0 + i_loc) // r_h
                ws_h = jnp.clip(cell_h - nh, 0, hk - kk) - row0
                ok_h = (t_idx >= ws_h) & (t_idx < ws_h + kk)
            bias = bias_w + jnp.where(ok_h, 0.0, -1e30).astype(jnp.float32)
            if diag == "nomask":
                bias = jnp.zeros_like(bias)

            # ---- per-head NA (all QK issued before softmax/AV) ----
            logits = []
            for h in range(n):
                p = h // g
                qg = q2[:, p * gd : (p + 1) * gd]
                km = kms[h]  # (128, gd)
                if diag == "noqk":  # timing ablation: skip the QK matmuls
                    logits.append(qg[:, :1] + bias)
                    continue
                logits.append(
                    jax.lax.dot_general(
                        qg, km,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec,
                    ) + bias
                )
            outs = []
            for h in range(n):
                vm = v_t[:, h * dv : (h + 1) * dv]  # (128, dv)
                m = jnp.max(logits[h], axis=-1, keepdims=True)
                e = jnp.exp(logits[h] - m)
                pn = e / jnp.sum(e, axis=-1, keepdims=True)
                outs.append(
                    jax.lax.dot_general(
                        pn.astype(vm.dtype), vm,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec,
                    )
                )
            out = jnp.concatenate(outs, axis=-1) if n > 1 else outs[0]
            o_ref[0, pl.ds(o0, chunk_rows), pl.ds(tt * bw, bw)] = out.reshape(
                chunk_rows, bw, n * dv
            ).astype(o_ref.dtype)


def _row_taps(hi: int, hq: int, bh: int, ih: int):
    """Static per-output-row pool-up taps ((in_row, weight), ...) for one
    tile; identical for every tile because bh * hi % hq == 0."""
    mat = _pool_matrix(hi, hq)[:bh, :ih]
    taps = []
    for o in range(bh):
        nz = np.nonzero(mat[o])[0]
        taps.append(tuple((int(i), float(mat[o, i])) for i in nz))
    return tuple(taps)


def _pick_w_tiles(n_cw, bh, bw, c, dv, n, gd, ih, iwe, pool_identity,
                  itemsize, rot_in_kernel=False):
    """Largest column-tile merge factor that fits the VMEM budget.

    Merging tt adjacent column tiles into one program cuts the program count
    tt-fold (per-program fixed cost dominated ~20% of the 448^2->2048^2
    kernel time at 2048 programs) and doubles the K/V DMA granularity. The
    budget models Pallas's double-buffered in/out blocks plus the scratch
    and the f32 logits/AV values live during the per-head loop.

    When the wt=1 output tile is already DMA-sized (>= 1 MB), merging only
    adds VMEM pressure: the round-5 geometry sweep at 448^2 -> 2048^2 r16
    bf16 (tools/fusedq_geom_sweep.py, 1.5 MB tiles) measured wt=1 at
    10.56 ms vs wt=2 at 10.67 ms and wt=4 failing to compile — the
    per-program fixed cost that merging amortized is gone since the
    transposed-softmax rewrite."""
    if bh * bw * n * dv * itemsize >= 2**20:
        return 1
    live_f32 = (n + 2) * _CHUNK_Q_BUDGET * 128 * 4
    for wt in (4, 2, 1):
        if n_cw % wt:
            continue
        out_b = bh * wt * bw * n * dv * itemsize
        enc_b = (
            # rotated copy built in-kernel (dp == d) or shipped from HBM
            wt * ih * iwe * (c if rot_in_kernel else 2 * c) * itemsize
            if not pool_identity
            else bh * wt * bw * c * itemsize
        )
        kv_b = wt * 128 * (n * gd + n * dv) * itemsize
        tabs_b = (bh + wt * bw) * 2 * c * itemsize
        scratch = (
            0
            if pool_identity
            else (ih * bw * 2 * c * 4 + bh * bw * c * itemsize)
        )
        use = 2 * (out_b + enc_b + kv_b + tabs_b) + scratch + live_f32
        if use < 13 * 2**20:
            return wt
    return 1


def _fused_q_twin(enc, keys, values, rows_tab, cols_tab, rope_d_head,
                  num_heads, kernel_size, scale):
    """Differentiation-surface twin of the fused kernel: pool-up -> RoPE
    from the separable tables -> NA. The NA stage is the fused Pallas NA
    (whose OWN custom VJP is the Pallas recompute-P backward kernel) when
    its tiling applies, else the row-blocked checkpointed oracle
    (ops/na2d.py) — so jax.vjp of this twin runs the fast kernels in both
    directions and only the pool/RoPE glue differentiates through XLA."""
    from naf_tpu.kernels.na2d_fused import (
        cross_scale_na2d_fused,
        fused_applicable,
    )
    from naf_tpu.nn.rope import _rotate_half_matrix
    from naf_tpu.ops.na2d import cross_scale_na2d
    from naf_tpu.ops.pool import adaptive_avg_pool2d

    b, hi, wi, c = enc.shape
    hq, wq = rows_tab.shape[0], cols_tab.shape[0]
    _, hk, wk, _ = keys.shape
    n = num_heads
    d = c // n
    dv = values.shape[-1] // n
    xu = adaptive_avg_pool2d(enc, (hq, wq))
    rmat = jnp.asarray(
        _rotate_half_matrix(c // rope_d_head, rope_d_head), xu.dtype
    )
    rot = jnp.einsum("bhwc,cd->bhwd", xu, rmat)
    cos = rows_tab[:, :c][None, :, None, :] * cols_tab[:, :c][None, None]
    sin = rows_tab[:, c:][None, :, None, :] * cols_tab[:, c:][None, None]
    q = xu * cos.astype(xu.dtype) + rot * sin.astype(xu.dtype)
    q5 = q.reshape(b, hq, wq, n, d)
    k5 = keys.reshape(b, hk, wk, n, d)
    v5 = values.reshape(b, hk, wk, n, dv)
    if (
        jax.default_backend() == "tpu"
        and hq % hk == 0
        and wq % wk == 0
        and fused_applicable(hq, wq, hk, wk, kernel_size, n, d, dv,
                             q.dtype.itemsize)
    ):
        out = cross_scale_na2d_fused(q5, k5, v5, kernel_size, scale=scale)
    else:
        out = cross_scale_na2d(q5, k5, v5, kernel_size, scale=scale)
    return out.reshape(b, hq, wq, n * dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _fused_q_diff(enc, keys, values, rows_tab, cols_tab, rope_d_head,
                  num_heads, kernel_size, scale, interpret):
    return _fused_q_impl(
        enc, keys, values, rows_tab, cols_tab, rope_d_head,
        num_heads=num_heads, kernel_size=kernel_size, scale=scale,
        interpret=interpret,
    )


def _fused_q_diff_fwd(enc, keys, values, rows_tab, cols_tab, rope_d_head,
                      num_heads, kernel_size, scale, interpret):
    out = _fused_q_diff(
        enc, keys, values, rows_tab, cols_tab, rope_d_head, num_heads,
        kernel_size, scale, interpret,
    )
    return out, (enc, keys, values, rows_tab, cols_tab)


def _fused_q_diff_bwd(rope_d_head, num_heads, kernel_size, scale, interpret,
                      res, g):
    enc, keys, values, rows_tab, cols_tab = res
    _, vjp = jax.vjp(
        lambda e, k, v, rt, ct: _fused_q_twin(
            e, k, v, rt, ct, rope_d_head, num_heads, kernel_size, scale
        ),
        enc, keys, values, rows_tab, cols_tab,
    )
    return vjp(g)


_fused_q_diff.defvjp(_fused_q_diff_fwd, _fused_q_diff_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("rope_d_head", "num_heads", "kernel_size", "scale",
                     "interpret", "geometry", "row_cell0", "band_cells",
                     "w_tiles", "enc_banded", "_diag", "full_hq"),
)
def naf_upsample_attention(
    enc, keys, values, rows_tab, cols_tab, rope_d_head=64, *,
    num_heads: int, kernel_size: int, scale=None, interpret: bool = False,
    geometry=None, row_cell0: int = 0, band_cells=None, out_acc=None,
    w_tiles=None, enc_banded: bool = False, _diag: str = "",
    cell0_array=None, idx_table=None, full_hq=None,
):
    """Public entry. The standard full-grid call is differentiable (custom
    VJP through the pure-XLA twin — reference trains through this attention,
    src/layers/attentions.py:69-75); banded/aliased/diag variants are
    inference-only and dispatch straight to the kernel."""
    plain = (
        row_cell0 == 0
        and band_cells is None
        and out_acc is None
        and not enc_banded
        and w_tiles is None
        and geometry is None
        and _diag == ""
        and cell0_array is None
    )
    if plain:
        d = enc.shape[-1] // num_heads
        return _fused_q_diff(
            enc, keys, values, rows_tab, cols_tab, rope_d_head, num_heads,
            kernel_size,
            float(scale) if scale is not None else d ** -0.5,
            interpret,
        )
    return _fused_q_impl(
        enc, keys, values, rows_tab, cols_tab, rope_d_head,
        num_heads=num_heads, kernel_size=kernel_size, scale=scale,
        interpret=interpret, geometry=geometry, row_cell0=row_cell0,
        band_cells=band_cells, out_acc=out_acc, w_tiles=w_tiles,
        enc_banded=enc_banded, _diag=_diag, cell0_array=cell0_array,
        idx_table=idx_table, full_hq=full_hq,
    )


def _fused_q_impl(
    enc, keys, values, rows_tab, cols_tab, rope_d_head=64, *,
    num_heads: int, kernel_size: int, scale=None, interpret: bool = False,
    geometry=None, row_cell0: int = 0, band_cells=None, out_acc=None,
    w_tiles=None, enc_banded: bool = False, _diag: str = "",
    cell0_array=None, idx_table=None, full_hq=None,
):
    """Fused pool-up + RoPE + cross-scale NA.

    Args:
      enc: (B, hi, wi, C) encoder output (pre pool-up, pre RoPE).
      keys: (B, hk, wk, C) RoPE'd pooled keys (from RoPE.pooled).
      values: (B, hk, wk, Cv) raw LR features.
      rows_tab/cols_tab: (H, 2C) / (W, 2C) concatenated cos|sin RoPE tables
        for the output grid (RoPE.tables output, cast to enc dtype).
      rope_d_head: RoPE head width (rotate-half pairs channels +-d/2 apart
        within each head; applied in-kernel by lane rolls).
      row_cell0/band_cells: banded execution — compute only LR cell rows
        [row_cell0, row_cell0 + band_cells) of the output (global window
        rule; bounds the K/V tile footprint for >3K outputs).
      out_acc: optional (B, H, W, Cv) buffer ALIASED into the output; the
        band's rows are written in place and every other row keeps its
        prior contents. This is what makes 4096^2 fit: the 12.9 GB output
        plus a separate band buffer would exceed HBM.
      enc_banded: `enc` holds ONLY the band's encoder rows (exactly the
        input rows feeding output cell rows [row_cell0, row_cell0 +
        band_cells)) instead of the full grid — the full-resolution encoder
        output never needs to exist (banded two-pass encoder,
        naf_tpu/kernels/encoder_banded.py). Requires band_cells.
      cell0_array: DYNAMIC band origin (int32 scalar array) — the
        spatially-sharded path (naf_tpu/parallel.py): one traced program
        serves every device, each seeing its own global first cell row via
        SMEM. Requires band_cells, enc_banded-style local inputs (band-local
        enc and rows_tab slices, row_cell0 == 0), idx_table, and full_hq.
      idx_table: precomputed (traced) gather table for the band's K/V union
        tiles — (nCH_local, nCW, 128) int32, a dynamic row-slice of the
        full-grid `_cell_index_table`.
      full_hq: global output height when rows_tab is a band-local slice.
    Returns: (B, H, W, Cv) — or, without out_acc, the banded
      (B, band_cells * r_h, W, Cv) slab.
    """
    _KNOWN_DIAG = {"", "nopool", "nocolpool", "norowblend", "norope",
                   "noqk", "nomask", "nosum",
                   "nobias", "noexp"}
    if _diag not in _KNOWN_DIAG:
        # An unknown ablation flag would silently time the FULL kernel while
        # being reported as a stage floor (tools/fusedq_floor.py).
        raise ValueError(f"unknown _diag={_diag!r}; known: {sorted(_KNOWN_DIAG)}")
    if cell0_array is not None and (
        row_cell0 != 0 or band_cells is None or idx_table is None
        or full_hq is None
    ):
        raise ValueError(
            "cell0_array (sharded band mode) requires row_cell0=0, "
            "band_cells, idx_table, and full_hq"
        )
    b, hi, wi, c = enc.shape
    hq = full_hq if full_hq is not None else rows_tab.shape[0]
    wq = cols_tab.shape[0]
    _, hk, wk, _ = keys.shape
    cv = values.shape[-1]
    kk = kernel_size
    n = num_heads
    d = c // n
    dv = cv // n
    if scale is None:
        scale = d ** -0.5
    hi_full = hi
    if enc_banded:
        if band_cells is None:
            raise ValueError("enc_banded requires band_cells")
        out_rows = band_cells * (hq // hk)
        if (hi * hq) % out_rows:
            raise ValueError(
                f"banded enc rows {hi} do not divide evenly into the "
                f"band's {out_rows} output rows at ratio {hq}/{hi}"
            )
        hi_full = hi * hq // out_rows
    geom = geometry or pick_geometry(hq, wq, hi_full, wi, hk, wk, kk, n, d,
                                     dv, enc.dtype.itemsize)
    if geom is None:
        raise ValueError(
            "shapes not supported by fused-q kernel; use the modular path"
        )
    bc_h, bc_w = geom
    r_h, r_w = hq // hk, wq // wk
    bh, bw = bc_h * r_h, bc_w * r_w
    pool_identity = (hi_full, wi) == (hq, wq)
    # Pool-up: zero-pad each head's q/k channels to dp lanes (g collapses to
    # 1) — per-head QK contracts over dp <= lcm(d, 128) lanes; 3x fewer QK
    # FLOPs at d = 96. Padded k lanes are zero, so the extra lanes
    # contribute exactly nothing to the logits.
    dp = _head_pad(d, pool_identity)
    g = _head_group(n, dp)
    gd = g * dp
    n_ch, n_cw = hk // bc_h, wk // bc_w

    dtype = enc.dtype
    k5 = keys.reshape(b, hk, wk, n, d)
    if dp != d:
        k5 = jnp.pad(k5, ((0, 0),) * 4 + ((0, dp - d),))
        rows_tab = _pad_tables(rows_tab, n, d, dp)
        cols_tab = _pad_tables(cols_tab, n, d, dp)
    # bf16 path: fold log2(e) into the K scale — the kernel then applies the
    # hardware-native exp2 directly (softmax is invariant under the base
    # change). f32 path keeps natural-base logits for bit-parity with the
    # oracle's exp.
    kscale = float(scale) * (
        1.0 if dtype == jnp.float32 else 1.4426950408889634
    )
    k_scaled = (k5.astype(jnp.float32) * kscale).astype(dtype)
    if band_cells is None:
        band_cells = hk - row_cell0
    if row_cell0 % bc_h or band_cells % bc_h:
        raise ValueError(
            f"band bounds must be multiples of the cell block ({bc_h})"
        )
    n_ch = band_cells // bc_h
    blk_off = row_cell0 // bc_h
    out_h = band_cells * r_h

    kv = _build_tiles_q(
        k_scaled, values.reshape(b, hk, wk, n, dv).astype(dtype),
        g, bc_h, bc_w, kk, row_cell0, band_cells, idx=idx_table,
    )

    rot_in_kernel = False
    if pool_identity:
        ih, iw, iwe = bh, bw, bw
        col_pool = None
        row_taps = None
    else:
        ih = (bh * hi_full) // hq
        iw = (bw * wi) // wq
        iwe = _ceil8(iw)
        col_pool = np.pad(_pool_matrix(wi, wq)[:bw, :iw], ((0, 0), (0, iwe - iw)))
        row_taps = _row_taps(hi_full, hq, bh, ih)
        # rotate-half commutes with the per-channel pool-up. When heads are
        # unpadded (dp == d) the rotated copy is built IN-KERNEL from the
        # tiny low-res input row (lane rolls within each rope head — exact,
        # a signed permutation), halving both the host-side stacked layout
        # and the enc HBM stream. Head padding breaks the within-head roll
        # geometry, so the dp != d case keeps the host-side pre-rotated
        # concat (pad both, then pool both together).
        rot_in_kernel = dp == d
        if not rot_in_kernel:
            from naf_tpu.nn.rope import _rotate_half_matrix

            rmat = jnp.asarray(
                _rotate_half_matrix(c // rope_d_head, rope_d_head), dtype
            )
            rot = jnp.einsum("bhwc,cd->bhwd", enc, rmat)
            enc = _pad_heads(enc, n, d, dp)
            rot = _pad_heads(rot, n, d, dp)
            enc = jnp.concatenate([enc, rot], axis=-1)  # (b, hi, wi, 2C')
    c = n * dp  # padded working channel count (== C when dp == d)
    if enc_banded and hi != (band_cells // bc_h) * ih:
        raise ValueError(
            f"banded enc must hold exactly the band's input rows: expected "
            f"{(band_cells // bc_h) * ih}, got {hi}"
        )

    if w_tiles is None:
        w_tiles = _pick_w_tiles(
            n_cw, bh, bw, c, dv, n, gd // g, ih, iwe, pool_identity,
            enc.dtype.itemsize, rot_in_kernel,
        )
    wt = w_tiles

    enc_off = 0 if enc_banded else blk_off
    if pool_identity:
        enc_spec = pl.BlockSpec(
            (1, bh, wt * bw, c), lambda bb, ii, jj: (bb, ii + enc_off, jj, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        # Mosaic requires sublane-tile-aligned block offsets, and iw is
        # rarely 8-divisible; pre-slice the (cheap, low-res) encoder output
        # into a per-tile-column layout so every block index is regular.
        # (Round-5 negative result, measured and reverted: reading the flat
        # enc via 8-aligned pl.Element superset blocks with per-tile
        # shifted pool matrices removes this stack pass from HBM but times
        # 13.7 vs 13.5 ms at 448^2->2048^2 — the Element-block pipeline
        # penalty outweighs the saved pass, consistent with the halo-tile
        # finding in kernels/encoder_fused.py.)
        need_w = (n_cw - 1) * iw + iwe
        if need_w > wi:
            enc = jnp.pad(enc, ((0, 0), (0, 0), (0, need_w - wi), (0, 0)))
        enc = jnp.stack(
            [enc[:, :, jj * iw : jj * iw + iwe] for jj in range(n_cw)],
            axis=1,
        )  # (b, n_cw, hi, iwe, C)
        enc_spec = pl.BlockSpec(
            (1, wt, ih, iwe, c if rot_in_kernel else 2 * c),
            lambda bb, ii, jj: (bb, jj, ii + enc_off, 0, 0),
            memory_space=pltpu.VMEM,
        )

    # chunk_rows: largest multiple of r_h dividing bh with a bounded query
    # count per chunk (bounds the live f32 logits/AV buffers). The identity-
    # pool f32 case halves the budget: its in-chunk rotate-half keeps ~5
    # channel-wide f32 intermediates live (x3f, two rolls, rot, q3) that the
    # pool-up case precomputes into scratch — at 1024 queries x 384 lanes
    # that is ~8 MB the VMEM model never sees (measured: 17.17M scoped-vmem
    # OOM at 448^2/r16 f32, fine in bf16 where the blocks are half-size).
    budget = _CHUNK_Q_BUDGET
    if pool_identity and dtype == jnp.float32:
        budget = _CHUNK_Q_BUDGET // 2
    chunk_rows = r_h
    for m in range(bc_h, 0, -1):
        if bc_h % m == 0 and m * r_h * bw <= budget:
            chunk_rows = m * r_h
            break

    rows_spec = pl.BlockSpec(
        (bh, 2 * c), lambda bb, ii, jj: (ii + blk_off, 0),
        memory_space=pltpu.VMEM,
    )
    cols_spec = pl.BlockSpec(
        (wt * bw, 2 * c), lambda bb, ii, jj: (jj, 0), memory_space=pltpu.VMEM
    )
    tile_spec = lambda ch: pl.BlockSpec(
        (1, 1, wt, 128, ch), lambda bb, ii, jj: (bb, ii, jj, 0, 0),
        memory_space=pltpu.VMEM,
    )

    scratch = []
    if not pool_identity:
        scratch = [
            pltpu.VMEM((ih, bw, 2 * c), jnp.float32),
            pltpu.VMEM((bh, bw, c), dtype),  # ready-made (RoPE'd) queries
        ]

    def kern(*refs):
        if out_acc is not None:
            refs = refs[:n_live_in] + refs[n_live_in + 1 :]  # drop alias ref
        c0_r = None
        if cell0_array is not None:
            c0_r = refs[n_c0]
            refs = refs[:n_c0] + refs[n_c0 + 1 :]
        if pool_identity:
            enc_r, kv_r, rows_r, cols_r, o_r = refs
            xc_r = xup_r = pcol_r = None
        else:
            (enc_r, kv_r, rows_r, cols_r, pcol_r, o_r,
             xc_r, xup_r) = refs
        _kernel(
            enc_r, kv_r, rows_r, cols_r, o_r, xc_r, xup_r,
            pcol_r,
            kernel_size=kk, num_heads=n, group=g, r_h=r_h, r_w=r_w,
            bc_h=bc_h, bc_w=bc_w, hk=hk, wk=wk, chunk_rows=chunk_rows,
            pool_identity=pool_identity, row_taps=row_taps,
            rope_d_head=rope_d_head, cell0=row_cell0, w_tiles=wt, diag=_diag,
            rot_in_kernel=rot_in_kernel, cell0_ref=c0_r,
        )

    in_specs = [
        enc_spec,
        # combined K|V union tile: RAW K cell rows (dp lanes per head) then
        # raw V cell rows — one gather, one input stream
        tile_spec(n * (gd // g) + n * dv),
        rows_spec,
        cols_spec,
    ]
    inputs = [enc, kv, rows_tab.astype(dtype), cols_tab.astype(dtype)]
    if not pool_identity:
        in_specs.append(
            pl.BlockSpec((bw, iwe), lambda bb, ii, jj: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(jnp.asarray(col_pool, jnp.float32))

    n_c0 = len(inputs)
    if cell0_array is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(cell0_array, jnp.int32).reshape(1))

    n_live_in = len(inputs)
    aliases = {}
    if out_acc is not None:
        # band writes land at their global rows of the ALIASED full buffer;
        # rows outside the band are never touched and keep their contents
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        inputs.append(out_acc)
        aliases = {n_live_in: 0}
        out_spec = pl.BlockSpec(
            (1, bh, wt * bw, n * dv),
            lambda bb, ii, jj: (bb, ii + blk_off, jj, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(out_acc.shape, dtype)
    else:
        out_spec = pl.BlockSpec(
            (1, bh, wt * bw, n * dv), lambda bb, ii, jj: (bb, ii, jj, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((b, out_h, wq, n * dv), dtype)

    out = pl.pallas_call(
        kern,
        grid=(b, n_ch, n_cw // wt),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            # every program owns a disjoint output tile; parallel semantics
            # let Mosaic pipeline the grid instead of serializing it
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(*inputs)
    return out
