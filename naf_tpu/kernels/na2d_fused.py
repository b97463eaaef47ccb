"""Fused cross-scale neighborhood attention — Pallas TPU kernel.

Replaces the natten CUDA dependency of the reference (src/layers/
attentions.py:69-72). The reference nearest-exact-upsamples K/V to the output
resolution and runs dilated NA; for exact integer ratios r = H/h this is
equivalent to each low-res *cell* (r x r queries) attending a k x k window of
LR cells starting at clamp(c - k//2, 0, l - k) per axis (proof: tests/
test_window.py::test_cross_scale_exact_ratio_collapses_to_lr_window).

Two-stage design:

1. An XLA gather pass assembles, for every (BCh x BCw) cell block, the union
   K/V tile of its windows: (BCh+k-1) x (BCw+k-1) LR cells. LR grids are
   small (that is NAF's premise), so this costs one pass over a few tens of
   MB — while the big arrays (Q, out, and the reference's upsampled K/V, an
   O(H*W*dim) memory tax) are never gathered or materialized at HR.

2. The Pallas kernel runs one program per (batch, cell block):
     logits = Q tile @ K tile^T on the MXU (f32 accum)
     + additive window mask (each query sees exactly its own k x k cells)
     f32 softmax; out = P @ V tile on the MXU.
   Queries are processed in row-chunks to bound the f32 logits buffer.

Layout rules (the hard-won part). The big arrays stay FLAT NHWC end to end:
Q blocks are (1, bh, bw, n*d) and out blocks (1, bh, bw, n*dv) — lane dims
that are multiples of 128, so no transposes and no (8,128)-tile padding.
(Head-split 5-D layouts like (B, H, W, 4, 64) pay 2-4x HBM padding at 2K+
resolutions, and head-major transposes cost two full passes over HBM.)
Per-head lane slicing at d=64 offsets is not Mosaic-legal, so heads are
processed in GROUPS of g = lcm(d,128)/d: the q slice [p*g*d, (p+1)*g*d) is
128-aligned, and K union tiles are assembled host-side as a block-diagonal
(g*nc_pad, g*d) matrix per group — one full-MXU-depth matmul yields the g
heads' logits side by side, bit-exact, with zero FLOP waste relative to the
lane-padded per-head alternative. nc is padded to a 128 multiple with zero
rows (masked out) so per-head softmax/AV slices are 128-aligned too.

The masked-union formulation trades a small FLOP overcount
((BC+k-1)^2 / k^2, lane-padded) for pure-MXU compute with zero in-kernel
gathers; the block picker's cost model balances that against per-program
overhead, Q/out HBM traffic, and VMEM.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cross_scale_na2d_fused", "fused_applicable", "pick_cell_blocks"]


def _valid_bcs(r: int, l: int, kernel: int):
    """Valid cells-per-block values along one axis: (bc*r) % 8 == 0 and the
    (bc + k - 1) union tile fits in the LR grid."""
    m = 8 // math.gcd(r, 8)
    max_bc = l - kernel + 1
    return [bc for bc in range(m, max(max_bc, m) + 1, m) if bc + kernel - 1 <= l]


def _head_group(n: int, d: int):
    """Heads per in-kernel group: smallest g dividing n with g*d a lane
    multiple (128), so the q slice for a group is Mosaic-aligned. Falls back
    to g=n (single group, no slicing) when no such g exists or C <= 128."""
    if (n * d) <= 128:
        return n
    for g in range(1, n + 1):
        if n % g == 0 and (g * d) % 128 == 0:
            return g
    return n


def _pad128(x: int) -> int:
    return -(-x // 128) * 128


def _legacy_chunk_rows(r_h, bh, bw, n, g, nc_pad, dv):
    """Historical chunk_rows: largest multiple of r_h keeping all groups'
    f32 logits + per-head AV outputs under ~2.5 MB. This is the choice every
    previously-covered config was tuned with — do not perturb it."""
    f32_lanes = (n // g) * g * nc_pad + n * _pad128(dv)
    budget_rows = max((2_500_000 // 4) // max(f32_lanes * bw, 1), 1)
    chunk_rows = min(max((budget_rows // r_h) * r_h, r_h), bh)
    while bh % chunk_rows:
        chunk_rows -= r_h
    return chunk_rows


@functools.lru_cache(maxsize=512)
def _pick_fwd(r_h, r_w, hk, wk, kernel, n, d, dv, itemsize,
              vmem_budget=10 * 2 ** 20):
    """Choose (bc_h, bc_w, chunk_rows) by a simple static cost model.

    Cost per program = fixed overhead + Q/out tile HBM time + MXU time with
    lane-padded Nc + VPU softmax time; minimized over the valid bc grid
    under a VMEM budget. Pass 1 is the historical model (legacy chunk
    sizing); if NO block fits it (f32 ratio-32: one cell row of queries is
    already 1024 x 4-byte lanes), pass 2 retries with sub-cell chunk_rows —
    legal since the kernel derives the cell row from the global query row —
    descending through divisors of bh until the f32 temporaries fit."""
    cands_h = _valid_bcs(r_h, hk, kernel)
    cands_w = _valid_bcs(r_w, wk, kernel)
    if not cands_h or not cands_w:
        return None
    g = _head_group(n, d)
    overhead_s = 3e-6
    hbm_bps = 6e11
    mxu_flops = 1.2e14 if itemsize <= 2 else 4e13
    vpu_ops = 3e12
    gd_eff = _pad128(g * d)
    dv_eff = _pad128(dv)

    def cost_of(bc_h, bc_w):
        bh, bw = bc_h * r_h, bc_w * r_w
        cq = bh * bw
        nc = (bc_h + kernel - 1) * (bc_w + kernel - 1)
        nc_pad = _pad128(nc)
        ll = g * nc_pad
        programs = -(-hk // bc_h) * -(-wk // bc_w)
        qk_flops = (n // g) * 2 * cq * gd_eff * ll
        av_flops = n * 2 * cq * nc_pad * dv_eff
        softmax_ops = 8 * n * cq * nc_pad  # exp/max/sum/div passes
        bytes_moved = cq * n * (d + dv) * itemsize
        return programs * (
            overhead_s
            + bytes_moved / hbm_bps
            + (qk_flops + av_flops) / mxu_flops
            + softmax_ops / vpu_ops
        )

    # pass 1: the historical VMEM model, verbatim
    best, best_cost = None, None
    for bc_h in cands_h:
        for bc_w in cands_w:
            bh, bw = bc_h * r_h, bc_w * r_w
            cq = bh * bw
            nc = (bc_h + kernel - 1) * (bc_w + kernel - 1)
            nc_pad = _pad128(nc)
            ll = g * nc_pad  # logits lanes per group
            # VMEM: double-buffered q/out tiles + k2/v tiles + f32 logits.
            # All groups' logits are live together (QKs are batched before
            # the softmaxes for MXU/VPU overlap), plus ~50% softmax temps.
            tile_bytes = cq * n * (d + dv) * itemsize * 2
            chunk_q = min(cq, (2_500_000 // 4) // max((n // g) * ll, 1))
            chunk_q = max(chunk_q, bw)
            logit_bytes = chunk_q * (n // g) * ll * 6
            # every head's f32 AV output is live until the lane-concat
            outs_bytes = n * chunk_q * dv_eff * 4
            kv_bytes = (n // g) * ll * gd_eff * itemsize + n * nc_pad * dv_eff * itemsize
            if tile_bytes + logit_bytes + outs_bytes + kv_bytes > vmem_budget:
                continue
            cost = cost_of(bc_h, bc_w)
            if best_cost is None or cost < best_cost:
                chunk = _legacy_chunk_rows(r_h, bh, bw, n, g, nc_pad, dv)
                best, best_cost = (bc_h, bc_w, chunk), cost
    if best is not None:
        return best

    # pass 2: sub-cell chunk fallback for blocks the legacy model rejects
    for bc_h in cands_h:
        for bc_w in cands_w:
            bh, bw = bc_h * r_h, bc_w * r_w
            nc = (bc_h + kernel - 1) * (bc_w + kernel - 1)
            nc_pad = _pad128(nc)
            ll = g * nc_pad
            tile_bytes = bh * bw * n * (d + dv) * itemsize * 2
            kv_bytes = (n // g) * ll * gd_eff * itemsize + n * nc_pad * dv_eff * itemsize
            f32_lanes = (n // g) * ll + n * dv_eff
            for chunk in sorted(
                {c for c in range(1, bh + 1) if bh % c == 0},
                key=lambda c: (c % 8 != 0, -c),
            ):
                temp_bytes = chunk * bw * f32_lanes * 6
                if tile_bytes + kv_bytes + temp_bytes > vmem_budget:
                    continue
                cost = cost_of(bc_h, bc_w)
                if best_cost is None or cost < best_cost:
                    best, best_cost = (bc_h, bc_w, chunk), cost
                break
    return best


def pick_cell_blocks(r_h, r_w, hk, wk, kernel, n, d, dv, itemsize,
                     vmem_budget=10 * 2 ** 20):
    """Public (bc_h, bc_w) view of the forward picker (or None)."""
    got = _pick_fwd(r_h, r_w, hk, wk, kernel, n, d, dv, itemsize, vmem_budget)
    return None if got is None else got[:2]


def fused_applicable(hq, wq, hk, wk, kernel: int, n=4, d=64, dv=64, itemsize=4):
    """Whether the fused kernel supports these shapes (else use the xla path)."""
    if hq % hk or wq % wk:
        return False
    if hk < kernel or wk < kernel:
        return False
    r_h, r_w = hq // hk, wq // wk
    return pick_cell_blocks(r_h, r_w, hk, wk, kernel, n, d, dv, itemsize) is not None


def _bwd_chunk_rows(bh: int, bw: int, nc: int, n: int, d: int, dv: int,
                    itemsize: int, vmem_budget: int):
    """Largest chunk_rows (a divisor of bh, preferring multiples of 8 for
    sublane alignment) whose VMEM footprint fits. Row chunks are a GRID
    dimension of the backward kernel: q/do/dq blocks shrink to the chunk
    while the dk/dv tile-grad out blocks are revisited and accumulated
    across chunk steps. Returns (chunk_rows, fits).

    VMEM accounting uses Mosaic's PHYSICAL tile sizes: the last block dim is
    lane-padded to 128 and the second-to-last to the sublane count (8 f32 /
    16 bf16) — a d=32 block really occupies 4x its logical bytes, which is
    exactly how the un-padded model OOM'd scoped vmem (24.8 MB vs the 16 MB
    limit) on 8-head d=32 f32 shapes."""
    ncl = _pad128(nc)
    d_eff = _pad128(d)
    dv_eff = _pad128(dv)
    sub = 8 if itemsize >= 4 else 16
    nc_eff = -(-nc // sub) * sub
    divisors = sorted(
        {c for c in range(1, bh + 1) if bh % c == 0},
        key=lambda c: (c % 8 != 0, -c),
    )
    for chunk in divisors:
        cq = chunk * bw
        # q/do in + dq out chunk blocks (double-buffered across grid steps)
        big_bytes = 2 * n * cq * (2 * d_eff + dv_eff) * itemsize
        # k/v tiles (double-buffered, io dtype) + resident f32 dk/dv grads
        tile_bytes = (
            2 * n * nc_eff * (d_eff + dv_eff) * itemsize
            + n * nc_eff * (d_eff + dv_eff) * 4
        )
        # one head's live f32 chain: logits, p, dp, dl (+ temps)
        live_bytes = 5 * cq * ncl * 4
        if big_bytes + tile_bytes + live_bytes <= vmem_budget:
            return chunk, True
    return 1, False


@functools.lru_cache(maxsize=512)
def pick_cell_blocks_bwd(r_h, r_w, hk, wk, kernel, n, d, dv, itemsize,
                         vmem_budget=11 * 2 ** 20):
    """Block picker for the recompute-P backward kernel (_bwd_kernel).

    Returns (bc_h, bc_w, chunk_rows) or None. The forward picker's VMEM
    model badly over-counts the backward: the backward has no
    block-diagonal K expansion (per-head (nc, d) tiles), it processes heads
    SEQUENTIALLY (one head's f32 temporaries live at a time), and its
    logits lanes are nc (ceil-128) rather than g*nc_pad. Using the forward
    model with a tight proxy budget rejected every block at dv >= 192 or
    ratio 32 and silently routed training to the XLA-oracle VJP (667 /
    2650 ms where the kernel path runs in tens of ms). Row-chunking as a
    grid dimension keeps even one-cell f32 ratio-32 blocks (4 MB+ of
    queries per cell) inside VMEM."""
    cands_h = _valid_bcs(r_h, hk, kernel)
    cands_w = _valid_bcs(r_w, wk, kernel)
    if not cands_h or not cands_w:
        return None
    overhead_s = 3e-6
    hbm_bps = 6e11
    mxu_flops = 1.2e14 if itemsize <= 2 else 4e13
    vpu_ops = 3e12
    best, best_cost = None, None
    for bc_h in cands_h:
        for bc_w in cands_w:
            bh, bw = bc_h * r_h, bc_w * r_w
            nc = (bc_h + kernel - 1) * (bc_w + kernel - 1)
            ncl = _pad128(nc)  # vreg lane padding of the (cq, nc) temps
            chunk_rows, fits = _bwd_chunk_rows(
                bh, bw, nc, n, d, dv, itemsize, vmem_budget
            )
            if not fits:
                continue
            n_chunks = bh // chunk_rows
            programs = -(-hk // bc_h) * -(-wk // bc_w) * n_chunks
            cqt = bh * bw  # queries per (cell block) across its chunks
            flops = n * 2 * cqt * ncl * (3 * d + 2 * dv)  # QK,dP,dQ,dK,dV
            softmax_ops = 14 * n * cqt * ncl
            bytes_moved = (
                n * bh * bw * (2 * d + 2 * dv) * itemsize
                + n * nc * (d + dv) * (itemsize + 4)
            )
            cost = (
                programs * overhead_s
                + -(-hk // bc_h) * -(-wk // bc_w) * (
                    bytes_moved / hbm_bps
                    + flops / mxu_flops
                    + softmax_ops / vpu_ops
                )
            )
            if best_cost is None or cost < best_cost:
                best, best_cost = (bc_h, bc_w, chunk_rows), cost
    return best


@functools.lru_cache(maxsize=512)
def _tile_origins(l: int, bc: int, kernel: int, cell0: int = 0, n_cells=None) -> np.ndarray:
    """Union-tile origin per cell block along one axis (host-side, static).

    cell0/n_cells select a band of cells (banded execution); clamping always
    uses the full axis length l so windows match the global rule."""
    nh = kernel // 2
    kb = bc + kernel - 1
    if n_cells is None:
        n_cells = l - cell0
    starts = cell0 + np.arange(pl.cdiv(n_cells, bc)) * bc - nh
    return np.clip(starts, 0, l - kb)


def _gather_union_tiles(x, bc_h, bc_w, kernel, cell0_h=0, n_cells_h=None):
    """(B, h, w, C) -> (B, nCH, nCW, KBh*KBw, C) union tiles per cell block."""
    _, hk, wk, _ = x.shape
    kb_h = bc_h + kernel - 1
    kb_w = bc_w + kernel - 1
    rows = (
        _tile_origins(hk, bc_h, kernel, cell0_h, n_cells_h)[:, None]
        + np.arange(kb_h)[None, :]
    )
    cols = _tile_origins(wk, bc_w, kernel)[:, None] + np.arange(kb_w)[None, :]
    t = jnp.take(x, jnp.asarray(rows.reshape(-1)), axis=1)  # (B, nCH*KBh, w, C)
    t = jnp.take(t, jnp.asarray(cols.reshape(-1)), axis=2)  # (..., nCW*KBw, C)
    b, _, _, c = t.shape
    t = t.reshape(b, rows.shape[0], kb_h, cols.shape[0], kb_w, c)
    t = jnp.transpose(t, (0, 1, 3, 2, 4, 5))
    return t.reshape(b, rows.shape[0], cols.shape[0], kb_h * kb_w, c)


def _scatter_union_tiles(d_tiles, hk, wk, bc_h, bc_w, kernel,
                         cell0_h=0, n_cells_h=None):
    """Reverse of _gather_union_tiles: (B, nCH, nCW, Nc, C) tile grads ->
    (B, hk, wk, C), accumulating overlapping tile cells."""
    b, n_ch, n_cw, nc, c = d_tiles.shape
    kb_h = bc_h + kernel - 1
    kb_w = bc_w + kernel - 1
    rows = (
        _tile_origins(hk, bc_h, kernel, cell0_h, n_cells_h)[:, None]
        + np.arange(kb_h)[None, :]
    ).reshape(-1)
    cols = (
        _tile_origins(wk, bc_w, kernel)[:, None] + np.arange(kb_w)[None, :]
    ).reshape(-1)
    t = d_tiles.reshape(b, n_ch, n_cw, kb_h, kb_w, c)
    t = jnp.transpose(t, (0, 1, 3, 2, 4, 5)).reshape(
        b, n_ch * kb_h, n_cw * kb_w, c
    )
    out = jnp.zeros((b, n_ch * kb_h, wk, c), t.dtype)
    out = out.at[:, :, jnp.asarray(cols)].add(t)
    full = jnp.zeros((b, hk, wk, c), t.dtype)
    return full.at[:, jnp.asarray(rows)].add(out)


def _kernel(
    q_ref,  # (1, BH, BW, n*d) VMEM, flat NHWC
    k2_ref,  # (1, 1, 1, P*g*nc_pad, g*d) VMEM block-diag union tiles
    v_ref,  # (1, 1, 1, n, nc_pad, dv) VMEM union tiles
    o_ref,  # (1, BH, BW, n*dv) VMEM, flat NHWC
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
    cell_row0: int,
):
    kk = kernel_size
    nh = kk // 2
    kb_h = bc_h + kk - 1
    kb_w = bc_w + kk - 1
    ci0 = cell_row0 + pl.program_id(1) * bc_h  # first (global) cell row
    cj0 = pl.program_id(2) * bc_w
    row0 = jnp.clip(ci0 - nh, 0, hk - kb_h)  # union tile origin (= host rule)
    col0 = jnp.clip(cj0 - nh, 0, wk - kb_w)

    bh = bc_h * r_h  # query rows in tile
    bw = bc_w * r_w
    g = group
    n_groups = num_heads // g
    dv = v_ref.shape[-1]
    gd = g * (q_ref.shape[-1] // num_heads)
    nc = kb_h * kb_w
    nc_pad = v_ref.shape[-2]
    ll = g * nc_pad  # logits lanes per group

    n_chunks = bh // chunk_rows
    cq = chunk_rows * bw  # queries per chunk

    # bf16 inputs take the native MXU path (f32 accumulation regardless);
    # f32 inputs force HIGHEST so the kernel is bit-faithful to the oracle.
    prec_qk = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    prec_av = (
        jax.lax.Precision.HIGHEST
        if v_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    # Window mask via broadcast outer products. Lane c holds tile cell
    # (c % nc_pad) of head (c // nc_pad) within the group — all heads share
    # one window rule. Query cell ci attends tile rows [ws, ws+k),
    # ws = clamp(ci - k//2, 0, hk - k) - row0. Lanes >= nc are zero padding.
    # Lane-only terms live on a (1, ll) vector and row-only terms on a
    # (cq, 1) column: the expensive integer div/mod runs on tiny vectors and
    # only the final broadcast compares touch full (cq, ll) tiles. (Building
    # everything on (cq, ll) iotas costs ~2x the whole kernel at 2K^2.)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, ll), 1)
    col_in = lane % nc_pad
    t_idx = col_in // kb_w  # tile cell row of this lane
    s_idx = col_in - t_idx * kb_w  # tile cell col of this lane
    pad_ok = col_in < nc
    rows_c = jax.lax.broadcasted_iota(jnp.int32, (cq, 1), 0)
    i_loc = rows_c // bw  # query row within chunk
    j_loc = rows_c - i_loc * bw  # query col within tile
    cell_w = cj0 + j_loc // r_w
    ws_w = jnp.clip(cell_w - nh, 0, wk - kk) - col0  # (cq, 1)
    ok_w = (s_idx >= ws_w) & (s_idx < ws_w + kk) & pad_ok  # (cq, ll)

    # Chunks are a static Python loop and all QK matmuls are issued before
    # any softmax/AV: independent MXU work lets Mosaic overlap the MXU with
    # the VPU softmax instead of serializing QK -> softmax -> AV per head.
    for c in range(n_chunks):
        row_start = c * chunk_rows
        # cell row from the global query row: valid for sub-cell chunks too
        # (f32 ratio-32, where one cell row of queries overflows the temp
        # budget and chunk_rows < r_h).
        cell_h = ci0 + (row_start + i_loc) // r_h  # (cq, 1)
        ws_h = jnp.clip(cell_h - nh, 0, hk - kk) - row0
        ok_h = (t_idx >= ws_h) & (t_idx < ws_h + kk)
        bias = jnp.where(ok_h & ok_w, 0.0, -1e30).astype(jnp.float32)

        logits_all = []
        for p in range(n_groups):  # static unroll
            # 128-aligned lane slice: this group's g heads of q.
            # (scale is folded into the K tiles host-side.)
            q_mat = q_ref[
                0, pl.ds(row_start, chunk_rows), :, p * gd : (p + 1) * gd
            ].reshape(cq, gd)
            k2 = k2_ref[0, 0, 0, p * ll : (p + 1) * ll, :]  # (ll, gd)
            logits_all.append(
                jax.lax.dot_general(
                    q_mat,
                    k2,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec_qk,
                ) + bias  # (cq, ll) = g heads' logits side by side
            )

        outs = []
        for p in range(n_groups):
            for j in range(g):
                h = p * g + j
                lj = logits_all[p][:, j * nc_pad : (j + 1) * nc_pad]
                m = jnp.max(lj, axis=-1, keepdims=True)
                e = jnp.exp(lj - m)
                pn = e / jnp.sum(e, axis=-1, keepdims=True)
                v_mat = v_ref[0, 0, 0, h]  # (nc_pad, dv)
                outs.append(
                    jax.lax.dot_general(
                        pn.astype(v_mat.dtype),
                        v_mat,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec_av,
                    )
                )
        out = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
        o_ref[0, pl.ds(row_start, chunk_rows), :, :] = out.reshape(
            chunk_rows, bw, num_heads * dv
        ).astype(o_ref.dtype)


@functools.lru_cache(maxsize=512)
def _tile_index_tables(hk, wk, n, g, bc_h, bc_w, kernel, cell0_h, n_cells_h):
    """Host-side int32 gather tables for single-pass tile construction.

    Returns (k2_idx, v_idx):
      k2_idx (nCH, nCW, P*g*nc_pad): row index into the block-diag-expanded
        key source (hk*wk*P*g rows + trailing zero row) for every K2 tile row.
      v_idx (nCH, nCW, n, nc_pad): row index into the flat (hk*wk*n + 1)
        value source (last row zero) for every V tile row.
    """
    kb_h = bc_h + kernel - 1
    kb_w = bc_w + kernel - 1
    nc = kb_h * kb_w
    nc_pad = _pad128(nc)
    p_groups = n // g
    row0 = _tile_origins(hk, bc_h, kernel, cell0_h, n_cells_h)  # (nCH,)
    col0 = _tile_origins(wk, bc_w, kernel)  # (nCW,)
    n_ch, n_cw = len(row0), len(col0)

    t = np.arange(nc_pad) // kb_w  # tile cell row per padded slot
    ss = np.arange(nc_pad) % kb_w
    valid = np.arange(nc_pad) < nc
    cell_r = row0[:, None] + t[None, :]  # (nCH, nc_pad)
    cell_c = col0[:, None] + ss[None, :]  # (nCW, nc_pad)

    # K source rows are (hk, wk, P, g) flattened; zero row appended at the end.
    zero_k = hk * wk * p_groups * g
    base = (
        cell_r[:, None, None, None, :] * wk + cell_c[None, :, None, None, :]
    )  # (nCH, nCW, 1, 1, nc_pad)
    head = (
        np.arange(p_groups)[None, None, :, None, None] * g
        + np.arange(g)[None, None, None, :, None]
    )
    k2_idx = np.where(valid, base * (p_groups * g) + head, zero_k)
    k2_idx = k2_idx.reshape(n_ch, n_cw, p_groups * g * nc_pad)

    zero_v = hk * wk * n
    v_idx = np.where(
        valid,
        base.reshape(n_ch, n_cw, 1, nc_pad) * n
        + np.arange(n)[None, None, :, None],
        zero_v,
    )
    # numpy (not jnp): jnp constants created under a trace leak tracers
    # through the lru_cache; callers convert at use site.
    return k2_idx.astype(np.int32), v_idx.astype(np.int32)


def _build_tiles(k, v, g, bc_h, bc_w, kernel, cell0_h, n_cells_h):
    """Single-gather construction of the block-diag K2 and V union tiles.

    K is first expanded row-wise into (hk*wk*P, g, g*d): head j of a group
    occupies lanes [j*d, (j+1)*d) of its row, zeros elsewhere (a broadcast
    multiply with eye(g) — one pass over a few MB). One gather then builds
    each tile in a single pass over its final bytes; the multi-op
    take/transpose/pad/concat alternative costs several full passes over the
    (potentially hundreds of MB) expanded tiles and dominated kernel time.
    """
    b, hk, wk, n, d = k.shape
    dv = v.shape[-1]
    p_groups = n // g
    k2_idx, v_idx = _tile_index_tables(
        hk, wk, n, g, bc_h, bc_w, kernel, cell0_h, n_cells_h
    )

    eye = jnp.eye(g, dtype=k.dtype)  # (g_head, g_lane)
    kr = k.reshape(b, hk * wk, p_groups, g, 1, d)
    ksrc = (kr * eye[:, :, None]).reshape(b, hk * wk * p_groups * g, g * d)
    ksrc = jnp.pad(ksrc, ((0, 0), (0, 1), (0, 0)))  # trailing zero row
    k2 = jnp.take(ksrc, jnp.asarray(k2_idx), axis=1)  # (b,nCH,nCW,P*g*nc_pad,g*d)

    vsrc = jnp.pad(v.reshape(b, hk * wk * n, dv), ((0, 0), (0, 1), (0, 0)))
    vt = jnp.take(vsrc, jnp.asarray(v_idx), axis=1)  # (b, nCH, nCW, n, nc_pad, dv)
    return k2, vt


def cross_scale_na2d_fused(
    q, k, v, kernel_size: int, scale=None, interpret=False,
    row_cell0: int = 0, full_hq=None,
):
    """Fused cross-scale NA. q: (B, H, W, n, d); k: (B, h, w, n, d);
    v: (B, h, w, n, dv). Requires exact integer ratios (H == r_h*h etc.) and
    `fused_applicable(...)`. Returns (B, H, W, n, dv). Differentiable via a
    Pallas recompute-P (flash-style) backward kernel (`_fused_bwd_impl`);
    gradients match jax.grad of the oracle (tests/test_kernel_fused.py).

    Banded execution: q may hold only rows [row_cell0 * r_h, ...) of a
    full_hq-tall query grid; windows are computed against the global grid.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _fused_diff(
        q, k, v, kernel_size, float(scale), interpret, row_cell0,
        full_hq if full_hq is not None else q.shape[1],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _fused_diff(q, k, v, kernel_size, scale, interpret, row_cell0, full_hq):
    return _fused_fwd_impl(q, k, v, kernel_size, scale, interpret, row_cell0, full_hq)


def _fused_diff_fwd(q, k, v, kernel_size, scale, interpret, row_cell0, full_hq):
    out = _fused_fwd_impl(q, k, v, kernel_size, scale, interpret, row_cell0, full_hq)
    return out, (q, k, v)


def _fused_diff_bwd(kernel_size, scale, interpret, row_cell0, full_hq, res, g):
    q, k, v = res
    if row_cell0 != 0 or full_hq != q.shape[1]:
        raise NotImplementedError("banded fused NA is inference-only")
    b, hq, wq, n, d = q.shape
    _, hk, wk, _, dv = v.shape
    blocks = pick_cell_blocks_bwd(
        hq // hk, wq // wk, hk, wk, kernel_size, n, d, dv, q.dtype.itemsize
    )
    if blocks is None:
        # Shapes the Pallas backward can't tile (e.g. many-head small-d
        # configs under the tighter backward VMEM budget): differentiate
        # the XLA oracle instead — training-time grids are small, so the
        # oracle VJP is affordable there.
        from naf_tpu.ops.na2d import cross_scale_na2d

        _, vjp = jax.vjp(
            lambda q_, k_, v_: cross_scale_na2d(
                q_, k_, v_, kernel_size, scale=scale
            ),
            q, k, v,
        )
        return vjp(g)
    return _fused_bwd_impl(q, k, v, g, kernel_size, scale, interpret)


_fused_diff.defvjp(_fused_diff_fwd, _fused_diff_bwd)


def _bwd_kernel(
    q_ref,  # (1, n, CHUNK, BW, d) VMEM, head-major row chunk
    k_ref,  # (1, 1, 1, n, Nc, d) VMEM union tile
    v_ref,  # (1, 1, 1, n, Nc, dv) VMEM union tile
    do_ref,  # (1, n, CHUNK, BW, dv) VMEM, head-major dL/dout chunk
    dq_ref,  # (1, n, CHUNK, BW, d) VMEM out
    dk_ref,  # (1, 1, 1, n, Nc, d) VMEM out (per-block tile grad, f32)
    dv_ref,  # (1, 1, 1, n, Nc, dv) VMEM out
    *,
    kernel_size: int,
    num_heads: int,
    r_h: int,
    r_w: int,
    bc_h: int,
    bc_w: int,
    hk: int,
    wk: int,
    hq: int,
    wq: int,
    scale: float,
    chunk_rows: int,
):
    """Recompute-P backward (flash-attention style): per chunk and head,
    rebuild the softmax from Q/K, then
      dP = dO @ V^T; delta = rowsum(P * dP); dlogits = P * (dP - delta)
      dQ = scale * dlogits @ K;  dK_tile += scale * dlogits^T @ Q;
      dV_tile += P^T @ dO.
    Row chunks are grid dimension 3 (innermost): the q/do/dq blocks cover
    one chunk while the dk/dv out blocks revisit the same (cell-block)
    index across chunk steps, accumulating in VMEM and flushing to HBM only
    when the cell block changes — this keeps one-cell f32 ratio-32 blocks
    (whose full q tile alone is 4 MB+) inside the VMEM budget. Tile grads
    are scatter-added into the LR grid outside the kernel. Padded query
    rows/cols (cdiv grids) are zeroed out of P/dP so they cannot pollute
    the dK/dV reductions."""
    kk = kernel_size
    nh = kk // 2
    kb_h = bc_h + kk - 1
    kb_w = bc_w + kk - 1
    ci0 = pl.program_id(1) * bc_h
    cj0 = pl.program_id(2) * bc_w
    chunk_i = pl.program_id(3)
    row0 = jnp.clip(ci0 - nh, 0, hk - kb_h)
    col0 = jnp.clip(cj0 - nh, 0, wk - kb_w)

    bw = bc_w * r_w
    d = q_ref.shape[-1]
    dv_dim = v_ref.shape[-1]
    nc = kb_h * kb_w
    cq = chunk_rows * bw

    prec_f32 = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    rows_i = jax.lax.broadcasted_iota(jnp.int32, (cq, nc), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (cq, nc), 1)
    i_loc = rows_i // bw
    j_loc = rows_i - i_loc * bw
    t_idx = cols_i // kb_w
    s_idx = cols_i - t_idx * kb_w
    cell_w = cj0 + j_loc // r_w
    ws_w = jnp.clip(cell_w - nh, 0, wk - kk) - col0
    ok_w = (s_idx >= ws_w) & (s_idx < ws_w + kk)
    col_valid = (cj0 * r_w + j_loc) < wq

    @pl.when(chunk_i == 0)
    def _init():
        for h in range(num_heads):
            dk_ref[0, 0, 0, h] = jnp.zeros((nc, d), dk_ref.dtype)
            dv_ref[0, 0, 0, h] = jnp.zeros((nc, dv_dim), dv_ref.dtype)

    row_start = chunk_i * chunk_rows
    glob_row = ci0 * r_h + row_start + i_loc
    ws_h = jnp.clip(glob_row // r_h - nh, 0, hk - kk) - row0
    ok_h = (t_idx >= ws_h) & (t_idx < ws_h + kk)
    bias = jnp.where(ok_h & ok_w, 0.0, -1e30).astype(jnp.float32)
    valid = (glob_row < hq) & col_valid
    # per-query validity as a (cq, 1) column for zeroing matmul operands
    # (0 * NaN = NaN: padded rows must be zeroed BEFORE contractions)
    valid_q = valid[:, :1]

    for h in range(num_heads):
        k_mat = k_ref[0, 0, 0, h]
        v_mat = v_ref[0, 0, 0, h]
        q_mat = q_ref[0, h].reshape(cq, d)
        do_mat = do_ref[0, h].reshape(cq, dv_dim)
        q_mat = jnp.where(valid_q, q_mat, 0)
        do_mat = jnp.where(valid_q, do_mat, 0)
        logits = jax.lax.dot_general(
            q_mat, k_mat,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec_f32,
        ) * scale + bias
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        # where (not multiply): padded queries may hold NaN/Inf garbage
        p = jnp.where(valid, p, 0.0)

        dp = jax.lax.dot_general(
            do_mat, v_mat,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec_f32,
        )
        dp = jnp.where(valid, dp, 0.0)  # padded-row dO may be NaN
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        dl = p * (dp - delta)  # (cq, nc) f32

        dq = jax.lax.dot_general(
            dl.astype(k_mat.dtype), k_mat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec_f32,
        ) * scale
        dq_ref[0, h] = dq.reshape(chunk_rows, bw, d).astype(dq_ref.dtype)

        dk = jax.lax.dot_general(
            dl.astype(q_mat.dtype), q_mat,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec_f32,
        ) * scale  # (nc, d)
        dk_ref[0, 0, 0, h] = dk_ref[0, 0, 0, h] + dk.astype(dk_ref.dtype)

        dvt = jax.lax.dot_general(
            p.astype(do_mat.dtype), do_mat,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec_f32,
        )  # (nc, dv)
        dv_ref[0, 0, 0, h] = dv_ref[0, 0, 0, h] + dvt.astype(dv_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("kernel_size", "scale", "interpret")
)
def _fused_bwd_impl(q, k, v, g, kernel_size: int, scale, interpret=False):
    b, hq, wq, n, d = q.shape
    _, hk, wk, _, dv = v.shape
    kk = kernel_size
    r_h, r_w = hq // hk, wq // wk
    itemsize = q.dtype.itemsize
    blocks = pick_cell_blocks_bwd(r_h, r_w, hk, wk, kk, n, d, dv, itemsize)
    if blocks is None:
        raise ValueError("shapes not supported by fused kernel; use the xla path")
    bc_h, bc_w, chunk_rows = blocks
    bh, bw = bc_h * r_h, bc_w * r_w
    n_ch = pl.cdiv(hk, bc_h)
    n_cw = pl.cdiv(wk, bc_w)
    kb_h = bc_h + kk - 1
    kb_w = bc_w + kk - 1
    nc = kb_h * kb_w
    n_chunks = bh // chunk_rows

    k_tiles = _gather_union_tiles(k.reshape(b, hk, wk, n * d), bc_h, bc_w, kk)
    v_tiles = _gather_union_tiles(v.reshape(b, hk, wk, n * dv), bc_h, bc_w, kk)
    k_tiles = jnp.swapaxes(k_tiles.reshape(b, n_ch, n_cw, nc, n, d), 3, 4)
    v_tiles = jnp.swapaxes(v_tiles.reshape(b, n_ch, n_cw, nc, n, dv), 3, 4)

    q_hm = jnp.transpose(q, (0, 3, 1, 2, 4))
    g_hm = jnp.transpose(g, (0, 3, 1, 2, 4))

    # chunk index innermost: dk/dv out blocks revisit the same (b, ii, jj)
    # block across cc steps, accumulating in VMEM (flushed on block change)
    grid = (b, n_ch, n_cw, n_chunks)
    tile_spec = lambda ch: pl.BlockSpec(
        (1, 1, 1, n, nc, ch),
        lambda bb, ii, jj, cc: (bb, ii, jj, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    big_spec = lambda ch: pl.BlockSpec(
        (1, n, chunk_rows, bw, ch),
        lambda bb, ii, jj, cc: (bb, 0, ii * n_chunks + cc, jj, 0),
        memory_space=pltpu.VMEM,
    )

    dq_hm, dk_tiles, dv_tiles = pl.pallas_call(
        functools.partial(
            _bwd_kernel,
            kernel_size=kk, num_heads=n, r_h=r_h, r_w=r_w,
            bc_h=bc_h, bc_w=bc_w, hk=hk, wk=wk, hq=hq, wq=wq,
            scale=float(scale), chunk_rows=chunk_rows,
        ),
        grid=grid,
        in_specs=[big_spec(d), tile_spec(d), tile_spec(dv), big_spec(dv)],
        out_specs=[big_spec(d), tile_spec(d), tile_spec(dv)],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, hq, wq, d), q.dtype),
            jax.ShapeDtypeStruct((b, n_ch, n_cw, n, nc, d), jnp.float32),
            jax.ShapeDtypeStruct((b, n_ch, n_cw, n, nc, dv), jnp.float32),
        ],
        interpret=interpret,
    )(q_hm, k_tiles, v_tiles, g_hm)

    dq = jnp.transpose(dq_hm, (0, 2, 3, 1, 4))
    dk_flat = jnp.swapaxes(dk_tiles, 3, 4).reshape(b, n_ch, n_cw, nc, n * d)
    dv_flat = jnp.swapaxes(dv_tiles, 3, 4).reshape(b, n_ch, n_cw, nc, n * dv)
    dk_full = _scatter_union_tiles(dk_flat, hk, wk, bc_h, bc_w, kk)
    dv_full = _scatter_union_tiles(dv_flat, hk, wk, bc_h, bc_w, kk)
    return (
        dq,
        dk_full.reshape(b, hk, wk, n, d).astype(k.dtype),
        dv_full.reshape(b, hk, wk, n, dv).astype(v.dtype),
    )


@functools.partial(
    jax.jit,
    static_argnames=("kernel_size", "scale", "interpret", "row_cell0", "full_hq"),
)
def _fused_fwd_impl(
    q, k, v, kernel_size: int, scale=None, interpret=False,
    row_cell0: int = 0, full_hq=None,
):
    b, hq, wq, n, d = q.shape
    _, hk, wk, _, dv = v.shape
    kk = kernel_size
    full_hq = full_hq if full_hq is not None else hq
    if kk % 2 != 1:
        raise ValueError(f"kernel size must be odd, got {kk}")
    r_h, r_w = full_hq // hk if hk else 0, wq // wk if wk else 0
    itemsize = q.dtype.itemsize
    blocks = (
        _pick_fwd(r_h, r_w, hk, wk, kk, n, d, dv, itemsize)
        if (full_hq % hk == 0 and wq % wk == 0 and hk >= kk and wk >= kk
            and hq % r_h == 0)
        else None
    )
    if blocks is None:
        raise ValueError("shapes not supported by fused kernel; use the xla path")
    bc_h, bc_w, chunk_rows = blocks
    bh, bw = bc_h * r_h, bc_w * r_w
    band_cells = hq // r_h  # = hk when not banded
    n_ch = pl.cdiv(band_cells, bc_h)
    n_cw = pl.cdiv(wk, bc_w)
    kb_h = bc_h + kk - 1
    kb_w = bc_w + kk - 1
    nc = kb_h * kb_w
    g = _head_group(n, d)
    nc_pad = _pad128(nc)

    # Stage 1: union K/V tiles; K as per-group block-diagonal matrices,
    # each built by a single gather (see _build_tiles). The softmax scale is
    # folded into K here (exact in f32; for bf16 the one extra rounding is
    # far below the dtype's own noise) so the kernel saves a full-size
    # multiply over the f32 logits.
    k_scaled = (k.astype(jnp.float32) * float(scale)).astype(k.dtype)
    k2_tiles, v_tiles = _build_tiles(
        k_scaled, v, g, bc_h, bc_w, kk, row_cell0, band_cells
    )

    # Q and out stay flat NHWC: the 5-D (B,H,W,n,d) view is contiguous with
    # the 4-D (B,H,W,n*d) flat layout, so these reshapes are bitcasts and no
    # transpose or tile-padded layout ever materializes at HR.
    q_flat = q.reshape(b, hq, wq, n * d)

    grid = (b, n_ch, n_cw)

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            kernel_size=kk,
            num_heads=n,
            group=g,
            r_h=r_h,
            r_w=r_w,
            bc_h=bc_h,
            bc_w=bc_w,
            hk=hk,
            wk=wk,
            chunk_rows=chunk_rows,
            cell_row0=row_cell0,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, bh, bw, n * d),
                lambda bb, ii, jj: (bb, ii, jj, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, (n // g) * g * nc_pad, g * d),
                lambda bb, ii, jj: (bb, ii, jj, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, n, nc_pad, dv),
                lambda bb, ii, jj: (bb, ii, jj, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bh, bw, n * dv),
            lambda bb, ii, jj: (bb, ii, jj, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, wq, n * dv), q.dtype),
        interpret=interpret,
    )(q_flat, k2_tiles, v_tiles)

    return out.reshape(b, hq, wq, n, dv)
