"""Compute-vs-DMA isolation for the fused-q kernel (dev tool).

Replicates the exact _fused_q_impl pallas_call at the north-star config with
prebuilt host-side inputs, then zeroes individual DMA streams by making the
corresponding block index maps constant (revisited blocks are fetched /
flushed once, not per program), keeping the compute bit-identical:

  K1 replica        in-DMA + compute + out-DMA   (the real kernel cost)
  K2 out-pinned     in-DMA + compute
  K3 in-pinned      compute + out-DMA
  K4 all-pinned     compute only

Run: python tools/fusedq_overlap_probe.py [--wt 2]
"""

import argparse
import functools
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/naf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wt", type=int, default=2)
    args = ap.parse_args()

    from naf_tpu.kernels.na2d_fused import _head_group
    from naf_tpu.kernels.na2d_fused_q import (
        _build_tiles_q,
        _ceil8,
        _head_pad,
        _kernel,
        _row_taps,
        pick_geometry,
    )
    from naf_tpu.nn.rope import _rotate_half_matrix
    from naf_tpu.ops.pool import _pool_matrix
    from naf_tpu.utils.benchmarking import device_time_ms

    out = 2048
    img = 448
    lr = 128
    dim, emb, n, kk = 256, 384, 4, 9
    d, dv = dim // n, emb // n
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    enc = jnp.asarray(rng.randn(1, img, img, dim), dt)
    keys = jnp.asarray(rng.randn(1, lr, lr, dim), dt)
    feats = jnp.asarray(rng.randn(1, lr, lr, emb), dt)
    rows_tab = jnp.asarray(rng.randn(out, 2 * dim), dt)
    cols_tab = jnp.asarray(rng.randn(out, 2 * dim), dt)

    hq = wq = out
    hi = wi = img
    hk = wk = lr
    bc_h, bc_w = pick_geometry(hq, wq, hi, wi, hk, wk, kk, n, d, dv, 2)
    r_h = r_w = hq // hk
    bh, bw = bc_h * r_h, bc_w * r_w
    dp = _head_pad(d, False)
    g = _head_group(n, dp)
    gd = g * dp
    n_ch, n_cw = hk // bc_h, wk // bc_w
    iw = (bw * wi) // wq
    iwe = _ceil8(iw)
    ih = (bh * hi) // hq
    c = n * dp
    wt = args.wt

    scale = d ** -0.5 * 1.4426950408889634
    k5 = keys.reshape(1, hk, wk, n, d)
    k_scaled = (k5.astype(jnp.float32) * scale).astype(dt)
    k2, vt = _build_tiles_q(
        k_scaled, feats.reshape(1, hk, wk, n, dv).astype(dt),
        g, bc_h, bc_w, kk, 0, None,
    )
    rmat = jnp.asarray(_rotate_half_matrix(dim // d, d), dt)
    rot = jnp.einsum("bhwc,cd->bhwd", enc, rmat)
    e = jnp.concatenate([enc, rot], axis=-1)
    need_w = (n_cw - 1) * iw + iwe
    e = jnp.pad(e, ((0, 0), (0, 0), (0, need_w - wi), (0, 0)))
    enc5 = jnp.stack(
        [e[:, :, jj * iw : jj * iw + iwe] for jj in range(n_cw)], axis=1
    )
    col_pool = np.pad(_pool_matrix(wi, wq)[:bw, :iw], ((0, 0), (0, iwe - iw)))
    col_pool = jnp.asarray(col_pool, jnp.float32)
    row_taps = _row_taps(hi, hq, bh, ih)

    chunk_rows = r_h
    for m in range(bc_h, 0, -1):
        if bc_h % m == 0 and m * r_h * bw <= 1024:
            chunk_rows = m * r_h
            break

    kern = functools.partial(
        _kernel_wrap := None or (lambda *refs: _kernel(
            refs[0], refs[1], refs[2], refs[3], refs[4], refs[6],
            refs[7], refs[8], refs[5],
            kernel_size=kk, num_heads=n, group=g, r_h=r_h, r_w=r_w,
            bc_h=bc_h, bc_w=bc_w, hk=hk, wk=wk, chunk_rows=chunk_rows,
            pool_identity=False, row_taps=row_taps, rope_d_head=d,
            cell0=0, w_tiles=wt, diag="",
        ))
    )

    def mk(pin_in, pin_out):
        if pin_in:
            enc_ix = lambda bb, ii, jj: (0, 0, 0, 0, 0)
            kv_ix = lambda bb, ii, jj: (0, 0, 0, 0, 0)
            rows_ix = lambda bb, ii, jj: (0, 0)
            cols_ix = lambda bb, ii, jj: (0, 0)
        else:
            enc_ix = lambda bb, ii, jj: (bb, jj, ii, 0, 0)
            kv_ix = lambda bb, ii, jj: (bb, ii, jj, 0, 0)
            rows_ix = lambda bb, ii, jj: (ii, 0)
            cols_ix = lambda bb, ii, jj: (jj, 0)
        out_ix = (
            (lambda bb, ii, jj: (0, 0, 0, 0))
            if pin_out
            else (lambda bb, ii, jj: (bb, ii, jj, 0))
        )
        sem = "arbitrary" if (pin_in or pin_out) else "parallel"

        def f(enc5, k2, vt, rows_tab, cols_tab, col_pool):
            return pl.pallas_call(
                kern,
                grid=(1, n_ch, n_cw // wt),
                in_specs=[
                    pl.BlockSpec((1, wt, ih, iwe, 2 * c), enc_ix,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, wt, 128, n * gd), kv_ix,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, wt, 128, n * dv), kv_ix,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bh, 2 * c), rows_ix,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((wt * bw, 2 * c), cols_ix,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bw, iwe), lambda bb, ii, jj: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, bh, wt * bw, n * dv), out_ix,
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, hq, wq, n * dv), dt),
                scratch_shapes=[
                    pltpu.VMEM((ih, bw, 2 * c), jnp.float32),
                    pltpu.VMEM((bh, bw, c), dt),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=(sem,) * 3,
                ),
            )(enc5, k2, vt, rows_tab, cols_tab, col_pool)

        return f

    for name, pin_in, pin_out in (
        ("K1 replica", False, False),
        ("K2 out-pinned", False, True),
        ("K3 in-pinned", True, False),
        ("K4 all-pinned", True, True),
    ):
        try:
            t = device_time_ms(
                mk(pin_in, pin_out), enc5, k2, vt, rows_tab, cols_tab,
                col_pool, iters=8, chain="scalar",
            )
            print(f"{name} (wt={wt}): {t:.2f} ms", flush=True)
        except Exception as ex:
            print(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:150]}",
                  flush=True)


if __name__ == "__main__":
    main()
