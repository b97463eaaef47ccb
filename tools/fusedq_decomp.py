"""Decompose the fused-q stage cost at the north-star config (dev tool).

Times, within ONE process (in-process deltas are the reliable signal —
see CLAUDE.md):
  1. full _fused_q_impl (auto w_tiles)
  2. host-side K/V union-tile build (_build_tiles_q) alone
  3. host-side enc glue (rot einsum + concat + pad + per-tile stack) alone
  4. w_tiles variants of the full impl

kernel-only ~= (1) - (2) - (3). Run: python tools/fusedq_decomp.py
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/naf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--img", type=int, default=448)
    ap.add_argument("--out", type=int, default=2048)
    ap.add_argument("--ratio", type=int, default=16)
    ap.add_argument("--embed", type=int, default=384)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--w-tiles", nargs="*", type=int, default=[1, 2, 4])
    args = ap.parse_args()

    from naf_tpu.kernels.na2d_fused import _head_group
    from naf_tpu.kernels.na2d_fused_q import (
        _build_tiles_q,
        _ceil8,
        _fused_q_impl,
        _head_pad,
        pick_geometry,
    )
    from naf_tpu.nn.rope import _rotate_half_matrix
    from naf_tpu.utils.benchmarking import device_time_ms

    out, lr = args.out, args.out // args.ratio
    dim, emb = args.dim, args.embed
    n, kk = 4, 9
    d, dv = dim // n, emb // n
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    enc = jnp.asarray(rng.randn(1, args.img, args.img, dim), dt)
    keys = jnp.asarray(rng.randn(1, lr, lr, dim), dt)
    feats = jnp.asarray(rng.randn(1, lr, lr, emb), dt)
    rows_tab = jnp.asarray(rng.randn(out, 2 * dim), dt)
    cols_tab = jnp.asarray(rng.randn(out, 2 * dim), dt)

    hq = wq = out
    hi = wi = args.img
    hk = wk = lr
    geom = pick_geometry(hq, wq, hi, wi, hk, wk, kk, n, d, dv, 2)
    bc_h, bc_w = geom
    r = args.ratio
    bh, bw = bc_h * r, bc_w * r
    dp = _head_pad(d, False)
    g = _head_group(n, dp)
    n_cw = wk // bc_w
    iw = (bw * wi) // wq
    iwe = _ceil8(iw)
    print(f"geom {geom} bh/bw {bh}/{bw} n_cw {n_cw} iw/iwe {iw}/{iwe}")

    def full(enc, keys, feats, rows_tab, cols_tab):
        return _fused_q_impl(
            enc, keys, feats, rows_tab, cols_tab, d,
            num_heads=n, kernel_size=kk, scale=None,
        )

    def build(keys, feats):
        scale = d ** -0.5 * 1.4426950408889634
        k5 = keys.reshape(1, hk, wk, n, d)
        k_scaled = (k5.astype(jnp.float32) * scale).astype(dt)
        return _build_tiles_q(
            k_scaled, feats.reshape(1, hk, wk, n, dv).astype(dt),
            g, bc_h, bc_w, kk, 0, None,
        )

    rmat = jnp.asarray(_rotate_half_matrix(dim // d, d), dt)

    def glue(enc):
        rot = jnp.einsum("bhwc,cd->bhwd", enc, rmat)
        e = jnp.concatenate([enc, rot], axis=-1)
        need_w = (n_cw - 1) * iw + iwe
        if need_w > wi:
            e = jnp.pad(e, ((0, 0), (0, 0), (0, need_w - wi), (0, 0)))
        return jnp.stack(
            [e[:, :, jj * iw : jj * iw + iwe] for jj in range(n_cw)], axis=1
        )

    t_build = device_time_ms(build, keys, feats, iters=args.iters)
    print(f"K/V tile build: {t_build:.2f} ms", flush=True)
    t_glue = device_time_ms(glue, enc, iters=args.iters)
    print(f"enc glue (rot+concat+pad+stack): {t_glue:.2f} ms", flush=True)
    t_full = device_time_ms(full, enc, keys, feats, rows_tab, cols_tab,
                            iters=args.iters, chain="scalar")
    print(f"full fused-q (auto wt): {t_full:.2f} ms  "
          f"-> kernel-only ~{t_full - t_build - t_glue:.2f} ms", flush=True)

    for wt in args.w_tiles:
        if n_cw % wt:
            continue

        def fwt(enc, keys, feats, rows_tab, cols_tab, _wt=wt):
            return _fused_q_impl(
                enc, keys, feats, rows_tab, cols_tab, d,
                num_heads=n, kernel_size=kk, scale=None, w_tiles=_wt,
            )

        try:
            t = device_time_ms(fwt, enc, keys, feats, rows_tab, cols_tab,
                               iters=args.iters, chain="scalar")
            print(f"full fused-q w_tiles={wt}: {t:.2f} ms", flush=True)
        except Exception as e:
            print(f"w_tiles={wt}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
