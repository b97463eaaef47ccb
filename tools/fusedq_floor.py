"""Empirical floor + ablation probe for the fused-q kernel (dev tool).

All within one process at the north-star config:
  - write-floor kernel: same grid/out blocks, writes a constant derived from
    a tiny input (no enc/k2/vt streams)
  - stream-floor kernel: reads enc5+k2+vt blocks, writes their cheap reduce
    broadcast to the out block (HBM-only, no MXU/softmax)
  - full kernel ablations (_diag) at the auto w_tiles

Run: python tools/fusedq_floor.py
"""

import sys

sys.path.insert(0, ".")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/naf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
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
    r = hq // hk
    bh, bw = bc_h * r, bc_w * r
    dp = _head_pad(d, False)
    g = _head_group(n, dp)
    gd = g * dp
    n_ch, n_cw = hk // bc_h, wk // bc_w
    iw = (bw * wi) // wq
    iwe = _ceil8(iw)
    ih = (bh * hi) // hq
    c2 = 2 * dim

    # prebuilt inputs
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
    print(f"geom ({bc_h},{bc_w}) grid ({n_ch},{n_cw}) enc5 {enc5.shape} "
          f"k2 {k2.shape} vt {vt.shape}")

    for wt in (1, 2):
        # ---- write floor ----
        def wf_kern(s_ref, o_ref):
            s = s_ref[0].astype(jnp.float32)[0]  # 32-bit extract only
            o_ref[...] = jnp.full(o_ref.shape, s, o_ref.dtype)

        def write_floor(src, _wt=wt):
            return pl.pallas_call(
                wf_kern,
                grid=(1, n_ch, n_cw // _wt),
                in_specs=[pl.BlockSpec((1, 128), lambda bb, ii, jj: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(
                    (1, bh, _wt * bw, n * dv),
                    lambda bb, ii, jj: (bb, ii, jj, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct((1, hq, wq, n * dv), dt),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",) * 3
                ),
            )(src)

        src = jnp.ones((1, 128), dt)
        t = device_time_ms(write_floor, src, iters=8, chain="scalar")
        print(f"write-floor wt={wt}: {t:.2f} ms", flush=True)

        # ---- stream floor: read enc5/k2/vt blocks too ----
        def sf_kern(e_ref, k_ref, v_ref, o_ref):
            s = (e_ref[0, 0, 0, 0].astype(jnp.float32)[0]
                 + k_ref[0, 0, 0, 0].astype(jnp.float32)[0]
                 + v_ref[0, 0, 0, 0].astype(jnp.float32)[0])
            o_ref[...] = jnp.full(o_ref.shape, s, o_ref.dtype)

        def stream_floor(enc5, k2, vt, _wt=wt):
            return pl.pallas_call(
                sf_kern,
                grid=(1, n_ch, n_cw // _wt),
                in_specs=[
                    pl.BlockSpec((1, _wt, ih, iwe, c2),
                                 lambda bb, ii, jj: (bb, jj, ii, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, _wt, 128, n * gd // g),
                                 lambda bb, ii, jj: (bb, ii, jj, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, _wt, 128, n * dv),
                                 lambda bb, ii, jj: (bb, ii, jj, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, bh, _wt * bw, n * dv),
                    lambda bb, ii, jj: (bb, ii, jj, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct((1, hq, wq, n * dv), dt),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",) * 3
                ),
            )(enc5, k2, vt)

        t = device_time_ms(stream_floor, enc5, k2, vt, iters=8,
                           chain="scalar")
        print(f"stream-floor wt={wt}: {t:.2f} ms", flush=True)

    # ---- full-kernel diag ablations (auto wt) ----
    # NOTE: keep this tuple in sync with the _diag branches actually handled
    # in kernels/na2d_fused_q.py — the bf16 transposed-softmax rewrite
    # replaced noav/noexp/nonorm with noqk/nosum; an unknown flag would
    # silently time the full kernel while being reported as a stage floor.
    for dflag in ("", "nopool", "nocolpool", "norowblend", "norope", "noqk",
                  "nobias", "noexp", "nomask", "nosum"):
        def full(enc, keys, feats, rows_tab, cols_tab, _d=dflag):
            return _fused_q_impl(
                enc, keys, feats, rows_tab, cols_tab, d,
                num_heads=n, kernel_size=kk, scale=None, _diag=_d,
            )

        try:
            t = device_time_ms(full, enc, keys, feats, rows_tab, cols_tab,
                               iters=8, chain="scalar")
            print(f"full[{dflag or 'base'}]: {t:.2f} ms", flush=True)
        except Exception as ex:
            print(f"full[{dflag}]: FAILED {type(ex).__name__}: "
                  f"{str(ex)[:160]}", flush=True)


if __name__ == "__main__":
    main()
