"""Round-5 dev probe: fused-q pipelining + tile-build cost (dev tool).

Times, within one process at the north-star config (448^2 img -> 2048^2 out,
r16, bf16):
  - _build_tiles_q alone (host-side K/V union gather)
  - the full _fused_q_impl at w_tiles in {1, 2} and chunk budgets
  - kernel-only (prebuilt k2/vt path is internal, so full-impl deltas stand in)

Run: python tools/fusedq_dev.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/naf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    import naf_tpu.kernels.na2d_fused_q as fq
    from naf_tpu.kernels.na2d_fused import _head_group
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

    bc_h, bc_w = fq.pick_geometry(out, out, img, img, lr, lr, kk, n, d, dv, 2)
    g = _head_group(n, fq._head_pad(d, False))
    scale = d ** -0.5 * 1.4426950408889634
    k5 = keys.reshape(1, lr, lr, n, d)
    k_scaled = (k5.astype(jnp.float32) * scale).astype(dt)
    v5 = feats.reshape(1, lr, lr, n, dv).astype(dt)

    def build(k_scaled, v5):
        return fq._build_tiles_q(k_scaled, v5, g, bc_h, bc_w, kk, 0, None)

    t = device_time_ms(build, k_scaled, v5, iters=8)
    print(f"build_tiles: {t:.2f} ms", flush=True)

    for wt in (1, 2):
        for budget in (512, 1024):
            fq._CHUNK_Q_BUDGET = budget

            def full(enc, keys, feats, rows_tab, cols_tab, _wt=wt):
                return fq._fused_q_impl(
                    enc, keys, feats, rows_tab, cols_tab, d,
                    num_heads=n, kernel_size=kk, scale=None, w_tiles=_wt,
                )

            try:
                t = device_time_ms(full, enc, keys, feats, rows_tab,
                                   cols_tab, iters=8, chain="scalar")
                print(f"full wt={wt} budget={budget}: {t:.2f} ms", flush=True)
            except Exception as ex:
                print(f"full wt={wt} budget={budget}: FAILED "
                      f"{type(ex).__name__}: {str(ex)[:140]}", flush=True)
    fq._CHUNK_Q_BUDGET = 1024


if __name__ == "__main__":
    main()
