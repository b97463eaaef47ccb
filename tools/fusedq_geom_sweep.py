"""Geometry sweep for the fused-q kernel at the north-star config (dev tool).

Times _fused_q_impl at 448^2 img -> 2048^2 out (r16, bf16) across every
valid (bc_h, bc_w) cell-block geometry x w_tiles x chunk budget, within ONE
process (within-process deltas are reliable; the canary matmul prints
first). pick_geometry's static choice is scored against the field so a
better point can be promoted to the picker.

Run: python tools/fusedq_geom_sweep.py [--quick]
"""

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/naf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def valid_geoms(hq, wq, hi, wi, hk, wk, kk):
    """All (bc_h, bc_w) meeting pick_geometry's constraints (not just its
    argmax)."""
    r_h, r_w = hq // hk, wq // wk
    out = []
    for bc_h in range(1, hk + 1):
        if hk % bc_h or bc_h + kk - 1 > hk:
            continue
        bh = bc_h * r_h
        if bh % 8 or (bh * hi) % hq:
            continue
        for bc_w in range(1, wk + 1):
            if wk % bc_w or bc_w + kk - 1 > wk:
                continue
            if (bc_h + kk - 1) * (bc_w + kk - 1) > 128:
                continue
            bw = bc_w * r_w
            if bw % 8 or (bw * wi) % wq:
                continue
            out.append((bc_h, bc_w))
    return out


def main():
    quick = "--quick" in sys.argv
    import naf_tpu.kernels.na2d_fused_q as fq
    from naf_tpu.utils.benchmarking import device_time_ms

    # Stability canary (CLAUDE.md): 8192^3 bf16 matmul should sit at ~5.9 ms.
    a = jnp.ones((8192, 8192), jnp.bfloat16)
    t = device_time_ms(lambda x: x @ x, a, iters=4)
    print(f"canary 8192^3: {t:.2f} ms", flush=True)

    out, img, lr = 2048, 448, 128
    dim, emb, n, kk = 256, 384, 4, 9
    d, dv = dim // n, emb // n
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    enc = jnp.asarray(rng.randn(1, img, img, dim), dt)
    keys = jnp.asarray(rng.randn(1, lr, lr, dim), dt)
    feats = jnp.asarray(rng.randn(1, lr, lr, emb), dt)
    rows_tab = jnp.asarray(rng.randn(out, 2 * dim), dt)
    cols_tab = jnp.asarray(rng.randn(out, 2 * dim), dt)

    geoms = valid_geoms(out, out, img, img, lr, lr, kk)
    picked = fq.pick_geometry(out, out, img, img, lr, lr, kk, n, d, dv, 2)
    print(f"valid geometries: {geoms}; picker chose {picked}", flush=True)

    budgets = (1024,) if quick else (512, 1024, 2048)
    results = []
    for geom in geoms:
        for wt in (1, 2, 4):
            n_cw = lr // geom[1]
            if n_cw % wt:
                continue
            for budget in budgets:
                fq._CHUNK_Q_BUDGET = budget

                def full(enc, keys, feats, rows_tab, cols_tab,
                         _g=geom, _wt=wt):
                    return fq._fused_q_impl(
                        enc, keys, feats, rows_tab, cols_tab, d,
                        num_heads=n, kernel_size=kk, scale=None,
                        geometry=_g, w_tiles=_wt,
                    )

                tag = f"geom={geom} wt={wt} budget={budget}"
                try:
                    t = device_time_ms(full, enc, keys, feats, rows_tab,
                                       cols_tab, iters=8, chain="scalar")
                    print(f"{tag}: {t:.2f} ms", flush=True)
                    results.append({"geom": list(geom), "w_tiles": wt,
                                    "budget": budget, "ms": round(t, 3)})
                except Exception as ex:
                    print(f"{tag}: FAILED {type(ex).__name__}: "
                          f"{str(ex)[:120]}", flush=True)
    fq._CHUNK_Q_BUDGET = 1024
    if results:
        best = min(results, key=lambda r: r["ms"])
        print("BEST " + json.dumps(best), flush=True)


if __name__ == "__main__":
    main()
