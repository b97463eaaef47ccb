"""Decompose fused-NA time: transposes vs tile gather vs pallas kernel,
and sweep cell-block sizes. Dev tool, run on the TPU."""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from naf_tpu.kernels import na2d_fused as M


def timeit(f, *args, iters=5):
    for _ in range(2):
        jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(f(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def bench_config(hq, wq, hk, wk, n, d, dv, kk, bc_h, bc_w, dtype=jnp.bfloat16):
    r_h, r_w = hq // hk, wq // wk
    bh, bw = bc_h * r_h, bc_w * r_w
    n_ch, n_cw = pl.cdiv(hk, bc_h), pl.cdiv(wk, bc_w)
    nc = (bc_h + kk - 1) * (bc_w + kk - 1)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q_hm = jax.random.normal(ks[0], (1, n, hq, wq, d), dtype)
    k_tiles = jax.random.normal(ks[1], (1, n_ch, n_cw, n, nc, d), dtype)
    v_tiles = jax.random.normal(ks[2], (1, n_ch, n_cw, n, nc, dv), dtype)

    budget_rows = max((2_500_000 // 4) // max(nc * bw, 1), 1)
    chunk_rows = min(max((budget_rows // r_h) * r_h, r_h), bh)
    while bh % chunk_rows:
        chunk_rows -= r_h

    kern = functools.partial(
        M._kernel, kernel_size=kk, num_heads=n, r_h=r_h, r_w=r_w,
        bc_h=bc_h, bc_w=bc_w, hk=hk, wk=wk, scale=d ** -0.5,
        chunk_rows=chunk_rows,
    )

    @jax.jit
    def run(q_hm, k_tiles, v_tiles):
        return pl.pallas_call(
            kern,
            grid=(1, n_ch, n_cw),
            in_specs=[
                pl.BlockSpec((1, n, bh, bw, d), lambda bb, ii, jj: (bb, 0, ii, jj, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, n, nc, d), lambda bb, ii, jj: (bb, ii, jj, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, n, nc, dv), lambda bb, ii, jj: (bb, ii, jj, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, n, bh, bw, dv), lambda bb, ii, jj: (bb, 0, ii, jj, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, n, hq, wq, dv), dtype),
        )(q_hm, k_tiles, v_tiles)

    ms = timeit(run, q_hm, k_tiles, v_tiles)
    print(f"  bc=({bc_h},{bc_w}) chunk={chunk_rows} grid={n_ch}x{n_cw} nc={nc}: {ms:.2f} ms")
    return ms


def bench_pieces(hq, wq, hk, wk, n=4, d=64, dv=96, kk=9, dtype=jnp.bfloat16):
    print(f"== {hq}x{wq} from {hk}x{wk} {dtype.__name__}")
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (1, hq, wq, n, d), dtype)
    k = jax.random.normal(ks[1], (1, hk, wk, n, d), dtype)
    v = jax.random.normal(ks[2], (1, hk, wk, n, dv), dtype)

    tq = timeit(jax.jit(lambda q: jnp.transpose(q, (0, 3, 1, 2, 4))), q)
    print(f"  q transpose: {tq:.2f} ms")
    out_hm = jax.random.normal(ks[0], (1, n, hq, wq, dv), dtype)
    to = timeit(jax.jit(lambda o: jnp.transpose(o, (0, 2, 3, 1, 4))), out_hm)
    print(f"  out transpose: {to:.2f} ms")

    bcs = M.pick_cell_blocks(hq // hk, wq // wk, hk, wk, kk, n, d, dv, q.dtype.itemsize)
    print(f"  model-picked bc: {bcs}")

    @jax.jit
    def gather(k, v):
        kt = M._gather_union_tiles(k.reshape(1, hk, wk, n * d), bcs[0], bcs[1], kk)
        vt = M._gather_union_tiles(v.reshape(1, hk, wk, n * dv), bcs[0], bcs[1], kk)
        return kt, vt

    tg = timeit(gather, k, v)
    print(f"  tile gather: {tg:.2f} ms")

    for bc in [(2, 2), (3, 3), (4, 4), (8, 8), (3, 6), (2, 8)]:
        try:
            bench_config(hq, wq, hk, wk, n, d, dv, kk, *bc, dtype=dtype)
        except Exception as e:
            print(f"  bc={bc}: FAILED {str(e)[:100]}")


if __name__ == "__main__":
    bench_pieces(2048, 2048, 128, 128)
    bench_pieces(448, 448, 28, 28)
