"""Why don't the fused-q kernel's DMAs overlap? Stream-floor variants (dev).

Variants (all north-star geometry, bf16):
  A  baseline stream-floor: enc5 strided block + k2 + vt, out write
  B  enc6 contiguous block (reshape (448) -> (64, 7) host-side, free)
  C  B + row-merged tiles mt=2 (half the programs, 2x out block)
  D  read-only floor (tiny out): are the input streams themselves fast?
  E  B with grid (b, jj, ii) (ii minor) instead of (b, ii, jj)

Run: python tools/fusedq_stream_probe.py
"""

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
    from naf_tpu.utils.benchmarking import device_time_ms

    hq = wq = 2048
    hk = wk = 128
    n, dv, gd = 4, 96, 128
    bh, bw, ih, iwe, c2 = 32, 64, 7, 16, 512
    n_ch, n_cw = 64, 32
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    enc5 = jnp.asarray(rng.randn(1, n_cw, 448, iwe, c2), dt)
    enc6 = enc5.reshape(1, n_cw, n_ch, ih, iwe, c2)
    k2 = jnp.asarray(rng.randn(1, n_ch, n_cw, 128, n * gd), dt)
    vt = jnp.asarray(rng.randn(1, n_ch, n_cw, 128, n * dv), dt)

    def run(name, fn, *args):
        try:
            t = device_time_ms(fn, *args, iters=8, chain="scalar")
            print(f"{name}: {t:.2f} ms", flush=True)
        except Exception as ex:
            print(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:150]}",
                  flush=True)

    def body(e_ref, k_ref, v_ref, o_ref):
        ei = (0,) * (len(e_ref.shape) - 1)
        ki = (0,) * (len(k_ref.shape) - 1)
        s = (e_ref[ei].astype(jnp.float32)[0]
             + k_ref[ki].astype(jnp.float32)[0]
             + v_ref[ki].astype(jnp.float32)[0])
        o_ref[...] = jnp.full(o_ref.shape, s, o_ref.dtype)

    # A: baseline (same as fusedq_floor stream-floor wt=1)
    def va(enc5, k2, vt):
        return pl.pallas_call(
            body, grid=(1, n_ch, n_cw),
            in_specs=[
                pl.BlockSpec((1, 1, ih, iwe, c2),
                             lambda bb, ii, jj: (bb, jj, ii, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, 128, n * gd),
                             lambda bb, ii, jj: (bb, ii, jj, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, 128, n * dv),
                             lambda bb, ii, jj: (bb, ii, jj, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bh, bw, n * dv),
                                   lambda bb, ii, jj: (bb, ii, jj, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, hq, wq, n * dv), dt),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",) * 3),
        )(enc5, k2, vt)

    run("A enc5-strided", va, enc5, k2, vt)

    # B: contiguous enc6 block
    def vb(enc6, k2, vt):
        return pl.pallas_call(
            body, grid=(1, n_ch, n_cw),
            in_specs=[
                pl.BlockSpec((1, 1, 1, ih, iwe, c2),
                             lambda bb, ii, jj: (bb, jj, ii, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, 128, n * gd),
                             lambda bb, ii, jj: (bb, ii, jj, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, 128, n * dv),
                             lambda bb, ii, jj: (bb, ii, jj, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bh, bw, n * dv),
                                   lambda bb, ii, jj: (bb, ii, jj, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, hq, wq, n * dv), dt),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",) * 3),
        )(enc6, k2, vt)

    run("B enc6-contig", vb, enc6, k2, vt)

    # C: B + merged row tiles (mt=2): grid (1, 32, 32), out block 64 rows
    mt = 2
    def vc(enc6, k2, vt):
        return pl.pallas_call(
            body, grid=(1, n_ch // mt, n_cw),
            in_specs=[
                pl.BlockSpec((1, 1, mt, ih, iwe, c2),
                             lambda bb, ii, jj: (bb, jj, ii, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mt, 1, 128, n * gd),
                             lambda bb, ii, jj: (bb, ii, jj, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mt, 1, 128, n * dv),
                             lambda bb, ii, jj: (bb, ii, jj, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, mt * bh, bw, n * dv),
                                   lambda bb, ii, jj: (bb, ii, jj, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, hq, wq, n * dv), dt),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",) * 3),
        )(enc6, k2, vt)

    run("C mt=2 merged-rows", vc, enc6, k2, vt)

    # D: read-only floor — same input blocks, tiny out
    def vd(enc6, k2, vt):
        return pl.pallas_call(
            body, grid=(1, n_ch, n_cw),
            in_specs=[
                pl.BlockSpec((1, 1, 1, ih, iwe, c2),
                             lambda bb, ii, jj: (bb, jj, ii, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, 128, n * gd),
                             lambda bb, ii, jj: (bb, ii, jj, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, 128, n * dv),
                             lambda bb, ii, jj: (bb, ii, jj, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, 128),
                                   lambda bb, ii, jj: (bb, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), dt),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",) * 3),
        )(enc6, k2, vt)

    run("D read-only", vd, enc6, k2, vt)

    # E: B with ii as the minor grid dim
    def ve(enc6, k2, vt):
        return pl.pallas_call(
            body, grid=(1, n_cw, n_ch),
            in_specs=[
                pl.BlockSpec((1, 1, 1, ih, iwe, c2),
                             lambda bb, jj, ii: (bb, jj, ii, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, 128, n * gd),
                             lambda bb, jj, ii: (bb, ii, jj, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, 128, n * dv),
                             lambda bb, jj, ii: (bb, ii, jj, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bh, bw, n * dv),
                                   lambda bb, jj, ii: (bb, ii, jj, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, hq, wq, n * dv), dt),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",) * 3),
        )(enc6, k2, vt)

    run("E ii-minor", ve, enc6, k2, vt)

    # F/G: B with deeper input buffering (hide per-DMA latency)
    def make_buffered(nbuf, look):
        bm = pl.Buffered(buffer_count=nbuf, use_lookahead=look)

        def vf(enc6, k2, vt):
            return pl.pallas_call(
                body, grid=(1, n_ch, n_cw),
                in_specs=[
                    pl.BlockSpec((1, 1, 1, ih, iwe, c2),
                                 lambda bb, ii, jj: (bb, jj, ii, 0, 0, 0),
                                 memory_space=pltpu.VMEM, pipeline_mode=bm),
                    pl.BlockSpec((1, 1, 1, 128, n * gd),
                                 lambda bb, ii, jj: (bb, ii, jj, 0, 0),
                                 memory_space=pltpu.VMEM, pipeline_mode=bm),
                    pl.BlockSpec((1, 1, 1, 128, n * dv),
                                 lambda bb, ii, jj: (bb, ii, jj, 0, 0),
                                 memory_space=pltpu.VMEM, pipeline_mode=bm),
                ],
                out_specs=pl.BlockSpec((1, bh, bw, n * dv),
                                       lambda bb, ii, jj: (bb, ii, jj, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, hq, wq, n * dv), dt),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",) * 3),
            )(enc6, k2, vt)

        return vf

    run("F inbuf=3", make_buffered(3, False), enc6, k2, vt)
    run("G inbuf=4", make_buffered(4, False), enc6, k2, vt)
    run("H inbuf=4+lookahead", make_buffered(4, True), enc6, k2, vt)

    # I: packed K/V (one DMA for k2+vt)
    kv = jnp.concatenate([k2, vt], axis=-1)

    def body2(e_ref, kv_ref, o_ref):
        ei = (0,) * (len(e_ref.shape) - 1)
        ki = (0,) * (len(kv_ref.shape) - 1)
        s = (e_ref[ei].astype(jnp.float32)[0]
             + kv_ref[ki].astype(jnp.float32)[0])
        o_ref[...] = jnp.full(o_ref.shape, s, o_ref.dtype)

    def vi(enc6, kv):
        return pl.pallas_call(
            body2, grid=(1, n_ch, n_cw),
            in_specs=[
                pl.BlockSpec((1, 1, 1, ih, iwe, c2),
                             lambda bb, ii, jj: (bb, jj, ii, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, 128, n * (gd + dv)),
                             lambda bb, ii, jj: (bb, ii, jj, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bh, bw, n * dv),
                                   lambda bb, ii, jj: (bb, ii, jj, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, hq, wq, n * dv), dt),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",) * 3),
        )(enc6, kv)

    run("I packed-kv", vi, enc6, kv)


if __name__ == "__main__":
    main()
