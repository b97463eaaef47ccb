"""DMA-floor experiments: stream count vs read-while-write bandwidth.

Variants at the fused-q block geometry (448^2 -> 2048^2, r16, bf16):
  A write-only floor          (known ~4.6 ms)
  B read-only floor           (inputs DMA'd, tiny output)
  C split k2/vt streams       (known ~8.3 ms)
  D merged kv single stream   (one (128, 896) block)
  E merged kv + no enc stream
Run: python tools/pipe_probe5.py
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

    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    n_ii, n_jj = 64, 16
    enc5 = jnp.asarray(rng.randn(1, 32, 448, 16, 256), dt)
    k2 = jnp.asarray(rng.randn(1, 64, 32, 128, 512), dt)
    vt = jnp.asarray(rng.randn(1, 64, 32, 128, 384), dt)
    kv = jnp.asarray(rng.randn(1, 64, 32, 128, 896), dt)

    e_spec = pl.BlockSpec((1, 2, 7, 16, 256),
                          lambda bb, ii, jj: (bb, jj, ii, 0, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, 1, 2, 128, 512),
                          lambda bb, ii, jj: (bb, ii, jj, 0, 0),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, 1, 2, 128, 384),
                          lambda bb, ii, jj: (bb, ii, jj, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, 2, 128, 896),
                           lambda bb, ii, jj: (bb, ii, jj, 0, 0),
                           memory_space=pltpu.VMEM)
    big_out = pl.BlockSpec((1, 32, 128, 384), lambda bb, ii, jj: (bb, ii, jj, 0),
                           memory_space=pltpu.VMEM)
    big_shape = jax.ShapeDtypeStruct((1, 2048, 2048, 384), dt)
    tiny_out = pl.BlockSpec((1, 8, 128), lambda bb, ii, jj: (bb, ii, jj),
                            memory_space=pltpu.VMEM)
    tiny_shape = jax.ShapeDtypeStruct((1, 8 * n_ii, 128 * n_jj), dt)

    def run_case(name, in_specs, args, out_spec, out_shape):
        def kern(*refs):
            o_ref = refs[-1]
            s = jnp.float32(0)
            for r in refs[:-1]:
                s = s + r[(0,) * (len(r.shape) - 2) + (0,)].astype(
                    jnp.float32
                )[0]
            o_ref[...] = jnp.full(o_ref.shape, s, o_ref.dtype)

        def run(*a):
            return pl.pallas_call(
                kern,
                grid=(1, n_ii, n_jj),
                in_specs=in_specs,
                out_specs=out_spec,
                out_shape=out_shape,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",) * 3
                ),
            )(*a)

        t = device_time_ms(run, *args, iters=8, chain="scalar")
        print(f"{name}: {t:.2f} ms", flush=True)

    run_case("A write-only", [
        pl.BlockSpec((1, 128), lambda bb, ii, jj: (0, 0),
                     memory_space=pltpu.VMEM)
    ], [jnp.ones((1, 128), dt)], big_out, big_shape)
    run_case("B read-only ", [e_spec, k_spec, v_spec], [enc5, k2, vt],
             tiny_out, tiny_shape)
    run_case("C split kv  ", [e_spec, k_spec, v_spec], [enc5, k2, vt],
             big_out, big_shape)
    run_case("D merged kv ", [e_spec, kv_spec], [enc5, kv], big_out,
             big_shape)
    run_case("E kv only   ", [kv_spec], [kv], big_out, big_shape)


if __name__ == "__main__":
    main()
