"""Mosaic pipelining microbenchmark (dev tool).

Grid of programs, each: read an input block, run k dependent matmuls on it,
write an output block. If Pallas double-buffering overlaps DMA with compute,
time ~ max(stream, compute); if additive in k, the pipeline is serialized.

Run: python tools/pipe_probe.py
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
    from naf_tpu.utils.benchmarking import device_time_ms

    n_prog = 1024
    rows, cols = 512, 512  # 512 KB bf16 blocks
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n_prog * rows, cols), dt)
    w = jnp.asarray(rng.randn(cols, cols) * 0.05, dt)

    for k in (0, 2, 4, 8, 16):
        def kern(x_ref, w_ref, o_ref, _k=k):
            a = x_ref[...]
            wm = w_ref[...]
            for _ in range(_k):
                a = jax.lax.dot(
                    a, wm, preferred_element_type=jnp.float32
                ).astype(dt)
            o_ref[...] = a

        def run(x, w, _kern=kern):
            return pl.pallas_call(
                _kern,
                grid=(n_prog,),
                in_specs=[
                    pl.BlockSpec((rows, cols), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((cols, cols), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((rows, cols), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n_prog * rows, cols), dt),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)
                ),
            )(x, w)

        t = device_time_ms(run, x, w, iters=8, chain="scalar")
        # stream: 2 * 512KB * 1024 = 1.07 GB; matmul: k * 2*512*512^3 FLOP
        flop_ms = k * 2 * rows * cols * cols * n_prog / 188e9
        print(f"k={k:3d}: {t:6.2f} ms (pure-MXU bound {flop_ms:.2f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
