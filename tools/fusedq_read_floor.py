"""Isolate the fused-q input-stream bandwidth (dev tool).

R1: read enc6+kv blocks, 64 tiny flushes (out indexed by ii only)
R2: read kv only       R3: read enc6 only
R4: R1 with mt=4 row-merge (512 programs, 4x blocks)
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

    hk = wk = 128
    n, dv, gd = 4, 96, 128
    ih, iwe, c2 = 7, 16, 512
    n_ch, n_cw = 64, 32
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    enc6 = jnp.asarray(rng.randn(1, n_cw, n_ch, ih, iwe, c2), dt)
    kv = jnp.asarray(rng.randn(1, n_ch, n_cw, 128, n * (gd + dv)), dt)

    def run(name, fn, *args):
        try:
            t = device_time_ms(fn, *args, iters=8, chain="scalar")
            print(f"{name}: {t:.2f} ms", flush=True)
        except Exception as ex:
            print(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:150]}",
                  flush=True)

    def mk(read_enc, read_kv, mt):
        def body(*refs):
            refs = list(refs)
            o_ref = refs[-1]
            s = jnp.float32(0)
            for r in refs[:-1]:
                s = s + r[(0,) * (len(r.shape) - 1)].astype(jnp.float32)[0]
            o_ref[...] = jnp.full(o_ref.shape, s, o_ref.dtype)

        in_specs, inputs = [], []
        if read_enc:
            in_specs.append(pl.BlockSpec(
                (1, 1, mt, ih, iwe, c2),
                lambda bb, ii, jj: (bb, jj, ii, 0, 0, 0),
                memory_space=pltpu.VMEM))
            inputs.append(enc6)
        if read_kv:
            in_specs.append(pl.BlockSpec(
                (1, mt, 1, 128, n * (gd + dv)),
                lambda bb, ii, jj: (bb, ii, jj, 0, 0),
                memory_space=pltpu.VMEM))
            inputs.append(kv)

        def f(*a):
            return pl.pallas_call(
                body, grid=(1, n_ch // mt, n_cw),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((1, 8, 128),
                                       lambda bb, ii, jj: (ii, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n_ch // mt, 8, 128), dt),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",) * 3),
            )(*a)

        return f

    run("R1 enc+kv mt=1", mk(True, True, 1), enc6, kv)
    run("R2 kv-only mt=1", mk(False, True, 1), kv)
    run("R3 enc-only mt=1", mk(True, False, 1), enc6)
    run("R4 enc+kv mt=4", mk(True, True, 4), enc6, kv)
    run("R5 kv-only mt=4", mk(False, True, 4), kv)


if __name__ == "__main__":
    main()
