"""Overlap-killer bisection, part 2: grid shape + block striding (dev tool).

Replicates the fused-q kernel's REAL array shapes and index maps with the
simplified (but FLOP-matched) compute from pipe_probe2. Toggles:
  - grid3d: grid (1, 64, 16) with real index maps vs flat (1024,)
  - tiled_out: out block strided into a (1,2048,2048,384) array vs contiguous
  - xtra: rows/cols/pcol-like small side inputs (revisit index maps)
Run: python tools/pipe_probe3.py
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
    n_prog = n_ii * n_jj
    enc5 = jnp.asarray(rng.randn(1, 32, 448, 16, 256), dt)
    k2 = jnp.asarray(rng.randn(1, 64, 32, 128, 512) * 0.05, dt)
    vt = jnp.asarray(rng.randn(1, 64, 32, 128, 384) * 0.05, dt)
    rows = jnp.asarray(rng.randn(2048, 512), dt)
    cols = jnp.asarray(rng.randn(2048, 512), dt)
    cq = 1024

    def body(e_ref, k_ref, v_ref, o_ref, xc_ref, xup_ref, rows_ref=None,
             cols_ref=None):
        # pool-ish scratch stage
        for tt in range(2):
            for r in range(7):
                xr = e_ref[0, tt, r].astype(jnp.float32)  # (16,256)
                xc_ref[r] = jnp.broadcast_to(
                    jnp.sum(xr, axis=0, keepdims=True) * 0.01, (64, 256)
                )
        for o in range(32):
            acc = 0.5 * xc_ref[o % 7] + 0.5 * xc_ref[(o + 1) % 7]
            if rows_ref is not None:
                acc = acc * rows_ref[o, :256]
            xup_ref[o] = acc.astype(dt)
        for tt in range(2):
            for ck in range(2):
                q = xup_ref[pl.ds(ck * 16, 16)].reshape(cq, 256)
                if cols_ref is not None:
                    q = q * cols_ref[: cq // 16, :256].reshape(1, -1)[:, :256]
                lts = []
                for h in range(4):
                    km = k_ref[0, 0, tt, :, h * 128 : (h + 1) * 128]
                    lts.append(
                        jax.lax.dot_general(
                            km, q[:, (h % 2) * 128 : (h % 2) * 128 + 128],
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    )
                outs = []
                for h in range(4):
                    vm = v_ref[0, 0, tt, :, h * 96 : (h + 1) * 96]
                    e = jnp.exp2(lts[h])
                    s = jnp.sum(e, axis=0, keepdims=True)
                    en = (e * (1.0 / s)).astype(dt)
                    outs.append(
                        jax.lax.dot_general(
                            en, vm,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ).astype(dt)
                    )
                out = jnp.concatenate(outs, axis=-1)  # (cq, 384)
                o_ref[0, pl.ds(ck * 16, 16), pl.ds(tt * 64, 64)] = (
                    out.reshape(16, 64, 384)
                )

    scratch = [
        pltpu.VMEM((7, 64, 256), jnp.float32),
        pltpu.VMEM((32, 64, 256), dt),
    ]

    def make(grid3d, tiled_out, xtra):
        if grid3d:
            grid = (1, n_ii, n_jj)
            e_spec = pl.BlockSpec((1, 2, 7, 16, 256),
                                  lambda bb, ii, jj: (bb, jj, ii, 0, 0),
                                  memory_space=pltpu.VMEM)
            k_spec = pl.BlockSpec((1, 1, 2, 128, 512),
                                  lambda bb, ii, jj: (bb, ii, jj, 0, 0),
                                  memory_space=pltpu.VMEM)
            v_spec = pl.BlockSpec((1, 1, 2, 128, 384),
                                  lambda bb, ii, jj: (bb, ii, jj, 0, 0),
                                  memory_space=pltpu.VMEM)
            r_spec = pl.BlockSpec((32, 512), lambda bb, ii, jj: (ii, 0),
                                  memory_space=pltpu.VMEM)
            c_spec = pl.BlockSpec((128, 512), lambda bb, ii, jj: (jj, 0),
                                  memory_space=pltpu.VMEM)
            if tiled_out:
                o_spec = pl.BlockSpec((1, 32, 128, 384),
                                      lambda bb, ii, jj: (bb, ii, jj, 0),
                                      memory_space=pltpu.VMEM)
                o_shape = jax.ShapeDtypeStruct((1, 2048, 2048, 384), dt)
            else:
                o_spec = pl.BlockSpec(
                    (1, 32, 128, 384),
                    lambda bb, ii, jj: (bb, ii * n_jj + jj, 0, 0),
                    memory_space=pltpu.VMEM,
                )
                o_shape = jax.ShapeDtypeStruct((1, n_prog * 32, 128, 384), dt)
            sem = ("parallel",) * 3
        else:
            grid = (n_prog,)
            e_spec = pl.BlockSpec(
                (1, 2, 7, 16, 256),
                lambda i: (0, i % n_jj, i // n_jj, 0, 0),
                memory_space=pltpu.VMEM)
            k_spec = pl.BlockSpec(
                (1, 1, 2, 128, 512),
                lambda i: (0, i // n_jj, i % n_jj, 0, 0),
                memory_space=pltpu.VMEM)
            v_spec = pl.BlockSpec(
                (1, 1, 2, 128, 384),
                lambda i: (0, i // n_jj, i % n_jj, 0, 0),
                memory_space=pltpu.VMEM)
            r_spec = pl.BlockSpec((32, 512), lambda i: (i // n_jj, 0),
                                  memory_space=pltpu.VMEM)
            c_spec = pl.BlockSpec((128, 512), lambda i: (i % n_jj, 0),
                                  memory_space=pltpu.VMEM)
            if tiled_out:
                o_spec = pl.BlockSpec(
                    (1, 32, 128, 384),
                    lambda i: (0, i // n_jj, i % n_jj, 0),
                    memory_space=pltpu.VMEM)
                o_shape = jax.ShapeDtypeStruct((1, 2048, 2048, 384), dt)
            else:
                o_spec = pl.BlockSpec((1, 32, 128, 384),
                                      lambda i: (0, i, 0, 0),
                                      memory_space=pltpu.VMEM)
                o_shape = jax.ShapeDtypeStruct((1, n_prog * 32, 128, 384), dt)
            sem = ("parallel",)

        in_specs = [e_spec, k_spec, v_spec]
        args = [enc5, k2, vt]
        if xtra:
            in_specs += [r_spec, c_spec]
            args += [rows, cols]

        def kern(*refs):
            if xtra:
                e_r, k_r, v_r, r_r, c_r, o_r, xc_r, xup_r = refs
                body(e_r, k_r, v_r, o_r, xc_r, xup_r, r_r, c_r)
            else:
                e_r, k_r, v_r, o_r, xc_r, xup_r = refs
                body(e_r, k_r, v_r, o_r, xc_r, xup_r)

        def run(*a):
            return pl.pallas_call(
                kern,
                grid=grid,
                in_specs=in_specs,
                out_specs=o_spec,
                out_shape=o_shape,
                scratch_shapes=scratch,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=sem
                ),
            )(*a)

        return run, args

    for grid3d in (False, True):
        for tiled_out in (False, True):
            for xtra in (False, True):
                run, args = make(grid3d, tiled_out, xtra)
                try:
                    t = device_time_ms(run, *args, iters=8, chain="scalar")
                    print(f"grid3d={int(grid3d)} tiled_out={int(tiled_out)} "
                          f"xtra={int(xtra)}: {t:.2f} ms", flush=True)
                except Exception as ex:
                    print(f"grid3d={int(grid3d)} tiled_out={int(tiled_out)} "
                          f"xtra={int(xtra)}: FAILED {str(ex)[:140]}",
                          flush=True)


if __name__ == "__main__":
    main()
