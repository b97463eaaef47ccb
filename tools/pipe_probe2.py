"""Overlap-killer bisection for the fused-q kernel structure (dev tool).

Mimics the fused-q program shape: 3 input streams (enc/k2/vt-sized), a 3 MB
output block, ~0.94 GFLOP of matmuls + exp per program, grid 1024. Toggles:
  - pool: a scratch-mediated stage of tiny dots + VPU rolls (like pool-up)
  - slices: write o_ref in 4 sub-slices vs once
  - exp: the exp2+normalize VPU stage
Run: python tools/pipe_probe2.py
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

    n_prog = 1024
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    # enc-like (2,7,16,256)=115KB, k2-like (2,128,512)=262KB,
    # vt-like (2,128,384)=196KB, out (32,128,384)=3.1MB
    enc = jnp.asarray(rng.randn(n_prog, 2, 7, 16, 256), dt)
    k2 = jnp.asarray(rng.randn(n_prog, 2, 128, 512) * 0.05, dt)
    vt = jnp.asarray(rng.randn(n_prog, 2, 128, 384) * 0.05, dt)

    cq = 1024  # queries per chunk; 4 chunks of (4 QK + 4 AV) matmuls

    def make(pool, slices, exp):
        def kern(e_ref, k_ref, v_ref, o_ref, xc_ref, xup_ref):
            if pool:
                # tiny-dot scratch stage like the column pool + row blend
                for tt in range(2):
                    for r in range(7):
                        xr = e_ref[0, tt, r]  # (16, 256)
                        xc_ref[r] = jax.lax.dot_general(
                            xr.astype(jnp.float32)[:8].T[:64],  # (64,8)->fake
                            jnp.ones((8, 256), jnp.float32),
                            dimension_numbers=(((1,), (0,)), ((), ())),
                        )[:, :256] * 0.1
                for o in range(32):
                    acc = 0.5 * xc_ref[o % 7] + 0.5 * xc_ref[(o + 1) % 7]
                    xup_ref[o] = acc[:64].astype(dt)
            outs = []
            for ck in range(4):
                q = (
                    xup_ref[(ck * 8) % 32 : (ck * 8) % 32 + 8]
                    .reshape(8 * 64, 256)
                )
                qp = jnp.pad(q, ((0, cq - 512), (0, 0)))
                lts = []
                for h in range(4):
                    km = k_ref[0, ck % 2, :, h * 128 : (h + 1) * 128]
                    lts.append(
                        jax.lax.dot_general(
                            km, qp[:, (h % 2) * 128 : (h % 2) * 128 + 128],
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    )
                ch_outs = []
                for h in range(4):
                    vm = v_ref[0, ck % 2, :, h * 96 : (h + 1) * 96]
                    if exp:
                        e = jnp.exp2(lts[h])
                        s = jnp.sum(e, axis=0, keepdims=True)
                        en = (e * (1.0 / s)).astype(dt)
                    else:
                        en = lts[h].astype(dt)
                    ch_outs.append(
                        jax.lax.dot_general(
                            en, vm,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ).astype(dt)
                    )
                out = jnp.concatenate(ch_outs, axis=-1)  # (cq, 384)
                outs.append(out.reshape(8, 128, 384)[: (8 if slices else 8)])
                if slices:
                    o_ref[pl.ds(ck * 8, 8)] = outs[-1]
            if not slices:
                o_ref[...] = jnp.concatenate(outs, axis=0)

        def run(enc, k2, vt):
            return pl.pallas_call(
                kern,
                grid=(n_prog,),
                in_specs=[
                    pl.BlockSpec((1, 2, 7, 16, 256), lambda i: (i, 0, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 2, 128, 512), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 2, 128, 384), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((32, 128, 384), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n_prog * 32, 128, 384), dt),
                scratch_shapes=[
                    pltpu.VMEM((7, 64, 256), jnp.float32),
                    pltpu.VMEM((32, 64, 256), dt),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)
                ),
            )(enc, k2, vt)

        return run

    # stream floor for this block set
    def sf_kern(e_ref, k_ref, v_ref, o_ref, xc_ref, xup_ref):
        s = (e_ref[0, 0, 0, 0].astype(jnp.float32)[0]
             + k_ref[0, 0, 0].astype(jnp.float32)[0]
             + v_ref[0, 0, 0].astype(jnp.float32)[0])
        o_ref[...] = jnp.full(o_ref.shape, s, dt)

    def sf(enc, k2, vt):
        return pl.pallas_call(
            sf_kern,
            grid=(n_prog,),
            in_specs=[
                pl.BlockSpec((1, 2, 7, 16, 256), lambda i: (i, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, 128, 512), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, 128, 384), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((32, 128, 384), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_prog * 32, 128, 384), dt),
            scratch_shapes=[
                pltpu.VMEM((7, 64, 256), jnp.float32),
                pltpu.VMEM((32, 64, 256), dt),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            ),
        )(enc, k2, vt)

    t = device_time_ms(sf, enc, k2, vt, iters=8, chain="scalar")
    print(f"stream-floor: {t:.2f} ms", flush=True)

    for pool in (False, True):
        for slices in (False, True):
            for exp in (False, True):
                try:
                    t = device_time_ms(make(pool, slices, exp), enc, k2, vt,
                                       iters=8, chain="scalar")
                    print(f"pool={int(pool)} slices={int(slices)} "
                          f"exp={int(exp)}: {t:.2f} ms", flush=True)
                except Exception as ex:
                    print(f"pool={int(pool)} slices={int(slices)} "
                          f"exp={int(exp)}: FAILED {str(ex)[:120]}",
                          flush=True)


if __name__ == "__main__":
    main()
