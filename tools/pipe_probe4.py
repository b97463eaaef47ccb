"""Overlap-killer bisection, part 3: real pool/bias code in the mimic.

Same block layout as pipe_probe3 grid3d=1 tiled_out=1 xtra=1, but the kernel
body is upgraded stepwise toward the real fused-q kernel:
  level 0: probe3 body (fake pool, no bias)          -- known ~8.9 ms
  level 1: + real column-pool dots with in-kernel rot rolls
  level 2: + real row-blend with taps + rope row tables
  level 3: + real window mask/bias build and adds
Run: python tools/pipe_probe4.py
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
    k2 = jnp.asarray(rng.randn(1, 64, 32, 128, 512) * 0.05, dt)
    vt = jnp.asarray(rng.randn(1, 64, 32, 128, 384) * 0.05, dt)
    rows = jnp.asarray(rng.randn(2048, 512), dt)
    cols = jnp.asarray(rng.randn(2048, 512), dt)
    pcol_np = np.zeros((64, 16), np.float32)
    for o in range(64):
        pcol_np[o, (o * 14) // 64] = 0.7
        pcol_np[o, min((o * 14) // 64 + 1, 15)] += 0.3
    pcol = jnp.asarray(pcol_np)
    cq = 1024
    taps = tuple(
        ((o * 7 // 32, 0.6), (min(o * 7 // 32 + 1, 6), 0.4)) for o in range(32)
    )

    def body(level, e_ref, k_ref, v_ref, r_ref, c_ref, p_ref, o_ref,
             xc_ref, xup_ref):
        c_dim = 256
        dh2 = 32
        kb_w, kk, nh, r_w, bc_w, wk = 12, 9, 4, 16, 4, 128
        hk, kb_h, r_h = 128, 10, 16
        lane_q = jax.lax.broadcasted_iota(jnp.int32, (1, cq), 1)
        i_loc_t = lane_q // 64
        j_loc_t = lane_q - i_loc_t * 64
        sub_c = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        t_idx_t = sub_c // kb_w
        s_idx_t = sub_c - t_idx_t * kb_w
        first2 = (
            jax.lax.broadcasted_iota(jnp.int32, (1, c_dim), 1) % 64
        ) < dh2
        ci0 = pl.program_id(1) * 2
        row0 = jnp.clip(ci0 - nh, 0, hk - kb_h)

        for tt in range(2):
            cj0 = (pl.program_id(2) * 2 + tt) * bc_w
            col0 = jnp.clip(cj0 - nh, 0, wk - kb_w)
            cols_t = c_ref[pl.ds(tt * 64, 64)]
            if level >= 3:
                cell_w_t = cj0 + j_loc_t // r_w
                ws_w_t = jnp.clip(cell_w_t - nh, 0, wk - kk) - col0
                ok_w_t = (s_idx_t >= ws_w_t) & (s_idx_t < ws_w_t + kk)
            # ---- pool stage ----
            if level == 0:
                for r in range(7):
                    xr = e_ref[0, tt, r].astype(jnp.float32)
                    xc_ref[r] = jnp.broadcast_to(
                        jnp.sum(xr, axis=0, keepdims=True) * 0.01, (64, 512)
                    )
                for o in range(32):
                    acc = 0.5 * xc_ref[o % 7] + 0.5 * xc_ref[(o + 1) % 7]
                    xup_ref[o] = acc[:, :256].astype(dt)
            else:
                pc = p_ref[...].astype(dt)
                ctab = cols_t.astype(jnp.float32)  # (64, 512)
                for r in range(7):
                    xr = e_ref[0, tt, r]  # (16, 256)
                    xi = pltpu.bitcast(xr, jnp.int32)
                    r1 = pltpu.bitcast(
                        pltpu.roll(xi, c_dim - dh2, 1), jnp.bfloat16
                    )
                    r2 = pltpu.bitcast(pltpu.roll(xi, dh2, 1), jnp.bfloat16)
                    rot_r = jnp.where(first2, -r1, r2).astype(xr.dtype)
                    xr = jnp.concatenate([xr, rot_r], axis=-1)  # (16, 512)
                    xc_ref[r] = jax.lax.dot_general(
                        pc, xr,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * ctab
                for o in range(32):
                    tps = taps[o]
                    acc = tps[0][1] * xc_ref[tps[0][0]]
                    for i, wgt in tps[1:]:
                        acc = acc + wgt * xc_ref[i]
                    if level >= 2:
                        q_o = (
                            acc[:, :c_dim] * r_ref[o, :c_dim]
                            + acc[:, c_dim:] * r_ref[o, c_dim:]
                        )
                    else:
                        q_o = acc[:, :c_dim]
                    xup_ref[o] = q_o.astype(dt)
            # ---- chunks ----
            for ck in range(2):
                o0 = ck * 16
                q2 = xup_ref[pl.ds(o0, 16)].reshape(cq, 256)
                if level >= 3:
                    cell_h0 = ci0 + ck
                    ws_h = jnp.clip(cell_h0 - nh, 0, hk - kk) - row0
                    ok_h_t = (t_idx_t >= ws_h) & (t_idx_t < ws_h + kk)
                    bias_t = jnp.where(
                        ok_h_t & ok_w_t, 0.0, -1e30
                    ).astype(jnp.float32)
                lts = []
                for h in range(4):
                    km = k_ref[0, 0, tt, :, h * 128 : (h + 1) * 128]
                    lt = jax.lax.dot_general(
                        km, q2[:, (h % 2) * 128 : (h % 2) * 128 + 128],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    if level >= 3:
                        lt = lt + bias_t
                    lts.append(lt)
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
                out = jnp.concatenate(outs, axis=-1)
                o_ref[0, pl.ds(o0, 16), pl.ds(tt * 64, 64)] = out.reshape(
                    16, 64, 384
                )

    for level in (0, 1, 2, 3):
        def kern(e_r, k_r, v_r, r_r, c_r, p_r, o_r, xc_r, xup_r, _l=level):
            body(_l, e_r, k_r, v_r, r_r, c_r, p_r, o_r, xc_r, xup_r)

        def run(enc5, k2, vt, rows, cols, pcol, _kern=kern):
            return pl.pallas_call(
                _kern,
                grid=(1, n_ii, n_jj),
                in_specs=[
                    pl.BlockSpec((1, 2, 7, 16, 256),
                                 lambda bb, ii, jj: (bb, jj, ii, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, 2, 128, 512),
                                 lambda bb, ii, jj: (bb, ii, jj, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, 2, 128, 384),
                                 lambda bb, ii, jj: (bb, ii, jj, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((32, 512), lambda bb, ii, jj: (ii, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((128, 512), lambda bb, ii, jj: (jj, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((64, 16), lambda bb, ii, jj: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 32, 128, 384),
                                       lambda bb, ii, jj: (bb, ii, jj, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, 2048, 2048, 384), dt),
                scratch_shapes=[
                    pltpu.VMEM((7, 64, 512), jnp.float32),
                    pltpu.VMEM((32, 64, 256), dt),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",) * 3
                ),
            )(enc5, k2, vt, rows, cols, pcol)

        try:
            t = device_time_ms(run, enc5, k2, vt, rows, cols, pcol,
                               iters=8, chain="scalar")
            print(f"level={level}: {t:.2f} ms", flush=True)
        except Exception as ex:
            print(f"level={level}: FAILED {str(ex)[:160]}", flush=True)


if __name__ == "__main__":
    main()
