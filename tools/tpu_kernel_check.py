"""On-TPU fused-kernel verification + timing (compiled, not interpret).

Data is generated on device (host<->TPU transfers go through the axon tunnel
here and must stay small); large-size checks pull back only sampled rows.

Writes benchmarks/tpu_kernel_check.json so the fused-path numerics on real
hardware are a committed per-round artifact, not a transient claim.

Usage: python tools/tpu_kernel_check.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

RESULTS = {}
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "benchmarks", "tpu_kernel_check.json")

import jax
import jax.numpy as jnp
import numpy as np

from naf_tpu.kernels.na2d_fused import cross_scale_na2d_fused, fused_applicable
from naf_tpu.ops import cross_scale_na2d
from naf_tpu.ops.window import cross_scale_lr_indices


def make_qkv(hq, wq, hk, wk, n, d, dv, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (1, hq, wq, n, d), dtype)
    k = jax.random.normal(ks[1], (1, hk, wk, n, d), dtype)
    v = jax.random.normal(ks[2], (1, hk, wk, n, dv), dtype)
    return q, k, v


def check_small(hq, wq, hk, wk, n=2, d=16, dv=24, kk=9, tol=1e-4, seed=0):
    assert fused_applicable(hq, wq, hk, wk, kk)
    q, k, v = make_qkv(hq, wq, hk, wk, n, d, dv, seed=seed)
    got = cross_scale_na2d_fused(q, k, v, kk)
    want = cross_scale_na2d(q, k, v, kk)
    err = float(jnp.abs(got - want).max())
    print(f"hq={hq} wq={wq} hk={hk} wk={wk} k={kk}: max err {err:.2e}")
    RESULTS[f"fwd_small_{hq}x{wq}_{hk}x{wk}_k{kk}"] = {"max_err": err}
    assert err < tol, err


def check_bwd(hq, hk, n, d, dv, kk, dtype, tol, seed=0):
    """Chunk-grid Pallas backward vs the XLA-oracle VJP (f32 truth for
    bf16: the kernel's f32 dK/dV accumulators are closer to truth than the
    oracle's own bf16 einsum VJP, so comparisons run against f32 grads)."""
    q, k, v = make_qkv(hq, hq, hk, hk, n, d, dv, dtype=jnp.float32, seed=seed)

    def loss_fused(q, k, v):
        return jnp.sum(cross_scale_na2d_fused(q, k, v, kk) ** 2)

    def loss_oracle(q, k, v):
        return jnp.sum(cross_scale_na2d(q, k, v, kk) ** 2)

    truth = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    qd, kd, vd = (x.astype(dtype) for x in (q, k, v))
    got = jax.grad(loss_fused, argnums=(0, 1, 2))(qd, kd, vd)
    errs = [
        float(jnp.max(jnp.abs(a.astype(jnp.float32) - t))
              / (1e-6 + float(jnp.max(jnp.abs(t)))))
        for a, t in zip(got, truth)
    ]
    name = f"bwd_{hq}_{hk}_dv{dv}_{jnp.dtype(dtype).name}"
    print(f"{name}: rel errs dq/dk/dv {[round(e, 5) for e in errs]}")
    RESULTS[name] = {"rel_err_dq": errs[0], "rel_err_dk": errs[1],
                     "rel_err_dv": errs[2]}
    assert max(errs) < tol, errs


def spot_check(q, k, v, out, kk, rows, tol):
    """Numpy windowed oracle on selected HR rows; pulls back only those rows."""
    hq, hk = q.shape[1], k.shape[1]
    wq, wk = q.shape[2], k.shape[2]
    n, d = q.shape[3], q.shape[4]
    scale = d ** -0.5
    ih = cross_scale_lr_indices(hq, hk, kk)
    iw = cross_scale_lr_indices(wq, wk, kk)
    kn = np.asarray(k, np.float64)
    vn = np.asarray(v, np.float64)
    errs = []
    for i in rows:
        qi = np.asarray(q[:, i], np.float64)  # (B, Wq, n, d)
        oi = np.asarray(out[:, i], np.float64)
        kwin = kn[:, ih[i]][:, :, iw]  # (B, k, Wq, k, n, d)
        vwin = vn[:, ih[i]][:, :, iw]
        logits = np.einsum("bjnd,btjsnd->bjnts", qi * scale, kwin)
        lf = logits.reshape(*logits.shape[:3], kk * kk)
        w = np.exp(lf - lf.max(-1, keepdims=True))
        w /= w.sum(-1, keepdims=True)
        o = np.einsum("bjnts,btjsnd->bjnd", w.reshape(*lf.shape[:3], kk, kk), vwin)
        errs.append(np.abs(o - oi).max())
    e = max(errs)
    print(f"  spot rows {list(rows)}: max err {e:.2e}")
    assert e < tol, e


def timeit(f, *args, iters=20, block_each=False):
    from naf_tpu.utils import device_time_ms

    return device_time_ms(f, *args, iters=iters)


def main():
    print(jax.devices())
    check_small(48, 48, 12, 12, kk=5)
    check_small(96, 64, 12, 16, kk=9)
    check_small(112, 112, 28, 28, kk=9)
    check_small(26, 26, 13, 13, kk=9)
    check_small(64, 64, 64, 64, kk=9)
    check_small(96, 96, 16, 16, kk=9, n=4, d=64, dv=96, seed=3)

    # production config f32: 448^2 from 28^2, dim 256/4 heads, dv=96
    q, k, v = make_qkv(448, 448, 28, 28, 4, 64, 96)
    f = jax.jit(lambda q, k, v: cross_scale_na2d_fused(q, k, v, 9))
    out = f(q, k, v)
    jax.block_until_ready(out)
    spot_check(q, k, v, out, 9, [0, 1, 7, 223, 440, 447], tol=1e-4)
    ms = timeit(f, q, k, v)
    RESULTS["fwd_448_r16_f32"] = {"ms": ms}
    print("448^2 r16 fused NA f32: %.3f ms" % ms)

    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ob = f(qb, kb, vb)
    jax.block_until_ready(ob)
    spot_check(qb, kb, vb, ob, 9, [0, 223, 447], tol=5e-2)
    ms = timeit(f, qb, kb, vb)
    RESULTS["fwd_448_r16_bf16"] = {"ms": ms}
    print("448^2 r16 fused NA bf16: %.3f ms" % ms)

    # backward kernel on production shapes (incl. the once-cliffed dv=192
    # and the f32 ratio-32 case the chunk-grid redesign unlocked)
    check_bwd(448, 28, 4, 64, 96, 9, jnp.float32, 1e-3)
    check_bwd(448, 28, 4, 64, 192, 9, jnp.bfloat16, 2e-2, seed=2)
    check_bwd(896, 28, 4, 64, 96, 9, jnp.float32, 1e-3, seed=3)

    # north-star config: 2048^2 from 128^2 (bf16)
    q2, k2, v2 = make_qkv(2048, 2048, 128, 128, 4, 64, 96, dtype=jnp.bfloat16, seed=1)
    o2 = f(q2, k2, v2)
    jax.block_until_ready(o2)
    spot_check(q2, k2, v2, o2, 9, [0, 1024, 2047], tol=5e-2)
    del o2
    ms = timeit(f, q2, k2, v2, iters=8)
    RESULTS["fwd_2048_r16_bf16"] = {"ms": ms}
    print("2048^2 r16 fused NA bf16: %.3f ms" % ms)
    del q2, k2, v2

    # fully-fused upsampling attention (pool-up + RoPE + NA) vs the modular
    # XLA composition, COMPILED on device (the pytest twin runs interpret
    # mode on CPU; this is the shipping inference path incl. the in-kernel
    # rotate-half and the transposed bf16 softmax)
    from naf_tpu.kernels.na2d_fused_q import naf_upsample_attention
    from naf_tpu.nn.rope import RoPE
    from naf_tpu.ops.pool import adaptive_avg_pool2d

    def fused_q_check(hi, out_hw, hk, n, c, cv, dtype, tol, tag,
                      parity=True):
        rope = RoPE(embed_dim=c, num_heads=n)
        ks3 = jax.random.split(jax.random.PRNGKey(11), 3)
        enc = jax.random.normal(ks3[0], (1, hi, hi, c), dtype)
        vals = jax.random.normal(ks3[1], (1, hk, hk, cv), dtype)
        rp = rope.init(ks3[2], enc)

        def modular(enc, vals):
            xu = adaptive_avg_pool2d(enc, out_hw)
            x = rope.apply(rp, xu)
            keys = adaptive_avg_pool2d(x, (hk, hk))
            q = x.reshape(1, *out_hw, n, c // n)
            k = keys.reshape(1, hk, hk, n, c // n)
            v = vals.reshape(1, hk, hk, n, cv // n)
            o = cross_scale_na2d(q, k, v, 9, scale=(c // n) ** -0.5)
            return o.reshape(1, *out_hw, cv)

        def fused(enc, vals):
            keys = rope.apply(rp, enc, up_hw=out_hw, down_hw=(hk, hk),
                              method=rope.pooled)
            sr, cr, sc, cc = rope.apply(rp, out_hw[0], out_hw[1],
                                        method=rope.tables)
            rows_tab = jnp.concatenate([cr, sr], axis=-1)
            cols_tab = jnp.concatenate([cc, sc], axis=-1)
            return naf_upsample_attention(
                enc, keys, vals, rows_tab, cols_tab, c // n,
                num_heads=n, kernel_size=9,
            )

        # XLA's default matmul precision is bf16-grade even for f32 inputs;
        # the fused kernel's f32 path runs precision=HIGHEST, so the modular
        # reference must too or the comparison measures XLA's own rounding.
        prec_ctx = (jax.default_matmul_precision("float32")
                    if dtype == jnp.float32
                    else jax.default_matmul_precision("default"))
        rec = {}
        if parity:  # modular path materializes HR grids — OOMs at 2048^2
            with prec_ctx:  # covers the fused path's XLA keys glue too
                want = jax.jit(modular)(enc, vals)
                got = jax.jit(fused)(enc, vals)
            # sampled rows only (host<->TPU fetches tunnel over HTTP)
            idx = [0, out_hw[0] // 2, out_hw[0] - 1]
            err = max(
                float(jnp.max(jnp.abs(got[:, i].astype(jnp.float32)
                                      - want[:, i].astype(jnp.float32))))
                for i in idx
            )
            scale_ref = float(jnp.max(jnp.abs(want.astype(jnp.float32))))
            rec["rel_err"] = rel = err / (scale_ref + 1e-6)
            del want, got
        ms = timeit(jax.jit(fused), enc, vals, iters=10)
        rec["ms"] = ms
        print(f"fused_q {tag}: {rec}")
        RESULTS[f"fused_q_{tag}"] = rec
        if parity:
            assert rel < tol, rel
        del enc, vals
        jax.clear_caches()

    fused_q_check(112, (448, 448), 28, 4, 256, 384, jnp.float32, 2e-4,
                  "448_f32")
    fused_q_check(112, (448, 448), 28, 4, 256, 384, jnp.bfloat16, 5e-2,
                  "448_bf16")
    fused_q_check(224, (896, 896), 56, 4, 256, 384, jnp.bfloat16, 5e-2,
                  "896_bf16")
    fused_q_check(512, (2048, 2048), 128, 4, 256, 384, jnp.bfloat16, 5e-2,
                  "2048_bf16", parity=False)

    # fused encoder layers vs the flax stack (bf16 production path)
    from naf_tpu.kernels.encoder_fused import encoder_stack_fused
    from naf_tpu.nn import Encoder

    x = jax.random.normal(jax.random.PRNGKey(5), (1, 448, 448, 3), jnp.bfloat16)
    for ks in (1, 3):
        enc = Encoder(128, kernel_size=ks, ks_res=ks, num_layers=2)
        p = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16),
            enc.init(jax.random.PRNGKey(0), x)["params"],
        )
        want = jax.jit(lambda p, v: enc.apply({"params": p}, v))(p, x)
        fe = jax.jit(lambda p, v: encoder_stack_fused(p, v, 128, ks, ks, 2))
        got = fe(p, x)
        rel = float(
            jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)))
            / jnp.max(jnp.abs(want.astype(jnp.float32)))
        )
        ms = timeit(fe, p, x, iters=10)
        RESULTS[f"encoder_fused_k{ks}_448_bf16"] = {"rel_err": rel, "ms": ms}
        print(f"fused encoder k{ks} @448 rel err {rel:.2e}; {ms:.3f} ms")
        assert rel < 2e-2, rel

    # fused adaptive conv vs XLA fallback (FeatUp AdaptiveConv semantics)
    from naf_tpu.kernels.adaptive_conv_fused import adaptive_conv_fused
    from naf_tpu.ops.adaptive_conv import adaptive_conv as adaptive_conv_xla

    ks2 = jax.random.split(jax.random.PRNGKey(6), 2)
    src = jax.random.normal(ks2[0], (1, 454, 454, 384), jnp.float32)
    ker = jax.random.uniform(ks2[1], (1, 448, 448, 7, 7), jnp.float32)
    ga = jax.jit(adaptive_conv_fused)(src, ker)
    sample = jnp.abs(ga[:, ::97, ::89]).max()
    assert bool(jnp.isfinite(sample))
    ms = timeit(jax.jit(adaptive_conv_fused), src, ker, iters=10)
    RESULTS["adaptive_conv_fused_448_f32"] = {"ms": ms}
    print("adaptive conv fused @448 x384: %.3f ms" % ms)

    RESULTS["_device"] = str(jax.devices()[0])
    RESULTS["_all_passed"] = True
    with open(OUT, "w") as fjson:
        json.dump(RESULTS, fjson, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
