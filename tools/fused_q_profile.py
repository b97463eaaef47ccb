"""Stage-split profiling of the fully-fused NAF inference path (dev tool).

Run on the real TPU:

    python tools/fused_q_profile.py [--dim 256] [--img 448] [--out 2048]

Prints honest (device_time_ms) timings for the three inference stages —
encoder, separable keys, fused upsampling attention — plus the kernel's
timing-only `_diag` ablations (each is a separate compile; expect minutes
of remote-compile latency per variant on the axon tunnel):

    noqk    skip the per-head QK matmuls
    noav    skip the AV matmuls (writes a normalized slice of e instead)
    noexp   skip the softmax exp
    nomask  zero window bias
    norope  skip the in-kernel RoPE
    nopool  skip the pool-up stage (reads garbage xup; timing only)

and a w_tiles sweep (merged column tiles per program — the program-count
lever). NOTE each stage figure includes the timing harness's own HBM passes
(input perturb + full output reduce, ~4-5 ms at 2048^2 outputs); deltas
between variants are the meaningful signal. Reference equivalent: one
natten call (src/layers/attentions.py:72) — the reference has no per-stage
decomposition to compare against.
"""

import argparse
import sys
import traceback

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/naf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--img", type=int, default=448)
    ap.add_argument("--out", type=int, default=2048)
    ap.add_argument("--ratio", type=int, default=16)
    ap.add_argument("--embed", type=int, default=384)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--diags", nargs="*", default=[
        "", "noqk", "noav", "noexp", "nomask", "norope", "nopool"])
    ap.add_argument("--w-tiles", nargs="*", type=int, default=[])
    args = ap.parse_args()

    from naf_tpu.api import load_naf_params
    from naf_tpu.kernels.na2d_fused_q import naf_upsample_attention, _fused_q_impl
    from naf_tpu.utils.benchmarking import device_time_ms

    mdl, prms = load_naf_params(dim=args.dim)
    prms = jax.tree.map(lambda a: a.astype(jnp.bfloat16), prms)
    out, lr = args.out, args.out // args.ratio
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(1, args.img, args.img, 3), jnp.bfloat16)
    feats = jnp.asarray(rng.randn(1, lr, lr, args.embed), jnp.bfloat16)

    def enc_fn(p, i):
        return mdl.apply(
            {"params": p}, i, (out, out),
            method=lambda m, im, os: m.image_encoder.encode_guarded(im, os),
        )

    enc = jax.jit(enc_fn)(prms, image)

    def keys_fn(p, e):
        return mdl.apply(
            {"params": p}, e,
            method=lambda m, ee: m.image_encoder.rope.pooled(
                ee, (out, out), (lr, lr)
            ),
        )

    keys = jax.jit(keys_fn)(prms, enc)
    sin_r, cos_r, sin_c, cos_c = mdl.apply(
        {"params": prms},
        method=lambda m: m.image_encoder.rope.tables(out, out),
    )
    rows_tab = jnp.concatenate([cos_r, sin_r], -1).astype(jnp.bfloat16)
    cols_tab = jnp.concatenate([cos_c, sin_c], -1).astype(jnp.bfloat16)

    print(f"encoder({args.img}^2): "
          f"{device_time_ms(enc_fn, prms, image, iters=args.iters):.2f} ms")
    print(f"keys rope.pooled: "
          f"{device_time_ms(keys_fn, prms, enc, iters=args.iters):.2f} ms")

    d_head = args.dim // 4
    for d in args.diags:
        def att(enc, keys, feats, rows_tab, cols_tab, _d=d):
            return _fused_q_impl(
                enc, keys, feats, rows_tab, cols_tab, d_head,
                num_heads=4, kernel_size=9, scale=None, _diag=_d,
            )

        try:
            t = device_time_ms(att, enc, keys, feats, rows_tab, cols_tab,
                               iters=args.iters)
            print(f"fused-q[{d or 'base'}]: {t:.2f} ms", flush=True)
        except Exception:
            traceback.print_exc()

    for wt in args.w_tiles:
        def att(enc, keys, feats, rows_tab, cols_tab, _wt=wt):
            return naf_upsample_attention(
                enc, keys, feats, rows_tab, cols_tab, d_head,
                num_heads=4, kernel_size=9, w_tiles=_wt,
            )

        try:
            t = device_time_ms(att, enc, keys, feats, rows_tab, cols_tab,
                               iters=args.iters)
            print(f"fused-q w_tiles={wt}: {t:.2f} ms", flush=True)
        except Exception:
            traceback.print_exc()


if __name__ == "__main__":
    main()
