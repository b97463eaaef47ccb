"""Per-stage decomposition of the fused k3 encoder layer (dev tool).

Times one gn->silu->conv k3 layer at 2048^2 / C=F=128 bf16 under the
kernel's timing-only `_diag` ablations, each in sequence within one
process (deltas within a process are reliable; CLAUDE.md):

    ""        full layer
    noact     skip the silu (isolates sigmoid VPU cost)
    norolls   skip the 2 rolled column-tap copies (dots read src 0)
    notaps    dots all read src 0 (keeps the rolls: isolates realignment)
    nodots    skip the 9 matmuls entirely (VPU+HBM floor)
    nopsum    skip the GroupNorm stats epilogue

Run: python tools/encoder_diag_profile.py [--size 2048] [--c 128]
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/naf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--c", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--diags", nargs="*",
                    default=["", "noact", "norolls", "notaps", "nodots",
                             "nopsum"])
    ap.add_argument("--tiles", nargs=2, type=int, default=None,
                    help="override (bh, bw) for program-count experiments")
    args = ap.parse_args()

    from naf_tpu.kernels.encoder_fused import gn_silu_conv_fused
    from naf_tpu.utils.benchmarking import device_time_ms

    s, c = args.size, args.c
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (1, s + 2, s + 8, c), jnp.bfloat16)
    scale = jax.random.normal(ks[1], (c,), jnp.float32) * 0.1 + 1.0
    shift = jax.random.normal(ks[2], (c,), jnp.float32) * 0.1
    w = jax.random.normal(ks[3], (9, c, c), jnp.bfloat16) * 0.05
    b = jax.random.normal(ks[4], (c,), jnp.float32) * 0.1

    in_layout = (1, 1, s, s)  # carry layout: interior at (1, 1)
    base = None
    for diag in args.diags:
        f = lambda *a: gn_silu_conv_fused(
            *a, 3, activation=True, in_layout=in_layout, _diag=diag,
            _tiles=tuple(args.tiles) if args.tiles else None,
        )[0]
        try:
            ms = device_time_ms(f, x, scale, shift, w, b, iters=args.iters)
        except Exception as e:
            print(f"{diag or 'full':>8}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}")
            continue
        if base is None and diag == "":
            base = ms
        delta = f"  (-{base - ms:.2f})" if base is not None and diag else ""
        print(f"{diag or 'full':>8}: {ms:7.2f} ms{delta}", flush=True)


if __name__ == "__main__":
    main()
