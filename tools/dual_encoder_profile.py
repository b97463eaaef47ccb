"""Timing of the packed dual-stack encoder vs separate stacks (dev tool).

Run on the real TPU:

    python tools/dual_encoder_profile.py [--size 2048] [--tiles 16 64]

Times one dual layer (both stacks per pass) against the separate k3 + k1
fused layers it replaces, the merged stem vs two stems, and the full
encode path. Each figure includes the timing harness's own perturb/reduce
passes; deltas are the signal. Reference equivalent: the two torch conv
stacks of src/model/naf.py:26-33.
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
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--tiles", nargs=2, type=int, default=None,
                    help="override (bh, bw) for the dual kernel")
    ap.add_argument("--skip-single", action="store_true")
    args = ap.parse_args()

    from naf_tpu.kernels.encoder_fused import (
        _pick_tiles_dual,
        _stem_dual_matmul,
        encoder_stack_fused,
        encoder_stack_fused_packed,
        gn_silu_conv_dual_fused,
        gn_silu_conv_fused,
    )
    from naf_tpu.nn.conv import Encoder
    from naf_tpu.utils.benchmarking import device_time_ms

    h = w = args.size
    c = 128
    rng = np.random.RandomState(0)

    # Large tensors are generated ON DEVICE (host->TPU rides an HTTP tunnel;
    # a 2 GB activation transfer never finishes). Small params come from host.
    @jax.jit
    def _gen():
        k = jax.random.PRNGKey(0)
        k1_, k2_ = jax.random.split(k)
        x3 = jax.random.normal(k1_, (1, h, w, 3), jnp.bfloat16)
        xp = jax.random.normal(k2_, (1, h, w, 2 * c), jnp.bfloat16) * 0.1
        return x3, xp

    x3, xp = _gen()
    scale = jnp.asarray(rng.rand(1, 2 * c) + 0.5, jnp.float32)
    shift = jnp.asarray(rng.randn(1, 2 * c) * 0.1, jnp.float32)
    wp = jnp.asarray(rng.randn(1, 1, c, c) * 0.05, jnp.bfloat16)
    ws = jnp.asarray(rng.randn(3, 3, c, c) * 0.05, jnp.bfloat16)
    bp = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    bs = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)

    tiles = tuple(args.tiles) if args.tiles else None
    print("picked tiles:", _pick_tiles_dual(h, w, c, 2), "override:", tiles)

    def dual(xp, scale, shift, wp, ws, bp, bs):
        return gn_silu_conv_dual_fused(xp, scale, shift, wp, ws, bp, bs,
                                       tiles=tiles)[0]

    try:
        t = device_time_ms(dual, xp, scale, shift, wp, ws, bp, bs,
                           iters=args.iters)
        print(f"dual layer @{h}^2: {t:.2f} ms", flush=True)
    except Exception:
        traceback.print_exc()

    if not args.skip_single:
        def k3(x, scale, shift, ws, bs):
            return gn_silu_conv_fused(x[..., c:], scale[:, c:], shift[:, c:],
                                      ws, bs, kernel_size=3)[0]

        def k1(x, scale, shift, wp, bp):
            return gn_silu_conv_fused(x[..., :c], scale[:, :c], shift[:, :c],
                                      wp, bp, kernel_size=1)[0]

        print(f"single k3 layer: "
              f"{device_time_ms(k3, xp, scale, shift, ws, bs, iters=args.iters):.2f} ms",
              flush=True)
        print(f"single k1 layer: "
              f"{device_time_ms(k1, xp, scale, shift, wp, bp, iters=args.iters):.2f} ms",
              flush=True)

    # full stacks through the packed entry (dual route) at this size
    pix = Encoder(c, kernel_size=1, ks_res=1, num_layers=2)
    sem = Encoder(c, kernel_size=3, ks_res=3, num_layers=2)
    small = jnp.zeros((1, 16, 16, 3), jnp.bfloat16)
    p_pix = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16),
        pix.init(jax.random.PRNGKey(0), small)["params"],
    )
    p_sem = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16),
        sem.init(jax.random.PRNGKey(1), small)["params"],
    )

    def packed(pp, ps, v):
        return encoder_stack_fused_packed(pp, ps, v, c, 2)

    try:
        t = device_time_ms(packed, p_pix, p_sem, x3, iters=args.iters)
        print(f"packed dual stacks e2e @{h}^2: {t:.2f} ms", flush=True)
    except Exception:
        traceback.print_exc()

    def stem(pp, ps, v):
        return _stem_dual_matmul(
            v, pp["stem"]["conv"]["kernel"], pp["stem"]["conv"]["bias"],
            ps["stem"]["conv"]["kernel"], ps["stem"]["conv"]["bias"],
        )

    print(f"merged stem: "
          f"{device_time_ms(stem, p_pix, p_sem, x3, iters=args.iters):.2f} ms",
          flush=True)

    if not args.skip_single:
        def stacks(pp, ps, v):
            return jnp.concatenate(
                [encoder_stack_fused(pp, v, c, 1, 1, 2),
                 encoder_stack_fused(ps, v, c, 3, 3, 2)], axis=-1
            )

        t = device_time_ms(stacks, p_pix, p_sem, x3, iters=args.iters)
        print(f"separate stacks e2e @{h}^2: {t:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
