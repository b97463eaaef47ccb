"""North-star stage decomposition IN ONE PROCESS (dev tool).

Times the full flagship forward (448^2 image, 128^2x384 feats, 2048^2 out,
bf16) and its fused-q-path stages (models/naf.py:_fused_q) in a single
process, so the deltas are reliable (CLAUDE.md: cross-process variance is
2-3x; within-process deltas are sound). Canary matmul prints first.

Stages:
  model     full model.apply
  encoder   image_encoder.encode_guarded at the guard size
  pre_attn  encoder + rope.pooled keys + rope tables (everything the
            _fused_q branch runs before naf_upsample_attention)
  fused_q   naf_upsample_attention on precomputed inputs

Run: python tools/northstar_decomp.py
"""

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/naf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    from naf_tpu.api import load_naf_params
    from naf_tpu.utils import device_time_ms

    dtype = jnp.bfloat16
    out = (2048, 2048)
    rng = np.random.RandomState(0)
    model, params = load_naf_params()
    params = jax.tree.map(lambda x: x.astype(dtype), params)
    image = jnp.asarray(rng.randn(1, 448, 448, 3), dtype)
    feats = jnp.asarray(rng.randn(1, 128, 128, 384), dtype)

    a = jnp.ones((8192, 8192), jnp.bfloat16)
    t = device_time_ms(lambda x: x @ x, a, iters=4)
    print(f"canary 8192^3: {t:.2f} ms", flush=True)

    res = {}

    def full(p, im, ft):
        return model.apply({"params": p}, im, ft, out)

    res["model"] = device_time_ms(full, params, image, feats, iters=6,
                                  chain="scalar")
    print(f"model: {res['model']:.3f} ms", flush=True)

    def enc_only(p, im):
        bound = model.bind({"params": p})
        return bound.image_encoder.encode_guarded(im, out)

    res["encoder"] = device_time_ms(enc_only, params, image, iters=6,
                                    chain="scalar")
    print(f"encoder: {res['encoder']:.3f} ms", flush=True)

    def pre_attn(p, im, ft):
        bound = model.bind({"params": p})
        enc = bound.image_encoder.encode_guarded(im, out)
        rope = bound.image_encoder.rope
        keys = rope.pooled(enc, out, ft.shape[1:3])
        sin_r, cos_r, sin_c, cos_c = rope.tables(*out)
        rows_tab = jnp.concatenate([cos_r, sin_r], axis=-1)
        cols_tab = jnp.concatenate([cos_c, sin_c], axis=-1)
        return enc, keys, rows_tab, cols_tab

    res["pre_attn"] = device_time_ms(pre_attn, params, image, feats,
                                     iters=6, chain="scalar")
    print(f"pre_attn: {res['pre_attn']:.3f} ms", flush=True)

    # precompute the attention inputs once, then time only the fused call
    enc, keys, rows_tab, cols_tab = jax.jit(pre_attn)(params, image, feats)
    from naf_tpu.kernels.na2d_fused_q import naf_upsample_attention

    bound = model.bind({"params": params})
    d_head = bound.image_encoder.rope.d_head

    def attn(e, k, f, rt, ct):
        return naf_upsample_attention(
            e, k, f, rt, ct, d_head,
            num_heads=model.heads_attn, kernel_size=model.kernel_size,
        )

    res["fused_q"] = device_time_ms(attn, enc, keys, feats, rows_tab,
                                    cols_tab, iters=6, chain="scalar")
    print(f"fused_q: {res['fused_q']:.3f} ms", flush=True)

    res["glue_residual"] = res["model"] - res["pre_attn"] - res["fused_q"]
    res["fps"] = 1e3 / res["model"]
    print(json.dumps({k: round(v, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
