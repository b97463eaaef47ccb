"""Decompose the NAF f32 ratio-32 backward (dev tool, VERDICT r4 item 5).

benchmarks/results.json has NAF f32 r32 bwd at 3,092 ms vs 51.6 ms bf16 —
a 60x dtype cliff. This probe times, at the r32 bench config (448^2
guidance -> 896^2 output, f32):

  - the fused NA kernel fwd + vjp alone (q/k/v level)
  - the XLA oracle vjp at the same shapes (the twin's fallback)
  - the pool-up + rope glue vjp alone (twin minus attention)
  - the full model train step (the bench's measurement)

Run: python tools/f32_bwd_probe.py [--dtype float32|bfloat16]
"""

import sys

sys.path.insert(0, ".")

import argparse

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/naf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--out", type=int, default=896)
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)

    from naf_tpu.kernels.na2d_fused import cross_scale_na2d_fused
    from naf_tpu.utils.benchmarking import device_time_ms

    out, img, lr = args.out, 448, 28
    n, d, dv, kk = 4, 64, 96, 9
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, out, out, n, d), dt)
    k = jnp.asarray(rng.randn(1, lr, lr, n, d), dt)
    v = jnp.asarray(rng.randn(1, lr, lr, n, dv), dt)
    g5 = jnp.asarray(rng.randn(1, out, out, n, dv), dt)

    def na_fwd(q, k, v):
        return cross_scale_na2d_fused(q, k, v, kk)

    t = device_time_ms(na_fwd, q, k, v, iters=6, chain="scalar")
    print(f"NA fwd: {t:.1f} ms", flush=True)

    def na_vjp(q, k, v, g5):
        o, f = jax.vjp(na_fwd, q, k, v)
        dq, dk, dv_ = f(g5)
        return dq

    try:
        t = device_time_ms(na_vjp, q, k, v, g5, iters=4)
        print(f"NA fwd+vjp: {t:.1f} ms", flush=True)
    except Exception as e:
        print(f"NA fwd+vjp FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)

    # glue-only vjp: pool-up + rotate einsum + rope tables (no attention)
    from naf_tpu.nn.rope import _rotate_half_matrix
    from naf_tpu.ops.pool import adaptive_avg_pool2d

    enc = jnp.asarray(rng.randn(1, img, img, n * d), dt)
    genc = jnp.asarray(rng.randn(1, out, out, n * d), dt)
    rmat = jnp.asarray(_rotate_half_matrix(n * d // 64, 64), dt)

    def glue(enc):
        xu = adaptive_avg_pool2d(enc, (out, out))
        rot = jnp.einsum("bhwc,cd->bhwd", xu, rmat)
        return xu * 0.5 + rot * 0.25

    def glue_vjp(enc, genc):
        o, f = jax.vjp(glue, enc)
        return f(genc)[0]

    t = device_time_ms(glue_vjp, enc, genc, iters=4)
    print(f"glue fwd+vjp: {t:.1f} ms", flush=True)

    # full model train step (bench protocol: 1x1 head + SGD)
    from naf_tpu.models.registry import ModelWrapper

    emb = n * dv
    wrapper = ModelWrapper(
        "NAF", embed_dim=emb, ratio=out // lr,
        init_shapes=((1, img, img, 3), (1, lr, lr, emb), (out, out)),
    )
    params = jax.tree.map(lambda a: a.astype(dt), wrapper.params)
    image = jnp.asarray(rng.randn(1, img, img, 3), dt)
    feats = jnp.asarray(rng.randn(1, lr, lr, emb), dt)
    head = jnp.asarray(rng.randn(emb, emb) * 0.01, dt)

    def loss_fn(params, head, image, feats):
        o = wrapper.model.apply({"params": params}, image, feats, (out, out))
        return jnp.mean((o @ head) ** 2)

    def train_step(params, head, image, feats):
        grads = jax.grad(loss_fn, argnums=(0, 1))(params, head, image, feats)
        params = jax.tree.map(lambda p, g: p - 1e-3 * g, params, grads[0])
        return params, head - 1e-3 * grads[1]

    try:
        t = device_time_ms(train_step, params, head, image, feats, iters=3)
        print(f"model train step: {t:.1f} ms", flush=True)
    except Exception as e:
        print(f"model train step FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)


if __name__ == "__main__":
    main()
