"""Micro-bench: rope.pooled current einsum form vs channel-major
dot_general form, at the north-star config (448^2 enc -> 2048^2 -> 128^2),
plus the model total with the wt=1 picker. One process; canary first.

The "ckj,bjwc->bkwc" application einsums batch over C on the MINOR dim
(CLAUDE.md: ~25x off peak at 2K). The c-major variant transposes x/rot to
(C, b, j, w) once and runs the same contractions as major-batched
dot_generals.

Run: python tools/pooled_probe.py
"""

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
    enc = jnp.asarray(rng.randn(1, 448, 448, 256), dtype)

    a = jnp.ones((8192, 8192), jnp.bfloat16)
    print(f"canary 8192^3: {device_time_ms(lambda x: x @ x, a, iters=4):.2f} ms",
          flush=True)

    bound = model.bind({"params": params})
    rope = bound.image_encoder.rope

    def cur(e):
        # re-bind inside the trace: a module bound outside caches
        # first-trace tables in setup and leaks tracers across traces
        r = model.bind({"params": params}).image_encoder.rope
        return r.pooled(e, out, (128, 128))

    t_cur = device_time_ms(cur, enc, iters=6)
    print(f"pooled current: {t_cur:.3f} ms", flush=True)

    # --- channel-major variant (same math) ---
    import math as _math
    from naf_tpu.ops.pool import _pool_matrix
    from naf_tpu.nn.rope import _axis_coords

    kh = kw = 128
    oh, ow = out
    hi = wi = 448
    ch_, cw_ = _axis_coords(oh, ow, rope.normalize_coords)
    nfreq = rope.d_head // 4

    def axis_mats(out_len, mid_len, in_len, coords):
        ang = (2.0 * _math.pi) * jnp.asarray(coords)[:, None] / rope.periods
        pu = jnp.asarray(_pool_matrix(in_len, mid_len))
        pd = jnp.asarray(_pool_matrix(mid_len, out_len))
        ones = jnp.ones((mid_len, 1), jnp.float32)
        uniq = jnp.concatenate([jnp.cos(ang), jnp.sin(ang), ones], axis=-1)
        return jnp.einsum("oi,iu,ij->uoj", pd, uniq, pu)

    def expand(a_uniq, this_axis_first):
        f = np.arange(nfreq)
        one = 2 * nfreq
        if this_axis_first:
            cos_map = np.concatenate([f, [one] * nfreq] * 2)
            sin_map = np.concatenate([f + nfreq, [one] * nfreq] * 2)
        else:
            cos_map = np.concatenate([[one] * nfreq, f] * 2)
            sin_map = np.concatenate([[one] * nfreq, f + nfreq] * 2)
        cos_map = np.tile(cos_map, rope.num_heads)
        sin_map = np.tile(sin_map, rope.num_heads)
        return a_uniq[jnp.asarray(cos_map)], a_uniq[jnp.asarray(sin_map)]

    ar_cos, ar_sin = expand(axis_mats(kh, oh, hi, ch_), True)
    ac_cos, ac_sin = expand(axis_mats(kw, ow, wi, cw_), False)
    ar_cos, ar_sin = ar_cos.astype(dtype), ar_sin.astype(dtype)
    ac_cos, ac_sin = ac_cos.astype(dtype), ac_sin.astype(dtype)
    rmat = rope.rotate_matrix(dtype)

    def cmajor(e):
        xt = jnp.transpose(e, (3, 0, 1, 2))           # (C, b, j, w)
        c = xt.shape[0]
        rt = jax.lax.dot_general(                     # rot in c-major
            rmat, xt.reshape(c, -1), (((0,), (0,)), ((), ())),
        ).reshape(xt.shape)                           # (C, b, j, w)

        def apply(arow, acol, src):
            t = jax.lax.dot_general(                  # (C,k,j)x(C,b,j,w)
                arow, src, (((2,), (2,)), ((0,), (0,))),
            )                                         # (C, k, b, w)
            t = jax.lax.dot_general(                  # (C,l,w)x(C,k,b,w)
                acol, t, (((2,), (3,)), ((0,), (0,))),
            )                                         # (C, l, k, b)
            return t

        y = apply(ar_cos, ac_cos, xt) + apply(ar_sin, ac_sin, rt)
        return jnp.transpose(y, (3, 2, 1, 0))         # (b, k, l, C)

    t_cm = device_time_ms(cmajor, enc, iters=6)
    print(f"pooled c-major: {t_cm:.3f} ms", flush=True)

    ref = jax.jit(cur)(enc)
    got = jax.jit(cmajor)(enc)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
                / (jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-9))
    print(f"rel err vs current: {err:.2e}", flush=True)

    def full(p, im, ft):
        return model.apply({"params": p}, im, ft, out)

    ms = device_time_ms(full, params, image, feats, iters=6, chain="scalar")
    print(f"model (wt=1 picker): {ms:.3f} ms -> {1e3/ms:.2f} FPS", flush=True)


if __name__ == "__main__":
    main()
