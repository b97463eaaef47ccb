"""Per-stage honest timing of the NAF 448->2048 upsampling path (dev tool).

Run on the real TPU:  python tools/stage_profile.py [out_size]
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from naf_tpu.api import load_naf_params
from naf_tpu.ops.pool import adaptive_avg_pool2d
from naf_tpu.utils.benchmarking import device_time_ms


def main(out=2048, img=448, ratio=16, dim=384):
    lr = out // ratio
    model, params = load_naf_params()
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(1, img, img, 3), jnp.bfloat16)
    feats = jnp.asarray(rng.randn(1, lr, lr, dim), jnp.bfloat16)

    def enc_fn(params, image):
        return model.bind({"params": params}).image_encoder.encode(image)

    enc = jax.jit(enc_fn)(params, image)
    print("enc:", enc.shape, enc.dtype)
    t_enc = device_time_ms(enc_fn, params, image, iters=8)
    print(f"encoder({img}^2): {t_enc:.2f} ms")

    def poolup_fn(enc):
        return adaptive_avg_pool2d(enc, (out, out))

    xup = jax.jit(poolup_fn)(enc)
    t_poolup = device_time_ms(poolup_fn, enc, iters=6)
    print(f"pool-up {img}->{out}: {t_poolup:.2f} ms")

    def rope_fn(xup):
        return model.bind({"params": params}).image_encoder.rope(xup)

    q = jax.jit(rope_fn)(xup)
    t_rope = device_time_ms(rope_fn, xup, iters=6)
    print(f"rope({out}^2): {t_rope:.2f} ms")

    def keys_fn(q):
        return adaptive_avg_pool2d(q, (lr, lr))

    keys = jax.jit(keys_fn)(q)
    t_keys = device_time_ms(keys_fn, q, iters=6)
    print(f"keys pool {out}->{lr}: {t_keys:.2f} ms")

    # attention: fused NA (tile build + kernel separately)
    from naf_tpu.kernels import na2d_fused as M

    n, d = 4, dim // 4  # value head dim
    nq, dq = 4, 256 // 4
    qh = q.reshape(1, out, out, nq, dq)
    kh = keys.reshape(1, lr, lr, nq, dq)
    vh = feats.reshape(1, lr, lr, n, d)
    blocks = M.pick_cell_blocks(ratio, ratio, lr, lr, 9, nq, dq, d, 2)
    print("pick_cell_blocks:", blocks)

    def na_fn(qh, kh, vh):
        return M.cross_scale_na2d_fused(qh, kh, vh, 9, scale=dq ** -0.5)

    _ = jax.jit(na_fn)(qh, kh, vh)
    t_na = device_time_ms(na_fn, qh, kh, vh, iters=6)
    print(f"NA fused e2e: {t_na:.2f} ms")

    g = M._head_group(nq, dq)
    bc_h, bc_w = blocks

    def tiles_fn(kh, vh):
        ks = (kh.astype(jnp.float32) * (dq ** -0.5)).astype(kh.dtype)
        return M._build_tiles(ks, vh, g, bc_h, bc_w, 9, 0, lr)

    k2, vt = jax.jit(tiles_fn)(kh, vh)
    print("tiles:", k2.shape, vt.shape,
          f"{(k2.size * 2 + vt.size * 2) / 2**20:.0f} MB")
    t_tiles = device_time_ms(tiles_fn, kh, vh, iters=6)
    print(f"tile build: {t_tiles:.2f} ms")

    def full_fn(params, image, feats):
        return model.apply({"params": params}, image, feats, (out, out))

    _ = jax.jit(full_fn)(params, image, feats)
    t_full = device_time_ms(full_fn, params, image, feats, iters=6)
    print(f"FULL forward: {t_full:.2f} ms ({1000/t_full:.1f} FPS)")
    print(f"stage sum: enc {t_enc:.1f} + poolup {t_poolup:.1f} + rope "
          f"{t_rope:.1f} + keys {t_keys:.1f} + na {t_na:.1f} = "
          f"{t_enc + t_poolup + t_rope + t_keys + t_na:.1f}")


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
