import jax
import jax.numpy as jnp
import numpy as np
from naf_tpu.api import load_naf_params
from naf_tpu.utils import device_time_ms

dtype = jnp.bfloat16
rng = np.random.RandomState(0)
model, params = load_naf_params()
params = jax.tree.map(lambda x: x.astype(dtype), params)

def t(name, fn, *args, iters=6):
    ms = device_time_ms(fn, *args, iters=iters)
    print(f"{name:40s} {ms:8.2f} ms", flush=True)
    return ms

image = jnp.asarray(rng.randn(1, 448, 448, 3), dtype)
feats = jnp.asarray(rng.randn(1, 28, 28, 384), dtype)
t("e2e 448", lambda p, im, ft: model.apply({"params": p}, im, ft, (448, 448)), params, image, feats, iters=15)

H = 2048
image2 = jnp.asarray(rng.randn(1, H, H, 3), dtype)
feats2 = jnp.asarray(rng.randn(1, 128, 128, 384), dtype)
t("e2e 2048 unbanded", lambda p, im, ft: model.apply({"params": p}, im, ft, (H, H)), params, image2, feats2)
t("e2e 2048 banded(512)", lambda p, im, ft: model.apply({"params": p}, im, ft, (H, H), band_rows=512), params, image2, feats2)

image_s = jnp.asarray(rng.randn(1, 448, 448, 3), dtype)
t("e2e 448->2048 unbanded", lambda p, im, ft: model.apply({"params": p}, im, ft, (H, H)), params, image_s, feats2)

def enc(p, im):
    return model.apply({"params": p}, im, method=lambda m, x: m.image_encoder.encode(x))
t("encoder.encode @2048^2", enc, params, image2)
t("encoder.encode @448^2", enc, params, image, iters=15)
