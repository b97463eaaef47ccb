import jax
import jax.numpy as jnp
import numpy as np
from naf_tpu.api import load_naf_params
from naf_tpu.ops.pool import adaptive_avg_pool2d
from naf_tpu.utils import device_time_ms

dtype = jnp.bfloat16
rng = np.random.RandomState(0)
model, params = load_naf_params()
params = jax.tree.map(lambda x: x.astype(dtype), params)

def t(name, fn, *args, iters=6):
    ms = device_time_ms(fn, *args, iters=iters)
    print(f"{name:40s} {ms:8.2f} ms", flush=True)
    return ms

H = 2048
x = jnp.asarray(rng.randn(1, H, H, 256), dtype)
feats2 = jnp.asarray(rng.randn(1, 128, 128, 384), dtype)

def rope_fn(p, x):
    return model.apply({"params": p}, x, method=lambda m, v: m.image_encoder.rope(v))
t("rope flat @2048", rope_fn, params, x)
t("keys pool 2048->128", lambda v: adaptive_avg_pool2d(v, (128, 128)), x)

def attn(p, x, ft):
    return model.apply({"params": p}, x, adaptive_avg_pool2d(x, (128, 128)), ft,
                       method=lambda m, q, k, v: m.upsampler(q, k, v))
t("attention module (incl keys pool)", attn, params, x, feats2)

# rope + attention together (as in model after encoder)
def tail(p, x, ft):
    xr = model.apply({"params": p}, x, method=lambda m, v: m.image_encoder.rope(v))
    return model.apply({"params": p}, xr, adaptive_avg_pool2d(xr, (128, 128)), ft,
                       method=lambda m, q, k, v: m.upsampler(q, k, v))
t("rope+keys+attention", tail, params, x, feats2)

# pool-up for the 448->2048 config
xs = jnp.asarray(rng.randn(1, 448, 448, 256), dtype)
t("pool-up 448->2048", lambda v: adaptive_avg_pool2d(v, (H, H)), xs)
