import jax, jax.numpy as jnp, numpy as np
from naf_tpu.ops.resize import resize_bicubic
from naf_tpu.ops.adaptive_conv import adaptive_conv, reflect_pad2d
from naf_tpu.utils import device_time_ms
rng = np.random.RandomState(0)
for dt in (jnp.float32, jnp.bfloat16):
    nm = jnp.dtype(dt).name
    src = jnp.asarray(rng.randn(1, 224, 224, 384), dt)
    ms = device_time_ms(lambda v: resize_bicubic(v, (448, 448)), src, iters=8)
    print(f"bicubic 224->448 {nm}: {ms:.2f} ms", flush=True)
    srcp = jnp.asarray(rng.randn(1, 454, 454, 384), dt)
    ker = jnp.asarray(rng.rand(1, 448, 448, 7, 7), dt)
    ms = device_time_ms(lambda a, b: adaptive_conv(a, b), srcp, ker, iters=8)
    print(f"adaptive_conv 448 {nm}: {ms:.2f} ms", flush=True)
    g = jnp.asarray(rng.randn(1, 448, 448, 32), dt)
    gp = reflect_pad2d(g, 3)
    def range_logits(gp, g):
        d = 7
        return jnp.stack([jnp.sum(gp[:, i:i+448, j:j+448] * g, axis=-1)
                          for i in range(d) for j in range(d)], axis=1)
    ms = device_time_ms(range_logits, gp, g, iters=8)
    print(f"range logits 448 {nm}: {ms:.2f} ms", flush=True)
