import jax, jax.numpy as jnp, numpy as np
from naf_tpu.kernels.na2d_fused import cross_scale_na2d_fused
rng = np.random.RandomState(0)
# AnyUp at 448/r16: q (448,448,8,32), k (28,28,8,32), v dv=48
q = jnp.asarray(rng.randn(1, 448, 448, 8, 32), jnp.bfloat16)
k = jnp.asarray(rng.randn(1, 28, 28, 8, 32), jnp.bfloat16)
v = jnp.asarray(rng.randn(1, 28, 28, 8, 48), jnp.bfloat16)
out = jax.jit(lambda a, b, c: cross_scale_na2d_fused(a, b, c, 7))(q, k, v)
out.block_until_ready()
print("ok", out.shape)
