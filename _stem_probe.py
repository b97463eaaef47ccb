import jax, jax.numpy as jnp, numpy as np
from naf_tpu.utils import device_time_ms
from naf_tpu.kernels.encoder_fused import _reflect_conv_xla, encoder_stack_fused, gn_silu_conv_fused
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(1, 2048, 2048, 3), jnp.bfloat16)
k3 = jnp.asarray(rng.randn(3, 3, 3, 128), jnp.bfloat16)
k1 = jnp.asarray(rng.randn(1, 1, 3, 128), jnp.bfloat16)
b = jnp.zeros((128,), jnp.bfloat16)
ms = device_time_ms(lambda x, k, b: _reflect_conv_xla(x, k, b, 3), x, k3, b, iters=8)
print(f"stem k3 3->128 @2048: {ms:.2f} ms")
ms = device_time_ms(lambda x, k, b: _reflect_conv_xla(x, k, b, 1), x, k1, b, iters=8)
print(f"stem k1 3->128 @2048: {ms:.2f} ms")
# one fused k3 layer for reference after single-pad change
xx = jnp.asarray(rng.randn(1, 2048, 2048, 128), jnp.bfloat16)
w3 = jnp.asarray(rng.randn(3, 3, 128, 128), jnp.bfloat16)
sc = jnp.ones((128,), jnp.float32); sh = jnp.zeros((128,), jnp.float32)
f = lambda x, s, t, w, b2: gn_silu_conv_fused(x, s, t, w, b2, kernel_size=3)[0]
ms = device_time_ms(f, xx, sc, sh, w3, jnp.zeros((128,), jnp.float32), iters=8, perturb="smallest")
print(f"fused k3 layer (single pad): {ms:.2f} ms")
