"""Fused encoder vs flax Encoder on TPU."""
import jax
import jax.numpy as jnp
import numpy as np
from naf_tpu.nn import Encoder
from naf_tpu.kernels.encoder_fused import encoder_stack_fused
from naf_tpu.utils import device_time_ms

rng = np.random.RandomState(0)

for (H, ks, dtype, tol) in [(64, 3, jnp.float32, 1e-4), (64, 1, jnp.float32, 1e-4),
                            (448, 3, jnp.bfloat16, 0.15), (448, 1, jnp.bfloat16, 0.15)]:
    x = jnp.asarray(rng.randn(1, H, H, 3), dtype)
    enc = Encoder(128, kernel_size=ks, ks_res=ks, num_layers=2)
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree.map(lambda v: v.astype(dtype), params)
    want = jax.jit(lambda p, v: enc.apply({"params": p}, v))(params, x)
    got = jax.jit(lambda p, v: encoder_stack_fused(p, v, 128, ks, ks, 2))(params, x)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
    rel = err / float(jnp.max(jnp.abs(want.astype(jnp.float32))))
    print(f"H={H} ks={ks} {dtype.__name__}: max abs err {err:.2e} (rel {rel:.2e}) "
          f"{'OK' if rel < tol else 'FAIL'}", flush=True)

# timing at 2048, bf16, full dual-stack equivalent
x = jnp.asarray(rng.randn(1, 2048, 2048, 3), jnp.bfloat16)
enc3 = Encoder(128, kernel_size=3, ks_res=3, num_layers=2)
p3 = jax.tree.map(lambda v: v.astype(jnp.bfloat16),
                  enc3.init(jax.random.PRNGKey(0), x)["params"])
ms = device_time_ms(lambda p, v: encoder_stack_fused(p, v, 128, 3, 3, 2), p3, x, iters=6)
print(f"fused sem stack (k3) @2048: {ms:.2f} ms")
ms = device_time_ms(lambda p, v: enc3.apply({"params": p}, v), p3, x, iters=6)
print(f"flax sem stack (k3) @2048:  {ms:.2f} ms")
enc1 = Encoder(128, kernel_size=1, ks_res=1, num_layers=2)
p1 = jax.tree.map(lambda v: v.astype(jnp.bfloat16),
                  enc1.init(jax.random.PRNGKey(0), x)["params"])
ms = device_time_ms(lambda p, v: encoder_stack_fused(p, v, 128, 1, 1, 2), p1, x, iters=6)
print(f"fused pixel stack (k1) @2048: {ms:.2f} ms")
ms = device_time_ms(lambda p, v: enc1.apply({"params": p}, v), p1, x, iters=6)
print(f"flax pixel stack (k1) @2048:  {ms:.2f} ms")
