"""Numerics + timing of kernel v2 on the real TPU."""
import jax
import jax.numpy as jnp
import numpy as np

from naf_tpu.kernels.na2d_fused import cross_scale_na2d_fused
from naf_tpu.ops.na2d import cross_scale_na2d
from naf_tpu.utils import device_time_ms

rng = np.random.RandomState(0)

# numerics: f32 exactness vs oracle at a production-ish shape
for (H, hk, n, d, dv, dt, tol) in [
    (448, 28, 4, 64, 96, jnp.float32, 2e-5),
    (448, 28, 4, 64, 96, jnp.bfloat16, 2e-2),
    (448, 28, 4, 64, 32, jnp.bfloat16, 2e-2),   # dv=32 (dim-128 sweep)
    (256, 32, 4, 32, 64, jnp.float32, 2e-5),    # d=32 -> group of 4
]:
    q = jnp.asarray(rng.randn(1, H, H, n, d), dt)
    k = jnp.asarray(rng.randn(1, hk, hk, n, d), dt)
    v = jnp.asarray(rng.randn(1, hk, hk, n, dv), dt)
    got = jax.jit(lambda q, k, v: cross_scale_na2d_fused(q, k, v, 9))(q, k, v)
    want = jax.jit(lambda q, k, v: cross_scale_na2d(q, k, v, 9))(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want)))
    print(f"H={H} hk={hk} d={d} dv={dv} {dt.__name__}: max|err|={err:.2e} "
          f"{'OK' if err < tol else 'FAIL'}")

# timing
for (H, hk, dv, iters) in [(448, 28, 96, 20), (2048, 128, 96, 8)]:
    q = jnp.asarray(rng.randn(1, H, H, 4, 64), jnp.bfloat16)
    k = jnp.asarray(rng.randn(1, hk, hk, 4, 64), jnp.bfloat16)
    v = jnp.asarray(rng.randn(1, hk, hk, 4, dv), jnp.bfloat16)
    ms = device_time_ms(
        lambda q, k, v: cross_scale_na2d_fused(q, k, v, 9, scale=64 ** -0.5),
        q, k, v, iters=iters, perturb="smallest")
    print(f"kernel v2 @{H} (lr {hk}): {ms:.3f} ms")
