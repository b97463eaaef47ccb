"""Probe per-program overhead of the fused k1 kernel across tile sizes."""
import functools
import jax
import jax.numpy as jnp
import numpy as np
import naf_tpu.kernels.encoder_fused as EF
from naf_tpu.utils import device_time_ms

rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(1, 2048, 2048, 128), jnp.bfloat16)
scale = jnp.ones((128,), jnp.float32)
shift = jnp.zeros((128,), jnp.float32)
w1 = jnp.asarray(rng.randn(1, 1, 128, 128), jnp.bfloat16)
w3 = jnp.asarray(rng.randn(3, 3, 128, 128), jnp.bfloat16)
b = jnp.zeros((128,), jnp.float32)

orig = EF._pick_tiles
for (bh, bw) in [(8, 256), (16, 256), (16, 512), (32, 512), (8, 2048), (32, 256)]:
    EF._pick_tiles = lambda *a, _t=(bh, bw), **k: _t
    EF.gn_silu_conv_fused._clear_cache()
    for name, w, kk in [("k1", w1, 1), ("k3", w3, 3)]:
        try:
            f = lambda x, s, sh, w, b: EF.gn_silu_conv_fused(x, s, sh, w, b, kernel_size=kk)[0]
            ms = device_time_ms(f, x, scale, shift, w, b, iters=8, perturb="smallest")
            print(f"{name} bh={bh:3d} bw={bw:4d}: {ms:7.2f} ms", flush=True)
        except Exception as e:
            msg = str(e)
            import re
            m = re.search(r"size ([0-9.]+)M", msg)
            print(f"{name} bh={bh:3d} bw={bw:4d}: FAIL {m.group(1)+'M vmem' if m else msg[:80]}", flush=True)
