import jax, jax.numpy as jnp, numpy as np
from naf_tpu.models.registry import build_model
from naf_tpu.utils import device_time_ms
rng = np.random.RandomState(0)
for dt in (jnp.float32, jnp.bfloat16):
    img = jnp.asarray(rng.rand(1, 448, 448, 3), dt)
    feats = jnp.asarray(rng.randn(1, 28, 28, 384), dt)
    m = build_model("FeatUp", embed_dim=384, ratio=16)
    params = m.init(jax.random.PRNGKey(0), img, feats, (448, 448))
    params = jax.tree.map(lambda a: a.astype(dt), params)
    ms = device_time_ms(lambda p, a, b: m.apply(p, a, b, (448, 448)), params, img, feats, iters=8)
    print(f"FeatUp {jnp.dtype(dt).name}: {ms:.2f} ms", flush=True)
