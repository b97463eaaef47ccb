"""One-metric probe: fps_448to2048_r16 in a fresh process (dev tool).

Replicates bench.py's north-star measurement exactly (448^2 image,
128^2x384 feats, 2048^2 output, bf16, scalar chain) without the other
metrics, so a kernel change can be validated quickly and reliably
(CLAUDE.md: one metric per process).

Run: python tools/north_star.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/naf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    from naf_tpu.api import load_naf_params
    from naf_tpu.utils import device_time_ms

    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    model, params = load_naf_params()
    params = jax.tree.map(lambda x: x.astype(dtype), params)

    image = jnp.asarray(rng.randn(1, 448, 448, 3), dtype)
    feats2 = jnp.asarray(rng.randn(1, 128, 128, 384), dtype)

    def f3(p, im, ft):
        return model.apply({"params": p}, im, ft, (2048, 2048))

    ms = device_time_ms(f3, params, image, feats2, iters=6, chain="scalar")
    print(f"fps_448to2048_r16 = {1e3 / ms:.2f}  ({ms:.2f} ms)")


if __name__ == "__main__":
    main()
