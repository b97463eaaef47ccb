import jax.numpy as jnp
from naf_tpu.bench.harness import run_sweep
run_sweep("embed_dim", models=["FeatUp"], dtype=jnp.bfloat16)
run_sweep("ratio", models=["FeatUp"], values=[2, 4, 8, 16], dtype=jnp.bfloat16)
print("done")
