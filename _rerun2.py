import json
import jax.numpy as jnp
from naf_tpu.bench.harness import run_sweep
run_sweep("img_size", models=["NAF"], values=[896], dtype=jnp.bfloat16)
rs = json.load(open("benchmarks/results.json"))
for r in rs:
    if (r.get("model") == "JAFAR" and r.get("factor") == "img_size"
            and r.get("img_size") == 896 and r.get("error")):
        r.pop("error")
        r["skip"] = ("global attention at 896^2/r16 (802k queries x 3.1k keys) "
                     "exceeds one v5e's HBM; runs on the A100-40GB reference")
json.dump(rs, open("benchmarks/results.json", "w"), indent=1)
print("done")
