"""Re-run the failed sweep rows; record structured OOM skips."""
import json
import jax.numpy as jnp
from naf_tpu.bench.harness import run_sweep

# AnyUp r16/r32 (kernel VMEM fix) + NAF r32 (was poisoned by JAFAR OOM)
run_sweep("ratio", models=["AnyUp"], values=[16, 32], dtype=jnp.bfloat16)
run_sweep("ratio", models=["NAF"], values=[32], dtype=jnp.bfloat16)
# JAFAR r32: global attention needs ~21 GB (A100 reference figure) > 16 GB
rs = json.load(open("benchmarks/results.json"))
for r in rs:
    if r.get("model") == "JAFAR" and r.get("ratio") == 32 and r.get("error"):
        r.pop("error")
        r["skip"] = ("global attention at 896^2/r32 exceeds one v5e's 16 GB "
                     "HBM (the A100-40GB reference uses 21.3 GB, "
                     "test_results.json:538-551)")
json.dump(rs, open("benchmarks/results.json", "w"), indent=1)
print("done")
