#!/bin/bash
# Round-5d: LargeImg 1792^2 rows via two-program timing (the fused single
# program crashes the v5e worker in bf16 and exceeds HBM at compile in
# f32 — see benchmark_large_img docstring), then the remaining
# measured-memory configs (incremental, resumable).
set -x
cd /root/repo

timeout 2000 python - <<'EOF'
import sys; sys.path.insert(0, ".")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/naf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from naf_tpu.bench.harness import benchmark_large_img
print(benchmark_large_img(1792, 4, dtype=jnp.bfloat16, split_programs=True))
EOF

timeout 2400 python - <<'EOF'
import sys; sys.path.insert(0, ".")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/naf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from naf_tpu.bench.harness import benchmark_large_img
print(benchmark_large_img(1792, 4, dtype=jnp.float32, split_programs=True))
EOF

echo STAGE_5D_LARGEIMG_DONE

timeout 3000 python tools/measure_mem.py NAF_448_384_28_896 JAFAR

echo PIPELINE_R5D_DONE
