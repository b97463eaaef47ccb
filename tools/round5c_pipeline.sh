#!/bin/bash
# Round-5c pipeline: remaining TPU queue after the decomposition probe.
# 1. LargeImg 1792^2/r4 rows, both dtypes (VERDICT missing #1; the 896^2
#    rows are already committed) — one process per dtype.
# 2. Error-marker row refreshes (VERDICT weak #3 / next #5): AnyUp f32
#    backward (predates the row-chunked VJP), FeatUp bf16 r16, JAFAR f32
#    r32 (protocol-fixed workload is 448^2 guidance now, not 896^2).
# 3. measure_mem remaining headline configs (incremental writes).
set -x
cd /root/repo

timeout 2000 python - <<'EOF'
import sys; sys.path.insert(0, ".")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/naf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from naf_tpu.bench.harness import benchmark_large_img
print(benchmark_large_img(1792, 4, dtype=jnp.bfloat16))
EOF

timeout 2400 python - <<'EOF'
import sys; sys.path.insert(0, ".")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/naf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from naf_tpu.bench.harness import benchmark_large_img
print(benchmark_large_img(1792, 4, dtype=jnp.float32))
EOF

timeout 3600 python -m naf_tpu.bench --ratio --models AnyUp --values 8 16 32
timeout 1200 python -m naf_tpu.bench --ratio --models FeatUp --values 16 --bf16
timeout 1800 python -m naf_tpu.bench --ratio --models JAFAR --values 32

echo STAGE_5C_ROWS_DONE

timeout 4000 python tools/measure_mem.py NAF_448_384_28_896 JAFAR

echo PIPELINE_R5C_DONE
