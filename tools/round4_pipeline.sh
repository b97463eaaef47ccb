#!/bin/bash
# Round-4 serialized TPU pipeline (dev tool). One TPU job at a time —
# cross-process timing contention makes concurrent TPU work unreliable
# (CLAUDE.md), and training must not overlap the timed sweeps.
#
# Launch detached so it survives the driving session:
#   setsid nohup bash tools/round4_pipeline.sh > /tmp/round4_pipeline.log 2>&1 &
set -x
cd /root/repo

# 0. purge stale img_size-factor rows recorded under the wrong protocol
#    (lr was img/16; the reference keeps lr=28 and varies ratio implicitly)
python - <<'EOF'
import json
rows = json.load(open('benchmarks/results.json'))
keep = [r for r in rows
        if not (r.get('factor') == 'img_size' and r.get('lr_size') != 28)]
print(f"purged {len(rows)-len(keep)} stale img_size rows")
json.dump(keep, open('benchmarks/results.json', 'w'), indent=1)
EOF

# 1. refreshed sweeps (fixed backward + corrected img_size protocol)
timeout 7200 python -m naf_tpu.bench --ratio --models NAF AnyUp --values 8 16 32
timeout 7200 python -m naf_tpu.bench --img-size --bf16
timeout 7200 python -m naf_tpu.bench --img-size

# 2. device-measured peak memory for headline rows
timeout 1800 python tools/measure_mem.py

# 3. denoising ablation (reference protocol; writes benchmarks/denoising.json)
timeout 18000 python tools/run_denoising_bench.py

# 4. self-distillation quality loop (trained NAF vs Bilinear on the seg probe)
timeout 10800 python tools/train_distilled_eval.py 3000

echo PIPELINE_DONE
