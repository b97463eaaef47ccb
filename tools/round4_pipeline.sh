#!/bin/bash
# Round-4 serialized TPU pipeline (dev tool). One TPU job at a time —
# cross-process timing contention makes concurrent TPU work unreliable
# (CLAUDE.md), and training must not overlap the timed sweeps.
#
# Ordered by evidence value for the remaining wall clock: the two
# zero-artifact quality loops first (denoising PSNR table, distilled NAF
# vs Bilinear on the seg probe), then measured memory, then targeted
# sweep refreshes. AnyUp f32 backward is excluded here (known AOT
# remote-compile crash, tracked separately).
#
# Launch detached so it survives the driving session:
#   setsid nohup bash tools/round4_pipeline.sh > /tmp/round4_pipeline.log 2>&1 &
set -x
cd /root/repo

# 1. denoising ablation (reference protocol; writes benchmarks/denoising.json)
timeout 5400 python tools/run_denoising_bench.py naf rednet ircnn

# 2. self-distillation quality loop (trained NAF vs Bilinear on the seg probe)
timeout 5400 python tools/train_distilled_eval.py 3000

# 3. device-measured peak memory for headline rows
timeout 1800 python tools/measure_mem.py

# 4. purge stale img_size-factor rows recorded under the wrong protocol
#    (lr was img/16; the reference keeps lr=28 and varies ratio implicitly)
python - <<'EOF'
import json
rows = json.load(open('benchmarks/results.json'))
keep = [r for r in rows
        if not (r.get('factor') == 'img_size' and r.get('lr_size') != 28)]
print(f"purged {len(rows)-len(keep)} stale img_size rows")
json.dump(keep, open('benchmarks/results.json', 'w'), indent=1)
EOF

# 5. refreshed sweeps (fixed backward + corrected img_size protocol)
timeout 3600 python -m naf_tpu.bench --img-size --bf16
timeout 2400 python -m naf_tpu.bench --ratio --models NAF --values 16 32
timeout 2400 python -m naf_tpu.bench --embed-dim --models NAF
timeout 1800 python -m naf_tpu.bench --large-img

echo PIPELINE_DONE
