#!/bin/bash
# Round-4 pipeline, stage 2 (runs after the denoising ablation completes).
# Serialized TPU jobs, ordered by remaining evidence value:
# distilled-NAF quality loop, device-measured memory, AnyUp backward-row
# refresh (the f32 bwd_error rows predate the row-chunked Pallas VJP),
# then protocol-corrected sweep refreshes.
set -x
cd /root/repo

timeout 4500 python tools/train_distilled_eval.py 3000

timeout 1800 python tools/measure_mem.py

# purge stale img_size-factor rows recorded under the wrong protocol
# (lr was img/16; the reference keeps lr=28 and varies ratio implicitly)
python - <<'EOF'
import json
rows = json.load(open('benchmarks/results.json'))
keep = [r for r in rows
        if not (r.get('factor') == 'img_size' and r.get('lr_size') != 28)]
print(f"purged {len(rows)-len(keep)} stale img_size rows")
json.dump(keep, open('benchmarks/results.json', 'w'), indent=1)
EOF

# AnyUp rows predating the row-chunked grid backward (22b6bce/e37b6b1):
# bf16 bwd 408/1924 ms and all f32 bwd_error markers should clear.
timeout 1800 python -m naf_tpu.bench --ratio --models AnyUp --values 8 16 32 --bf16
timeout 2700 python -m naf_tpu.bench --ratio --models AnyUp --values 8 16 32

timeout 3600 python -m naf_tpu.bench --img-size --bf16
timeout 1800 python -m naf_tpu.bench --ratio --models NAF --values 16 32
timeout 1500 python -m naf_tpu.bench --embed-dim --models NAF
timeout 1200 python -m naf_tpu.bench --large-img

echo PIPELINE_V2_DONE
