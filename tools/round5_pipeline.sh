#!/bin/bash
# Round-5 pipeline: serialized TPU jobs, ordered by evidence value.
# Stage A (artifacts; ~1.5 h): kernel-check numerics for the raw-K kernel,
# LargeImg rows (both dtypes), lr_size sweep, re-measures of the flagged
# bwd<fwd tiny rows, device-measured memory (fixed one-trial-per-process
# probe). Stage B (long): the reference-budget 25k-step distillation +
# distilled seg/DAVIS evals.
set -x
cd /root/repo

# A0. North-star baseline + fused-q geometry sweep (kernel tuning evidence;
# a winning point gets promoted into pick_geometry afterwards)
timeout 1200 python tools/north_star.py
timeout 2400 python tools/fusedq_geom_sweep.py --quick

# A1. TPU numerics artifact for the round-5 kernel state
timeout 2400 python tools/tpu_kernel_check.py

# A2. LargeImg end-to-end rows (reference test_results.json:553-579)
timeout 2400 python -m naf_tpu.bench --large-img --bf16
timeout 3600 python -m naf_tpu.bench --large-img

# A3. lr_size sweep (reference grid: [32])
timeout 2400 python -m naf_tpu.bench --lr-size --bf16
timeout 3600 python -m naf_tpu.bench --lr-size

# A4. re-measure rows flagged bwd_ms < fwd_ms (sanity gate re-times with a
# longer chain now; JAFAR r2 bf16, Nearest r4 bf16, Bilinear/Nearest f32)
timeout 1800 python -m naf_tpu.bench --ratio --models JAFAR Nearest --values 2 4 --bf16
timeout 1800 python -m naf_tpu.bench --ratio --models Bilinear Nearest --values 2 4

# A4b. re-measure the NAF f32 r32 backward cliff row (VERDICT weak #3:
# 3,092 ms previously; components measured fast in isolation, so the row
# may be a crashed-compile retry artifact — fresh-process re-measure)
timeout 2400 python -m naf_tpu.bench --ratio --models NAF --values 32

# A4c. clear the remote-compile bwd_error rows (HTTP 500 transport flakes
# archived as failures: AnyUp f32 r8/16/32, FeatUp img_size bf16) and the
# JAFAR img_size bwd<fwd row
timeout 3600 python -m naf_tpu.bench --ratio --models AnyUp --values 8 16 32
timeout 2400 python -m naf_tpu.bench --img-size --models FeatUp JAFAR --bf16

# A5. device-measured peak memory, one (filler, execute) trial per process
timeout 5400 python tools/measure_mem.py

echo STAGE_A_DONE

# B. reference-budget distillation + distilled evals (long)
timeout 10800 python tools/train_distilled_eval.py 25000

echo PIPELINE_R5_DONE
