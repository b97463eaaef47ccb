#!/bin/bash
# Round-5b pipeline: post-A4c priority queue for the remaining chip time.
# 1. kernel-check: numerics gate for the round-5 fused-q changes (combined
#    K|V gather tile, hoisted column-window bias)
# 2. north_star + quick geometry sweep: the headline FPS on the new kernel
# 3. largeimg_probe: isolate the 1792^2 worker crash per stage
# 4. measure_mem: device-measured peaks, one trial per process
set -x
cd /root/repo

timeout 2400 python tools/tpu_kernel_check.py
timeout 900 python tools/north_star.py
timeout 2400 python tools/fusedq_geom_sweep.py --quick
timeout 3000 python tools/largeimg_probe.py

echo STAGE_5B_FAST_DONE

timeout 5400 python tools/measure_mem.py

echo PIPELINE_R5B_DONE
