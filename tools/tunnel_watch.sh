#!/bin/bash
# Watch for the axon TPU tunnel to come back (relay listens on 127.0.0.1:8082
# once /root/.tpu_init.py is restored by the host driver), confirm a real
# jax.devices() round-trip, then run the round-5 artifact pipeline exactly once.
# Logs to /root/repo/runs/tunnel_watch.log; marker files in /tmp:
#   /tmp/tunnel_up.marker       — device round-trip confirmed
#   /tmp/pipeline_r5.started    — pipeline launched
#   /tmp/pipeline_r5.done       — pipeline finished (contains exit code)
set -u
cd /root/repo
LOG=/root/repo/runs/tunnel_watch.log
mkdir -p /root/repo/runs
echo "[watch] start $(date -u +%FT%TZ)" >> "$LOG"

while true; do
  if python - <<'EOF' 2>>"$LOG"
import socket, sys
s = socket.socket(); s.settimeout(5)
try:
    s.connect(("127.0.0.1", 8082)); sys.exit(0)
except OSError:
    sys.exit(1)
finally:
    s.close()
EOF
  then
    echo "[watch] port 8082 open $(date -u +%FT%TZ), probing devices" >> "$LOG"
    if timeout 600 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1; then
      echo "[watch] device round-trip OK $(date -u +%FT%TZ)" >> "$LOG"
      touch /tmp/tunnel_up.marker
      break
    else
      echo "[watch] port open but device probe failed; retrying in 120s" >> "$LOG"
    fi
  fi
  sleep 120
done

if [ ! -e /tmp/pipeline_r5.started ]; then
  touch /tmp/pipeline_r5.started
  echo "[watch] launching round5_pipeline $(date -u +%FT%TZ)" >> "$LOG"
  bash tools/round5_pipeline.sh >> /root/repo/runs/round5_pipeline.log 2>&1
  rc=$?
  echo "$rc" > /tmp/pipeline_r5.done
  echo "[watch] pipeline done rc=$rc $(date -u +%FT%TZ)" >> "$LOG"
fi
