#!/bin/bash
# Composite-variant chip matrix (round 4). Waits for the outdoor_queue
# watcher (the last holder of the TPU), then measures the V3/V4 chunk-math
# variants on real Mosaic: parity vs the XLA scan path + chained fwd/fwd+bwd
# timing at the bench operating point. V3=0/V4=0 baseline and V3=1 already
# run inside chip_queue.sh; this covers the V4 combos. Strictly serial.
#
# Usage: nohup bash scripts/v4_queue.sh <outdoor_queue_pid> > /tmp/v4_queue.log 2>&1 &
set -u
cd /root/repo
PID=${1:?pid of the running outdoor_queue.sh}

echo "[v4q] waiting on outdoor_queue pid $PID"
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "[v4q] chip free at $(date +%H:%M:%S)"

run() {
  local name=$1; shift
  echo "[v4q] === $name start $(date +%H:%M:%S) ==="
  "$@" > "/tmp/${name}.log" 2>&1
  echo "[v4q] === $name done rc=$? $(date +%H:%M:%S) ==="
  tail -15 "/tmp/${name}.log"
}

run chip_v4     env GSSDF_RASTER_V4=1 timeout 2400 python -u scripts/profile/chip_v3.py
run chip_v3v4   env GSSDF_RASTER_V3=1 GSSDF_RASTER_V4=1 timeout 2400 python -u scripts/profile/chip_v3.py

echo "[v4q] ALL DONE $(date +%H:%M:%S)"
