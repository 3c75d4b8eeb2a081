#!/bin/bash
# Round-5 post-run chip queue: when the gated validation run (PID $1)
# releases the chip, run (1) the table-DMA encode A/B and (2) a
# deadline-bounded bench.py to bank the batched-frames number in-round,
# committing every log. Strictly serial (one TPU process at a time).
#
# Usage: nohup bash scripts/r05_chip_queue.sh <validate_pid> > /tmp/r05_queue.log 2>&1 &
set -u
cd /root/repo
PID=${1:?pid of validate_synth}

echo "[q5] waiting on validate pid $PID"
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "[q5] chip free at $(date +%H:%M:%S)"

echo "[q5] === table_dma_bench ==="
timeout 1200 python -u - < scripts/profile/table_dma_bench.py \
  > /tmp/table_dma_bench.log 2>&1
echo "[q5] table_dma rc=$?"; tail -8 /tmp/table_dma_bench.log

echo "[q5] === bench.py (banked in-round) ==="
GSSDF_BENCH_DEADLINE=600 timeout 700 python -u bench.py \
  > /tmp/bench_r05.log 2>&1
echo "[q5] bench rc=$?"; tail -8 /tmp/bench_r05.log

OUT=PERF_r05_chiplogs.txt
{
  echo "# Raw chip measurement logs, round 5 ($(date +%F))"
  for f in table_dma_bench bench_r05 validate_r05; do
    if [ -f "/tmp/$f.log" ]; then
      echo; echo "===== $f ====="
      tr -d '\r' < "/tmp/$f.log" | tail -80
    fi
  done
} > "$OUT"
git add "$OUT"
git commit -q -m "Round-5 raw chip measurement logs" 2>/dev/null
echo "[q5] ALL DONE $(date +%H:%M:%S)"
