#!/bin/bash
# Round-4 endgame: waits for the V4 chip matrix, then
#   1. completes the damaged run's final exports/eval (gs_done exists, so
#      --resume goes straight to end(); the y-banded meshing fix makes the
#      reference-res mesh compile) and commits run + RESULTS_r04.md
#   2. runs the quick scatter microbench
#   3. launches the WINDOW-HONESTY FIXED reference-budget rerun
#      (DIAGNOSIS_r04.md) until shortly before round end
# committing snapshots and all chip logs. Strictly serial.
#
# Usage: nohup bash scripts/rerun_queue.sh <v4_queue_pid> <stop_hhmm> > /tmp/rerun_queue.log 2>&1 &
set -u
cd /root/repo
PID=${1:?pid of the running v4_queue.sh}
STOP=${2:-21:05}
RUN=output/20260820_012451_synth_scene_run

echo "[rq] waiting on v4_queue pid $PID"
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "[rq] chip free at $(date +%H:%M:%S)"

echo "[rq] === export completion of the damaged run ==="
timeout 4800 python -u scripts/validate_synth.py --resume "$RUN" \
  --out RESULTS_r04.md > /tmp/validate_r04_exports.log 2>&1
echo "[rq] exports rc=$? at $(date +%H:%M:%S)"
tail -5 /tmp/validate_r04_exports.log
git add -f "$RUN" RESULTS_r04.md 2>/dev/null
git commit -q -m "Damaged-run final exports/eval (RESULTS_r04)" 2>/dev/null

echo "[rq] === scatter_bench ==="
timeout 1500 python -u scripts/profile/scatter_bench.py > /tmp/scatter_bench.log 2>&1
echo "[rq] scatter_bench rc=$?"; tail -6 /tmp/scatter_bench.log

BUDGET=$(( $(date -d "$STOP" +%s) - $(date +%s) ))
if [ "$BUDGET" -lt 600 ]; then
  echo "[rq] <10 min left before $STOP — skipping the rerun"
else
  echo "[rq] launching fixed rerun with ${BUDGET}s budget"
  timeout "$BUDGET" python -u scripts/validate_synth.py --fix-window \
    --out RESULTS_r04_FIXED.md --root /tmp/synth_scene_fixed \
    > /tmp/validate_fixed_r04.log 2>&1
  echo "[rq] rerun rc=$? at $(date +%H:%M:%S)"
fi

FRUN=$(grep -m1 '^run dir:' /tmp/validate_fixed_r04.log 2>/dev/null | awk '{print $3}')
echo "[rq] fixed run dir: $FRUN"
if [ -n "$FRUN" ] && [ -d "$FRUN" ]; then
  git add -f "$FRUN/model/gs_resume.npz" "$FRUN/model/sdf_checkpoint.npz" \
    "$FRUN/gs_log.txt" "$FRUN/nsdf_log.txt" "$FRUN/gs_log/mid" \
    "$FRUN/model/pt.yaml" "$FRUN/model/config" 2>/dev/null
  [ -f "$FRUN/model/gs_done" ] && git add -f "$FRUN" 2>/dev/null
  git add RESULTS_r04_FIXED.md 2>/dev/null
  git commit -q -m "Fixed-variant validation run artifacts (window-honesty rerun)" 2>/dev/null
fi

# preserve every chip log in-repo
OUT=PERF_r04_chiplogs.txt
{
  echo "# Raw chip measurement logs, round 4 ($(date +%F))"
  for f in cap_honesty chip_v3_off chip_v3_on gather_bench encode_bd \
           bench chip_v4 chip_v3v4 scatter_bench validate_r04_exports \
           validate_fixed_r04; do
    if [ -f "/tmp/$f.log" ]; then
      echo; echo "===== $f ====="
      tr -d '\r' < "/tmp/$f.log" | tail -60
    fi
  done
} > "$OUT"
git add "$OUT"
git commit -q -m "Round-4 raw chip measurement logs" 2>/dev/null
echo "[rq] ALL DONE $(date +%H:%M:%S)"
