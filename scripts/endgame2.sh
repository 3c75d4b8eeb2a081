#!/bin/bash
# Round-4 endgame, take 2 (the first export attempt hit the banding
# recursion bug, fixed in 128117d): waits for the running export
# completion of the damaged run, commits it, then runs the fixed-variant
# rerun until STOP and commits its artifacts + refreshed chip logs.
# Usage: nohup bash scripts/endgame2.sh <exports_pid> <stop_hhmm> > /tmp/endgame2.log 2>&1 &
set -u
cd /root/repo
PID=${1:?pid of the running exports}
STOP=${2:-21:00}
RUN=output/20260820_012451_synth_scene_run

echo "[e2] waiting on exports pid $PID"
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "[e2] exports done at $(date +%H:%M:%S)"
tail -5 /tmp/validate_r04_exports.log
git add -f "$RUN" RESULTS_r04.md 2>/dev/null
git commit -q -m "Damaged-run final exports/eval (RESULTS_r04)" 2>/dev/null

BUDGET=$(( $(date -d "$STOP" +%s) - $(date +%s) ))
if [ "$BUDGET" -ge 600 ]; then
  echo "[e2] launching fixed rerun with ${BUDGET}s budget"
  timeout "$BUDGET" python -u scripts/validate_synth.py --fix-window \
    --out RESULTS_r04_FIXED.md --root /tmp/synth_scene_fixed \
    > /tmp/validate_fixed_r04.log 2>&1
  echo "[e2] rerun rc=$? at $(date +%H:%M:%S)"
fi

FRUN=$(grep -m1 '^run dir:' /tmp/validate_fixed_r04.log 2>/dev/null | awk '{print $3}')
echo "[e2] fixed run dir: $FRUN"
if [ -n "$FRUN" ] && [ -d "$FRUN" ]; then
  git add -f "$FRUN/model/gs_resume.npz" "$FRUN/model/sdf_checkpoint.npz" \
    "$FRUN/gs_log.txt" "$FRUN/nsdf_log.txt" "$FRUN/gs_log/mid" \
    "$FRUN/model/pt.yaml" "$FRUN/model/config" 2>/dev/null
  [ -f "$FRUN/model/gs_done" ] && git add -f "$FRUN" 2>/dev/null
  git add RESULTS_r04_FIXED.md 2>/dev/null
  git commit -q -m "Fixed-variant validation run artifacts (window-honesty rerun)" 2>/dev/null
fi

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
git commit -q -m "Round-4 raw chip measurement logs (final)" 2>/dev/null
echo "[e2] ALL DONE $(date +%H:%M:%S)"
