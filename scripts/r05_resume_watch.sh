#!/bin/bash
# When the primary gated run (PID $1) dies at its timeout, immediately
# resume it from the last snapshot for the remaining round window so the
# iter-4000 acceptance export can land (warm persistent compile cache
# makes resume warmup cheap). Commits telemetry on exit.
set -u
cd /root/repo
PID=${1:?}
RUN=output/20260821_064606_synth_scene_r05_run
BOX=${2:-900}
while kill -0 "$PID" 2>/dev/null; do sleep 10; done
echo "[rw] primary died at $(date +%H:%M:%S); resuming for ${BOX}s"
timeout "$BOX" python -u scripts/validate_synth.py --fix-window \
  --resume "$RUN" --root /tmp/synth_scene_r05 \
  --out RESULTS_r05_RUN.md > /tmp/validate_r05_resume.log 2>&1
echo "[rw] resume rc=$? at $(date +%H:%M:%S)"
git add -f "$RUN/gs_log.txt" "$RUN/nsdf_log.txt" "$RUN/gs_log/mid" \
  "$RUN/refine_log.txt" "$RUN/model/gs_resume.npz" \
  "$RUN/model/sdf_checkpoint.npz" "$RUN/model/pt.yaml" \
  "$RUN/model/config" 2>/dev/null
git commit -q -m "r05 gated-run: resumed-segment telemetry (final chip window)" 2>/dev/null
echo "[rw] done"
