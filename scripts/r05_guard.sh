#!/bin/bash
# Round-5 gated-run guard: periodically commit the run's telemetry +
# resume snapshot while the chip run (PID $1) is alive, and once more on
# exit (incl. RESULTS_r05.md if the run completed its writer).
set -u
cd /root/repo
PID=${1:?pid of validate_synth}
LOG=${2:-/tmp/validate_r05.log}

commit_snap() {
  RUN=$(grep -m1 '^run dir:' "$LOG" 2>/dev/null | awk '{print $3}')
  [ -n "$RUN" ] && [ -d "$RUN" ] || return 0
  git add -f "$RUN/gs_log.txt" "$RUN/nsdf_log.txt" "$RUN/gs_log/mid" \
    "$RUN/refine_log.txt" \
    "$RUN/model/gs_resume.npz" "$RUN/model/sdf_checkpoint.npz" \
    "$RUN/model/pt.yaml" "$RUN/model/config" 2>/dev/null
  git commit -q -m "r05 gated-run snapshot ($(date +%H:%M:%S))" 2>/dev/null
}

while kill -0 "$PID" 2>/dev/null; do
  sleep 600
  commit_snap
done
echo "[g5] run exited at $(date +%H:%M:%S)"
RUN=$(grep -m1 '^run dir:' "$LOG" 2>/dev/null | awk '{print $3}')
[ -n "$RUN" ] && [ -d "$RUN" ] && [ -f "$RUN/model/gs_done" ] && \
  git add -f "$RUN" 2>/dev/null
commit_snap
[ -f RESULTS_r05.md ] && git add RESULTS_r05.md && \
  git commit -q -m "RESULTS_r05: gated reference-budget run" 2>/dev/null
echo "[g5] done"
