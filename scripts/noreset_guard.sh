#!/bin/bash
# Commit the no-reset diagnostic run's evidence when it exits.
set -u
cd /root/repo
PID=${1:?}
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
RUN=$(grep -m1 '^run dir:' /tmp/validate_noreset.log 2>/dev/null | awk '{print $3}')
echo "[ng] run exited; dir: $RUN"
if [ -n "$RUN" ] && [ -d "$RUN" ]; then
  git add -f "$RUN/gs_log.txt" "$RUN/nsdf_log.txt" "$RUN/gs_log/mid" \
    "$RUN/model/config" "$RUN/model/pt.yaml" 2>/dev/null
  git commit -q -m "No-reset diagnostic run evidence (gs_log + mid metrics)" 2>/dev/null
fi
[ -f RESULTS_r04_NORESET.md ] && git add RESULTS_r04_NORESET.md 2>/dev/null && \
  git commit -q -m "No-reset diagnostic RESULTS" 2>/dev/null
echo "[ng] done $(date +%H:%M:%S)"
