#!/bin/bash
# Insurance: commit the validation RESULTS files as soon as they appear
# (they are written at repo root by validate_synth/validate_outdoor and no
# other queue commits RESULTS_r04.md; uncommitted files die with the
# driver's round-end clean). Polls every 2 min, commits on content change.
set -u
cd /root/repo
last=""
while true; do
  sleep 120
  for f in RESULTS_r04.md RESULTS_OUTDOOR_r04.md RESULTS_r04_FIXED.md; do
    [ -f "$f" ] || continue
    h=$(md5sum "$f" | cut -d' ' -f1)
    case "$last" in *"$h"*) continue ;; esac
    git add "$f" 2>/dev/null || continue
    if git diff --cached --quiet 2>/dev/null; then
      last="$last $h"            # already committed content
    elif git commit -q -m "Validation results: $f" 2>/dev/null; then
      echo "[rg] committed $f at $(date +%H:%M:%S)"
      last="$last $h"
    fi
  done
done
