#!/bin/bash
# Outdoor/LiDAR-branch validation queue (round 4, VERDICT item 7).
# Waits for the chip_queue.sh watcher to finish (it holds the TPU until
# the synth validation + chip measurements are done), then runs the
# outdoor validation at real budget, resuming on timeout, and commits
# the artifacts. Strictly serial with every other TPU user.
#
# Usage: nohup bash scripts/outdoor_queue.sh <chip_queue_pid> > /tmp/outdoor_queue.log 2>&1 &
set -u
cd /root/repo
PID=${1:?pid of the running chip_queue.sh}
LOG=/tmp/validate_outdoor_r04.log

echo "[oq] waiting on chip_queue pid $PID"
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "[oq] chip queue done at $(date +%H:%M:%S); launching outdoor validation"

timeout 9000 python -u scripts/validate_outdoor.py --out RESULTS_OUTDOOR_r04.md \
  > "$LOG" 2>&1
echo "[oq] initial run rc=$? at $(date +%H:%M:%S)"

RUN=$(grep -m1 '^run dir:' "$LOG" | awk '{print $3}')
echo "[oq] run dir: $RUN"

for attempt in 1 2; do
  [ -n "$RUN" ] || break
  if [ -f "$RUN/model/gs_done" ] && [ -f RESULTS_OUTDOOR_r04.md ]; then break; fi
  echo "[oq] incomplete -> resume attempt $attempt"
  timeout 7200 python -u scripts/validate_outdoor.py --resume "$RUN" \
    --out RESULTS_OUTDOOR_r04.md >> "$LOG" 2>&1
  echo "[oq] resume attempt $attempt rc=$? at $(date +%H:%M:%S)"
done

# Commit whatever exists: the r03a lesson — uncommitted artifacts die with
# the driver's round-end clean.
if [ -n "$RUN" ] && [ -d "$RUN" ]; then
  git add -f "$RUN" 2>/dev/null
fi
git add RESULTS_OUTDOOR_r04.md 2>/dev/null
git commit -q -m "Outdoor/LiDAR-branch validation run artifacts" 2>/dev/null
echo "[oq] ALL DONE $(date +%H:%M:%S)"
