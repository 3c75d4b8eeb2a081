#!/bin/bash
# Post-validation chip work queue (round 4). Waits for the running
# validate_synth process to exit, re-resumes it if the GS phase is not
# done (the 8.5 h timeout can fire mid-run), and once gs_done exists runs
# the queued chip measurements sequentially. NEVER runs two TPU processes
# at once: everything here is strictly serial.
#
# Usage: nohup bash scripts/chip_queue.sh <validate_pid> > /tmp/chip_queue.log 2>&1 &
set -u
cd /root/repo
RUN=output/20260820_012451_synth_scene_run
PID=${1:?pid of the running validate_synth}

echo "[queue] waiting on validate pid $PID"
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "[queue] validate exited at $(date +%H:%M:%S)"

# Re-resume until the GS phase is complete (bounded retries).
for attempt in 1 2 3; do
  if [ -f "$RUN/model/gs_done" ]; then break; fi
  echo "[queue] gs_done missing -> re-resume attempt $attempt"
  timeout 14400 python -u scripts/validate_synth.py --resume "$RUN" \
    --out RESULTS_r04.md >> /tmp/validate_r04.log 2>&1
  echo "[queue] resume attempt $attempt exited rc=$? at $(date +%H:%M:%S)"
done

# ALWAYS protect the newest snapshot before anything else (the r03a
# lesson: an uncommitted snapshot dies with the driver's round-end clean)
git add -f "$RUN/model/gs_resume.npz" 2>/dev/null
if [ -f "$RUN/model/gs_done" ]; then
  echo "[queue] GS phase complete; snapshotting artifacts"
  git add -f "$RUN" 2>/dev/null
  git commit -q -m "Validation run complete: final artifacts" 2>/dev/null
else
  echo "[queue] GS phase STILL incomplete after retries; committing the"
  echo "[queue] newest snapshot and proceeding to chip measurements"
  git commit -q -m "Validation run snapshot (incomplete GS phase)" 2>/dev/null
fi

run() {
  local name=$1; shift
  echo "[queue] === $name start $(date +%H:%M:%S) ==="
  "$@" > "/tmp/${name}.log" 2>&1
  echo "[queue] === $name done rc=$? $(date +%H:%M:%S) ==="
  tail -25 "/tmp/${name}.log"
}

run cap_honesty  timeout 2400 python -u scripts/profile/cap_honesty.py
run chip_v3_off  env GSSDF_RASTER_V3=0 timeout 2400 python -u scripts/profile/chip_v3.py
run chip_v3_on   env GSSDF_RASTER_V3=1 timeout 2400 python -u scripts/profile/chip_v3.py
run gather_bench timeout 1800 python -u scripts/profile/gather_bench.py
run encode_bd    timeout 2400 python -u scripts/profile/encode_breakdown.py
run bench        timeout 3000 python -u bench.py

echo "[queue] ALL DONE $(date +%H:%M:%S)"
