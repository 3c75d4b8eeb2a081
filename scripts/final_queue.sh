#!/bin/bash
# Final round-4 chip measurement stage: waits for v4_queue, then runs the
# scatter microbench and the VMEM-encode A/B on the real SDF step, and
# commits ALL chip measurement logs so nothing is lost at round end.
# Strictly serial with every other TPU user.
#
# Usage: nohup bash scripts/final_queue.sh <v4_queue_pid> > /tmp/final_queue.log 2>&1 &
set -u
cd /root/repo
PID=${1:?pid of the running v4_queue.sh}

echo "[fq] waiting on v4_queue pid $PID"
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "[fq] chip free at $(date +%H:%M:%S)"

run() {
  local name=$1; shift
  echo "[fq] === $name start $(date +%H:%M:%S) ==="
  "$@" > "/tmp/${name}.log" 2>&1
  echo "[fq] === $name done rc=$? $(date +%H:%M:%S) ==="
  tail -12 "/tmp/${name}.log"
}

run scatter_bench timeout 1800 python -u scripts/profile/scatter_bench.py
run sdf_base      timeout 2400 python -u scripts/profile_sdf.py
run sdf_vmem_take env GSSDF_ENCODE_VMEM=1 GSSDF_LVL_GATHER=take \
                  timeout 2400 python -u scripts/profile_sdf.py
run sdf_vmem_loop env GSSDF_ENCODE_VMEM=1 GSSDF_LVL_GATHER=loop \
                  timeout 2400 python -u scripts/profile_sdf.py

# preserve every chip log in-repo (r03 lesson: /tmp evidence dies with
# the round; PERF tables cite these)
OUT=PERF_r04_chiplogs.txt
{
  echo "# Raw chip measurement logs, round 4 ($(date +%F))"
  for f in cap_honesty chip_v3_off chip_v3_on gather_bench encode_bd \
           bench chip_v4 chip_v3v4 scatter_bench sdf_base \
           sdf_vmem_take sdf_vmem_loop validate_outdoor_r04; do
    if [ -f "/tmp/$f.log" ]; then
      echo; echo "===== $f ====="
      tr -d '\r' < "/tmp/$f.log" | tail -60
    fi
  done
} > "$OUT"
git add "$OUT"
git commit -q -m "Round-4 raw chip measurement logs" 2>/dev/null
echo "[fq] ALL DONE $(date +%H:%M:%S)"
