#!/usr/bin/env bash
# Batch Replica reproduction (reference scripts/replica.sh analog).
# Usage: scripts/replica.sh /path/to/Replica
set -e
DATA_ROOT=${1:?usage: replica.sh <replica_root>}
for scene in room0 room1 room2 office0 office1 office2 office3 office4; do
  echo "=== $scene ==="
  python -m gssdf_tpu train configs/replica.yaml "$DATA_ROOT/$scene"
done
