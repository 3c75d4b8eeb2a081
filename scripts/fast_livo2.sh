#!/usr/bin/env bash
# Batch FAST-LIVO2 reproduction (reference scripts/fast_livo2.sh analog).
# Usage: scripts/fast_livo2.sh /path/to/bags
set -e
DATA_ROOT=${1:?usage: fast_livo2.sh <bag_root>}
for bag in drive red_bird2 campus station cbd sysu culture01; do
  echo "=== $bag ==="
  python -m gssdf_tpu train configs/fast_livo/campus.yaml "$DATA_ROOT/$bag.bag"
done
