#!/bin/bash
# Recreate the committed hard-rehearsal checkpoints (artifacts/README.md).
# The scratch wipe between driver sessions destroys gitignored artifacts, so
# the detector trains in crash-isolated 1500-step SEGMENTS (train.py's
# seg*steps cosine-schedule offset): each completed segment is committed;
# an interrupted segment is simply re-run from the last committed boundary.
# Usage: retrain.sh [first_segment]  (default 0; associator trains only
# when its checkpoint is absent).
set -x
cd /root/repo
export JAX_PLATFORMS=cpu ODAM_HARD=1 PYTHONPATH=/root/repo:/root/repo/examples/cli_rehearsal
if [ ! -d artifacts/rehearsal_hard_assoc_ckpt ]; then
  python examples/cli_rehearsal/train.py associator 0 800 artifacts/rehearsal_hard_assoc_ckpt
fi
for s in $(seq "${1:-0}" 11); do
  ODAM_LR=6e-4 ODAM_DECAY_STEPS=18000 ODAM_BANK=150 \
    python examples/cli_rehearsal/train.py detector "$s" 1500 artifacts/rehearsal_hard_detr_ckpt \
    || exit 1
  echo "SEGMENT $s DONE $(date -u +%FT%TZ)"
done
