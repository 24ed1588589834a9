#!/bin/bash
# Recreate the committed hard-rehearsal checkpoints (artifacts/README.md).
# The scratch wipe between driver sessions destroys gitignored artifacts, so
# the detector trains in crash-isolated 1500-step SEGMENTS (train.py's
# seg*steps cosine-schedule offset): each completed segment is committed;
# an interrupted segment is simply re-run from the last committed boundary.
# Usage: retrain.sh [first_segment]
#   No argument: derives the next segment from the checkpoint's own
#   odam_meta.json (train.py re-verifies it on resume).  An existing
#   checkpoint WITHOUT meta requires an explicit segment (TRAINLOG.md has
#   the position) — a silent default of 0 would double-train the artifact.
set -x
cd /root/repo
export JAX_PLATFORMS=cpu ODAM_HARD=1 PYTHONPATH=/root/repo:/root/repo/examples/cli_rehearsal
if [ ! -d artifacts/rehearsal_hard_assoc_ckpt ]; then
  python examples/cli_rehearsal/train.py associator 0 800 artifacts/rehearsal_hard_assoc_ckpt
fi
FIRST="$1"
if [ -z "$FIRST" ]; then
  if [ -d artifacts/rehearsal_hard_detr_ckpt ]; then
    FIRST=$(python - <<'EOF'
from odam_tpu.utils import checkpoint
meta = checkpoint.load_meta("artifacts/rehearsal_hard_detr_ckpt")
if meta is None or "global_step" not in meta:
    raise SystemExit(
        "rehearsal_hard_detr_ckpt exists but has no global_step meta; "
        "pass the next segment explicitly (see artifacts/TRAINLOG.md)")
print(int(meta["global_step"]) // int(meta.get("seg_steps", 1500)))
EOF
    ) || exit 1
  else
    FIRST=0
  fi
fi
for s in $(seq "$FIRST" 11); do
  ODAM_LR=6e-4 ODAM_DECAY_STEPS=18000 ODAM_BANK=150 \
    python examples/cli_rehearsal/train.py detector "$s" 1500 artifacts/rehearsal_hard_detr_ckpt \
    || exit 1
  echo "SEGMENT $s DONE $(date -u +%FT%TZ)"
done
