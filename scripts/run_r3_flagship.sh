#!/bin/bash
# Round-3 flagship critical path (one background job so the chip never idles):
#   1. render /tmp/mathtext_hard (76.8k/4k/8k, seed 20260816 — same corpus as r2)
#   2. train the epoch-matched no-aug CNN flagship (110 epochs, grid memory)
#      -> artifacts/mathtext_hard_grid_v2 (the run cited as "in flight" by
#         artifacts/augment_flagship_ab/RESULTS.json)
#   3. free-running greedy + beam-5 test eval (inside run_mathtext_quality)
#   4. post-flagship battery: lp sweep, beam@best-lp, selective-signal A/B,
#      selective capture, bucketed eval, device-cache eval
set -euo pipefail
cd /root/repo

python scripts/run_mathtext_quality.py \
  --root /tmp/mathtext_hard --workdir /tmp/mathtext_hard_run \
  --train 76800 --val 4096 --test 8192 \
  --profile im2latex --max-tokens 135 --max-aspect 11.5 --seq 141 \
  --epochs 110 --experiment mathtext_hard_v2 --artifacts mathtext_hard_grid_v2 \
  --set model.memory=grid

CKPT=$(ls -d /tmp/mathtext_hard_run/outputs/mathtext_hard_v2*/checkpoints | tail -1)
echo "post_flagship on $CKPT"
python scripts/post_flagship.py "$CKPT" \
  --data-dir /tmp/mathtext_hard --artifacts mathtext_hard_grid_v2
echo "R3 FLAGSHIP PIPELINE DONE"
