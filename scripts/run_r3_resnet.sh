#!/bin/bash
# Round-3 ResNet critical path (one background job so the chip never idles):
#   1. train the epoch-extended ResNet50 flagship (60 epochs, grid memory,
#      grayscale device_cache) on the same /tmp/mathtext_hard corpus
#   2. post-flagship battery: lp sweep, beam@best-lp, selective-signal A/B,
#      selective capture, bucketed eval, device-cache eval
#   3. extract the trained encoder as the "pretrained" backbone and run the
#      frozen-backbone regime A/B (VERDICT r2 #3): scratch/frozen/finetune
#      on a fresh 8k corpus through the product train CLI
#   4. bench.py variance (N=5) for the headline noise band (VERDICT r2 weak #6)
#
# Run from a snapshot of committed HEAD (see the launch note in STATUS.md):
# the builder keeps editing the live repo while this runs; each stage is a
# fresh python process and must not pick up half-edited modules.  The final
# step copies the artifact directories back into the live repo.
set -euo pipefail
REPO_LIVE=/root/repo
cd "$(dirname "$0")/.."

python scripts/run_mathtext_quality.py \
  --root /tmp/mathtext_hard --workdir /tmp/mathtext_hard_run \
  --train 76800 --val 4096 --test 8192 \
  --profile im2latex --max-tokens 135 --max-aspect 11.5 --seq 141 \
  --epochs 60 --model resnet_lstm \
  --experiment mathtext_hard_resnet_v2 --artifacts mathtext_hard_resnet_v2 \
  --set model.memory=grid --set data.device_cache_grayscale=true

CKPT=$(ls -d /tmp/mathtext_hard_run/outputs/mathtext_hard_resnet_v2*/checkpoints | tail -1)
echo "post_flagship on $CKPT"
python scripts/post_flagship.py "$CKPT" \
  --data-dir /tmp/mathtext_hard --artifacts mathtext_hard_resnet_v2

echo "freeze A/B from $CKPT"
python scripts/freeze_backbone_ab.py --source "$CKPT" --root /tmp/freeze_corpus

echo "bench variance"
python scripts/bench_variance.py -n 5

if [ "$(pwd)" != "$REPO_LIVE" ]; then
  cp -r artifacts/mathtext_hard_resnet_v2 artifacts/freeze_backbone_ab \
        artifacts/bench_variance.json "$REPO_LIVE/artifacts/" || true
fi
echo "R3 RESNET PIPELINE DONE"
