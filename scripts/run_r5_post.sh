#!/bin/bash
# Round-5 post-pipeline measurement battery (runs from the LIVE repo: it
# exercises the round-5 code — overlapped whole-split, per-bucket
# whole-split, prime — against the checkpoints the r5 pipeline left in /tmp).
#
#   1. 1-epoch flagship-SHAPED grid CNN (embed256/hidden384/l2): a
#      throughput stand-in with exactly the r3 grid flagship's decode
#      program (the r3 checkpoint died with the /tmp wipe; rate is
#      shape-determined, BLEU of this row is meaningless and marked so)
#   2. whole-split overlap measurement at b1024, passes=4 (round-4 verdict
#      weak #7 target: resident >= 13,000 img/s) on the shape stand-in and
#      on the best CNN capacity arm (real quality row)
#   3. bucketed per-batch vs per-bucket whole-split A/B on the ResNet
#      flagship + best CNN arm (round-4 verdict next-step #6)
#   4. prime A/B: prime -> fresh-process evaluate must start at the warm
#      bound (round-4 verdict next-step #3), cold control included
set -uo pipefail
REPO=/root/repo
cd "$REPO"
DATA=/tmp/mathtext_hard
RUN=/tmp/mathtext_hard_run

best_arm () {
  python - <<'EOF'
import glob, json
best, bleu0 = "", -1.0
for arm in ("cap512", "l3", "cap640"):
    try:
        r = json.load(open(f"/root/repo/artifacts/mathtext_hard_{arm}/RESULTS.json"))
        b = r.get("free_running_test", {}).get("greedy", {}).get("bleu", -1)
    except Exception:
        continue
    if b is not None and b > bleu0 and glob.glob(f"/tmp/mathtext_hard_run/outputs/mathtext_hard_{arm}*/checkpoints"):
        best, bleu0 = arm, b
print(best)
EOF
}

echo "=== POST 1: flagship-shaped 1-epoch grid CNN ==="
python scripts/run_mathtext_quality.py \
  --root "$DATA" --workdir "$RUN" \
  --train 76800 --val 4096 --test 8192 \
  --profile im2latex --max-tokens 135 --max-aspect 11.5 --seq 141 \
  --epochs 1 --experiment mathtext_hard_shape1 --artifacts mathtext_hard_shape1 \
  --set model.memory=grid \
  || echo "SHAPE TRAIN FAILED (continuing)"
SHAPE=$(ls -d $RUN/outputs/mathtext_hard_shape1*/checkpoints 2>/dev/null | tail -1)

echo "=== POST 2: whole-split overlap (b1024, passes=4) ==="
if [ -n "${SHAPE:-}" ]; then
  python scripts/eval_whole_split.py "$SHAPE" --data-dir "$DATA" \
    --batch 1024 --passes 4 \
    --out artifacts/mathtext_hard_grid_v2/predictions_wholesplit_b1024_overlap \
    | tee artifacts/mathtext_hard_grid_v2/wholesplit_overlap_summary.json \
    || echo "OVERLAP (shape) FAILED (continuing)"
fi
ARM=$(best_arm)
echo "best CNN arm: ${ARM:-none}"
if [ -n "$ARM" ]; then
  ARMCKPT=$(ls -d $RUN/outputs/mathtext_hard_${ARM}*/checkpoints | tail -1)
  python scripts/eval_whole_split.py "$ARMCKPT" --data-dir "$DATA" \
    --batch 1024 --passes 4 \
    --out "artifacts/mathtext_hard_${ARM}/predictions_wholesplit_b1024" \
    || echo "OVERLAP (arm) FAILED (continuing)"
fi

echo "=== POST 3: bucketed per-batch vs per-bucket whole-split ==="
RESNET=$(ls -d $RUN/outputs/mathtext_hard_resnet_v2*/checkpoints 2>/dev/null | tail -1)
if [ -n "${RESNET:-}" ]; then
  python scripts/eval_bucketed_wholesplit.py "$RESNET" --data-dir "$DATA" \
    --widths 256,384,512 --batch 256 --passes 3 \
    --out artifacts/mathtext_hard_resnet_v2/bucketed_wholesplit_ab.json \
    || echo "BUCKET AB (resnet) FAILED (continuing)"
fi
if [ -n "$ARM" ]; then
  python scripts/eval_bucketed_wholesplit.py "$ARMCKPT" --data-dir "$DATA" \
    --widths 256,384,512 --batch 256 --passes 3 \
    --out "artifacts/mathtext_hard_${ARM}/bucketed_wholesplit_ab.json" \
    || echo "BUCKET AB (arm) FAILED (continuing)"
fi

echo "=== POST 4: prime A/B (warm restart bound) ==="
PRIMECKPT="${ARMCKPT:-$SHAPE}"
if [ -n "${PRIMECKPT:-}" ]; then
  python scripts/prime_ab.py "$PRIMECKPT" --data-dir "$DATA" \
    --batch 1024 --with-cold --out artifacts/prime_ab.json \
    || echo "PRIME AB FAILED (continuing)"
fi

echo "R5 POST DONE"
