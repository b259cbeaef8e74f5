#!/bin/bash
# Round-4 critical path (one background job so the chip never idles).
# /tmp was wiped between sessions: the corpus and every trained checkpoint
# from r3 are gone, so the round-4 quality work starts by regenerating both
# (fixed corpus seed 20260816 -> identical images to r3).
#
# Stages (each copies its artifacts back to the live repo as it finishes):
#   1. render the 76.8k/4k/8k mathtext_hard corpus (CPU, chip idle)
#   2. retrain the ResNet50 flagship (60 epochs, grid memory, grayscale
#      device_cache) and REGENERATE artifacts/mathtext_hard_resnet_v2 —
#      including a REAL bucketed eval now that ResNet bucketing exists
#      (round-3 verdict weak #3: the old artifact said "bucketed" but ran
#      un-bucketed; Predictor.bucket_margin_px handles the layer4 seam)
#   3. post-flagship battery on the ResNet checkpoint (lp sweep, beam@best,
#      selective A/B, bucketed, whole-split device-cache eval)
#   4. serving bench on the ResNet checkpoint with selective + bucketed
#      rows (round-3 verdict #7: deployment surface must quote current
#      numbers; scripts/bench_serving.py gained those rows in r4 but was
#      never re-run on chip)
#   5. CNN capacity sweep (round-3 verdict weak #4): is the CNN flagship's
#      0.775 test BLEU vs ResNet's 0.9335 capacity-starved?  Arms ordered
#      by information-per-hour: cap512 (main hypothesis), l3 (cheap),
#      cap640 (expensive, marginal) — so a wall-clock cutoff loses the
#      least informative arm first.
#   6. serving + export bench on the best CNN arm
#
# Run from a snapshot of committed HEAD: the builder keeps editing the live
# repo while this runs; each stage is a fresh python process and must not
# pick up half-edited modules.
set -uo pipefail
REPO_LIVE=/root/repo
SNAP=/tmp/r4repo

copyback () {  # $1... = artifact dir names (relative to artifacts/)
  for d in "$@"; do
    if [ -e "$SNAP/artifacts/$d" ]; then
      cp -r "$SNAP/artifacts/$d" "$REPO_LIVE/artifacts/" || true
    fi
  done
}

if [ ! -d "$SNAP" ]; then
  git clone -q --depth 1 "file://$REPO_LIVE" "$SNAP"
fi
cd "$SNAP"
make native >/dev/null 2>&1 || echo "WARN: native build failed (python fallback)"

echo "=== STAGE 2+3: ResNet flagship retrain + battery ==="
python scripts/run_mathtext_quality.py \
  --root /tmp/mathtext_hard --workdir /tmp/mathtext_hard_run \
  --train 76800 --val 4096 --test 8192 \
  --profile im2latex --max-tokens 135 --max-aspect 11.5 --seq 141 \
  --epochs 60 --model resnet_lstm \
  --experiment mathtext_hard_resnet_v2 --artifacts mathtext_hard_resnet_v2 \
  --set model.memory=grid --set data.device_cache_grayscale=true \
  || { echo "RESNET TRAIN FAILED"; exit 1; }
copyback mathtext_hard_resnet_v2

CKPT=$(ls -d /tmp/mathtext_hard_run/outputs/mathtext_hard_resnet_v2*/checkpoints | tail -1)
echo "post_flagship on $CKPT"
python scripts/post_flagship.py "$CKPT" \
  --data-dir /tmp/mathtext_hard --artifacts mathtext_hard_resnet_v2 \
  || echo "RESNET POST FAILED (continuing)"
copyback mathtext_hard_resnet_v2

echo "=== STAGE 4: serving bench (ResNet, selective + bucketed rows) ==="
python scripts/bench_serving.py "$CKPT" /tmp/mathtext_hard/img \
  --n 256 --batch 16 --buckets 256,384,512 \
  --out artifacts/serving_latency_r4_resnet.json \
  || echo "RESNET SERVING BENCH FAILED (continuing)"
copyback serving_latency_r4_resnet.json

echo "=== STAGE 5: CNN capacity sweep ==="
run_arm () {
  local name="$1"; shift
  echo "=== ARM $name : $* ==="
  python scripts/run_mathtext_quality.py \
    --root /tmp/mathtext_hard --workdir /tmp/mathtext_hard_run \
    --train 76800 --val 4096 --test 8192 \
    --profile im2latex --max-tokens 135 --max-aspect 11.5 --seq 141 \
    --epochs 60 --experiment "mathtext_hard_${name}" \
    --artifacts "mathtext_hard_${name}" \
    --set model.memory=grid "$@" \
    || echo "ARM $name FAILED rc=$?"
  copyback "mathtext_hard_${name}"
}
# lr 5e-4 for the widened arms: 1e-3 collapses >384-wide bf16 LSTMs to the
# label-smoothing floor (round-1 probe, run_mathtext_quality.py:96-100).
run_arm cap512 --set model.decoder.hidden_dim=512 --set training.learning_rate=0.0005
run_arm l3 --set model.decoder.lstm_layers=3
run_arm cap640 --set model.decoder.hidden_dim=640 --set model.embedding_dim=384 --set training.learning_rate=0.0005

echo "=== STAGE 6: serving + export bench on best CNN arm ==="
BEST=""
for arm in cap512 l3 cap640; do
  d=$(ls -d /tmp/mathtext_hard_run/outputs/mathtext_hard_${arm}*/checkpoints 2>/dev/null | tail -1)
  [ -n "$d" ] && BEST="$d"  # placeholder: overwritten below by BLEU compare
done
BEST=$(python - <<'EOF'
import glob, json, os
best, best_bleu = "", -1.0
for arm in ("cap512", "l3", "cap640"):
    for r in glob.glob(f"/tmp/r4repo/artifacts/mathtext_hard_{arm}/RESULTS.json"):
        bleu = json.load(open(r))["free_running_test"].get("greedy", {}).get("bleu", -1)
        ck = sorted(glob.glob(f"/tmp/mathtext_hard_run/outputs/mathtext_hard_{arm}*/checkpoints"))
        if bleu > best_bleu and ck:
            best, best_bleu = ck[-1], bleu
print(best)
EOF
)
if [ -n "$BEST" ]; then
  echo "best CNN arm ckpt: $BEST"
  python scripts/bench_serving.py "$BEST" /tmp/mathtext_hard/img \
    --n 256 --batch 16 --buckets 256,384,512 \
    --out artifacts/serving_latency_r4_cnn.json \
    || echo "CNN SERVING BENCH FAILED (continuing)"
  copyback serving_latency_r4_cnn.json
fi

echo "R4 PIPELINE DONE"
