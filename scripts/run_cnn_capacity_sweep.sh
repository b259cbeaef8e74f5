#!/bin/bash
# CNN capacity probe (round-3 verdict #4): is the CNN flagship's 0.775
# free-running test BLEU (vs ResNet50's 0.9335 on the identical corpus)
# capacity-starved or an architecture/ceiling effect?
#
# Arms (identical corpus/recipe to the mathtext_hard_v2 flagship, epoch
# budget 60 — the flagship's val BLEU at epoch 61 was 0.8563 of its final
# 0.8652, so 60 epochs resolves capacity effects at ~half the cost):
#   cap512 : hidden 384->512               (lr 5e-4 — the probed recipe for
#   cap640 : hidden 384->640, embed->384    larger widths; 1e-3 collapses in
#   l3     : lstm_layers 2->3               bf16, round-1 probe)
#
# Each arm trains + free-running greedy/beam-5 test evals via
# run_mathtext_quality.py, writing artifacts/mathtext_hard_<arm>/.
set -uo pipefail
cd /root/repo

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
}

run_arm cap512 --set model.decoder.hidden_dim=512 --set training.learning_rate=0.0005
run_arm cap640 --set model.decoder.hidden_dim=640 --set model.embedding_dim=384 --set training.learning_rate=0.0005
run_arm l3 --set model.decoder.lstm_layers=3

echo "CNN CAPACITY SWEEP DONE"
