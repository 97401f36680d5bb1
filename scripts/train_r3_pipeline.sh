#!/bin/bash
# Round-3 training pipeline: run the full-pool (26-combo) trainings
# back-to-back on the one TPU chip, exporting committed npz weight snapshots
# after each stage. Stage step budgets are enforced by the configs; the
# per-stage `timeout` is a wall-clock safety net — the Trainer checkpoints
# every save_interval and exports weights/<name>.npz on every best-save, so a
# timeout kill loses at most save_interval steps and every stage is resumable.
#
# Curriculum (VERDICT r2: from-scratch full-pool detector stalls at IoU 0.37;
# warm-started reaches 0.67 by step 500):
#   detector_synthetic (8 scenes)  -> detector_r3 (26-scene pool, warm)
#   selector_r3  (26-scene pool, from scratch)
#   refiner_r3   (26-scene pool, from scratch, runs for the remaining budget)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/train_pipeline.log
echo "=== train_r3_pipeline start $(date)" >> "$LOG"

stage() {
  local cfg=$1 budget=$2
  local name
  name=$(grep -E '^name:' "$cfg" | awk '{print $2}')
  if [ -f "/tmp/stage_done_${name}" ]; then
    echo "=== stage $name already done, skipping" >> "$LOG"
    return 0
  fi
  echo "=== stage $name (cfg=$cfg budget=${budget}s) $(date)" >> "$LOG"
  timeout "$budget" python -u train_model.py --cfg "$cfg" >> "$LOG" 2>&1
  local rc=$?
  # export best -> weights/<name>.npz (also done live by the Trainer;
  # re-export in case the run predates that hook or was killed mid-save)
  python scripts/export_weights.py --cfg "$cfg" >> "$LOG" 2>&1
  echo "=== stage $name done rc=$rc $(date)" >> "$LOG"
  if [ "$rc" -eq 0 ]; then touch "/tmp/stage_done_${name}"; fi
  return 0
}

stage configs/detector_train.yaml    2400
stage configs/detector_train_r3.yaml 2400
stage configs/selector_train_r3.yaml 3600
stage configs/refiner_train_r3.yaml  7200
echo "=== train_r3_pipeline complete $(date)" >> "$LOG"
