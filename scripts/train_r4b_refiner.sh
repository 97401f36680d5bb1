#!/bin/bash
# Round-4 session B: the refiner is the one missing weight snapshot
# (weights/ has detector_synthetic.npz + selector_synthetic.npz only).
# 1. gen_val_set: cache det/sel predictions on the held-out val scene so
#    refiner best-checkpoint selection runs on the pipeline's REAL pose
#    initializations (reference prepare.py:44-71 -> RefinerValDataset).
# 2. train refiner_synthetic; Trainer exports weights/refiner_synthetic.npz
#    on every best-save and traps SIGTERM, so the wall-clock kill is safe.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/train_r4b.log
echo "=== train_r4b start $(date)" >> "$LOG"

commit_weights() {
  local msg=$1
  for i in 1 2 3 4 5; do
    git add weights/*.npz 2>>"$LOG" && \
      git commit -q -m "$msg" -- weights && { echo "=== committed: $msg" >> "$LOG"; return 0; }
    sleep 7
  done
  echo "=== COMMIT FAILED: $msg" >> "$LOG"
}

DB='synthetic/128@9:prism-blobs'
if [ ! -f "data/val/det/$DB/det.pkl" ]; then
  echo "=== gen_val_set $(date)" >> "$LOG"
  timeout 2400 python -u prepare.py --action gen_val_set \
    --database_name "$DB" --que_database "$DB" \
    --ref_split synthetic_split --que_split synthetic_split >> "$LOG" 2>&1
  echo "=== gen_val_set done rc=$? $(date)" >> "$LOG"
fi

echo "=== stage refiner_synthetic $(date)" >> "$LOG"
timeout "${REFINER_BUDGET:-16200}" python -u train_model.py \
  --cfg configs/refiner_train.yaml >> "$LOG" 2>&1
echo "=== stage refiner_synthetic done rc=$? $(date)" >> "$LOG"
commit_weights "Commit refiner_synthetic trained weight snapshot"
touch /tmp/train_r4b_done
