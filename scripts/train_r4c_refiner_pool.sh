#!/bin/bash
# Round-4 refiner stage 2 (run after train_r4b kills/finishes stage 1):
# 1. gen_val_set on the 256-view val scene (64 realistic det/sel-initialized
#    sweeps for best-checkpoint selection);
# 2. fine-tune refiner_r4 on the 26-combo pool, warm from refiner_synthetic.
# Budget via $POOL_BUDGET (default leaves ~2h of TPU for bench/calibration).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/train_r4c.log
echo "=== train_r4c start $(date)" >> "$LOG"

commit_weights() {
  local msg=$1
  for i in 1 2 3 4 5; do
    git add weights/*.npz 2>>"$LOG" && \
      git commit -q -m "$msg" -- weights && { echo "=== committed: $msg" >> "$LOG"; return 0; }
    sleep 7
  done
  echo "=== COMMIT FAILED: $msg" >> "$LOG"
}

DB='synthetic/256@9:prism-blobs'
if [ ! -f "data/val/det/$DB/det.pkl" ]; then
  echo "=== gen_val_set 256 $(date)" >> "$LOG"
  timeout 2400 python -u prepare.py --action gen_val_set \
    --database_name "$DB" --que_database "$DB" \
    --ref_split synthetic_split --que_split synthetic_split >> "$LOG" 2>&1
  echo "=== gen_val_set 256 done rc=$? $(date)" >> "$LOG"
fi

echo "=== stage refiner_r4 $(date)" >> "$LOG"
timeout "${POOL_BUDGET:-12600}" python -u train_model.py \
  --cfg configs/refiner_train_r4.yaml >> "$LOG" 2>&1
echo "=== stage refiner_r4 done rc=$? $(date)" >> "$LOG"
commit_weights "Commit refiner_r4 pool-finetuned weight snapshot"
touch /tmp/train_r4c_done
