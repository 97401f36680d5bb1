#!/bin/bash
# Round-4 training pipeline: finish the synthetic curriculum on the one TPU
# chip and COMMIT an npz weight snapshot after every stage (VERDICT r3 item 1:
# round 3 trained but committed zero weights, so bench ran on random params).
#
# Stage order matches what configs/gen6d_synthetic.yaml (the bench config)
# loads: detector_synthetic -> selector_synthetic -> refiner_synthetic.
# The Trainer exports weights/<name>.npz live on every best-save and traps
# SIGTERM (wall-clock `timeout` below) to save a resumable checkpoint, so a
# stage kill loses nothing: the best snapshot is already on disk.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/train_r4.log
echo "=== train_r4_pipeline start $(date)" >> "$LOG"

# wait for an already-running stage-1 detector train (left by the session)
if [ -f /tmp/det_train.pid ] && kill -0 "$(cat /tmp/det_train.pid)" 2>/dev/null; then
  echo "=== waiting for running detector train pid=$(cat /tmp/det_train.pid)" >> "$LOG"
  while kill -0 "$(cat /tmp/det_train.pid)" 2>/dev/null; do sleep 30; done
fi

commit_weights() {
  # commit ONLY weight snapshots; retry around concurrent index locks
  local msg=$1
  for i in 1 2 3 4 5; do
    git add weights/*.npz 2>>"$LOG" && \
      git commit -q -m "$msg" -- weights && { echo "=== committed: $msg" >> "$LOG"; return 0; }
    sleep 7
  done
  echo "=== COMMIT FAILED: $msg" >> "$LOG"
}

commit_weights "Update detector_synthetic weight snapshot (stage 1 complete)"

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
  echo "=== stage $name done rc=$rc $(date)" >> "$LOG"
  commit_weights "Commit ${name} trained weight snapshot"
  touch "/tmp/stage_done_${name}"
  return 0
}

stage configs/selector_train.yaml 7200
stage configs/refiner_train.yaml 14400
echo "=== train_r4_pipeline complete $(date)" >> "$LOG"
touch /tmp/train_r4_done
