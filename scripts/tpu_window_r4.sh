#!/bin/bash
# Round-4 TPU window: runs when the refiner_r4 pool fine-tune finishes.
# Everything logs to /tmp/tpu_window.log; bench A/Bs write JSON lines to
# /tmp/bench_ab.jsonl for the config decision afterwards.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_window.log
AB=/tmp/bench_ab.jsonl
echo "=== tpu_window start $(date)" >> "$LOG"

while [ ! -f /tmp/train_r4c_done ]; do sleep 30; done
echo "=== training done, TPU free $(date)" >> "$LOG"

# 1. compiled-mode Pallas kernel regressions (volume + warp) on the real chip
echo "=== tpu_compiled tests $(date)" >> "$LOG"
GEN6D_TPU_TESTS=1 timeout 2400 python -m pytest tests/test_tpu_compiled.py -m "" -q \
  >> "$LOG" 2>&1
echo "=== tpu_compiled rc=$? $(date)" >> "$LOG"

# 2. refiner head calibrations (raw-head measurement: absolute values)
echo "=== calibrate refine (r4) $(date)" >> "$LOG"
timeout 2400 python scripts/calibrate_refine_scale.py --cfg configs/gen6d_r4.yaml \
  >> "$LOG" 2>&1
echo "=== calibrate refine rc=$? $(date)" >> "$LOG"

# 3. detector decode bias re-check (serving path WITH the current correction
#    active: a ~0 recommendation confirms the committed calibration)
echo "=== calibrate det recheck $(date)" >> "$LOG"
timeout 2400 python scripts/calibrate_det_scale.py --cfg configs/gen6d_r4.yaml \
  >> "$LOG" 2>&1
echo "=== calibrate det rc=$? $(date)" >> "$LOG"

# 4. bench A/Bs (corrections for r4 not yet applied — these runs rank
#    configs/warp/batch; the final authoritative bench runs after the
#    config update)
bench_ab () {
  local tag=$1; shift
  echo "=== bench $tag $(date)" >> "$LOG"
  local out
  out=$(timeout 1800 python bench.py "$@" 2>>"$LOG" | tail -1)
  echo "{\"tag\": \"$tag\", \"out\": $out}" >> "$AB" 2>/dev/null \
    || echo "=== bench $tag produced no JSON" >> "$LOG"
  echo "$out" >> "$LOG"
}
bench_ab r4_gather_b8 --cfg configs/gen6d_r4.yaml
bench_ab synth_gather_b8
echo "=== tpu_window phase-1 complete $(date)" >> "$LOG"
touch /tmp/tpu_window_done
