#!/bin/bash
# Supervised training: restart-on-stall loop around `cli train`.
#
# Usage:  tools/train_supervised.sh --backbone resnet50 ... \
#             --watchdog_timeout_s 1200 --save_dir runs/myrun
#
# Runs the CLI once with the given args; whenever it exits with the stall
# watchdog's code (117 — a wedged device op, train/watchdog.py), re-runs
# it with `--resume true` so training continues from the last
# completed-epoch checkpoint.  Any other exit code ends the loop.
set -u
py=${PYTHON:-python}
"$py" -m yolo_v1_tpu.cli train "$@"
rc=$?
while [ "$rc" -eq 117 ]; do
  echo "train_supervised: stall watchdog fired (exit 117); resuming" >&2
  "$py" -m yolo_v1_tpu.cli train "$@" --resume true
  rc=$?
done
exit "$rc"
