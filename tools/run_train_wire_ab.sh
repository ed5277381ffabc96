#!/bin/bash
# Interleaved train-loop wire-format A/B on the TPU (VERDICT r4 item 1).
#
# Legs alternate rgb8 / yuv420(packed-through-scan) / yuv420_eager so tunnel
# drift cannot masquerade as a wire effect (same protocol as the r4 eval
# A/B). Each leg: tools/bench_train.py 48, K=8 multi-dispatch only, device
# class cache ON, 4 loader workers — the r4 matrix's best cell (cache1_w4).
# Results append to /tmp/train_wire_ab.log.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/train_wire_ab.log
: > "$LOG"
for leg in rgb8 yuv420 yuv420_eager rgb8 yuv420 yuv420_eager; do
  echo "=== leg $leg $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  OS2D_SKIP_SINGLE=1 OS2D_TRAIN_K=8 OS2D_DEVICE_CLASS_CACHE=1 \
  OS2D_LOADER_WORKERS=4 OS2D_UPLOAD_PIXEL_FORMAT=$leg \
  timeout 900 python tools/bench_train.py 48 2>&1 | tail -4 | tee -a "$LOG"
done
echo "done $(date -u +%H:%M:%S)" | tee -a "$LOG"
