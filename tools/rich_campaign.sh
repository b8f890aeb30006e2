#!/bin/bash
# Rich-scene occl/cont learning campaign (VERDICT round-3 task 2).
#
# Trains the flagship config of record (B=2, Q=3, T=30 @ 240x320, causal ViT-B, AdamW
# 1e-4 with the 2/5-3/5-4/5 decay) on 256 --rich synthetic scenes (scripted
# full-occlusion + containment episodes, tcow_tpu/data/synthetic.py) for 36 epochs
# (4608 steps, 12x the round-3 384-step baseline budget), evaluating intermediate
# checkpoints on a FIXED held-out 16-scene rich eval set so all six reference metric
# families (/root/reference/eval/metrics.py:86-103) are tracked across the schedule.
#
# The axon relay allows one TPU process at a time and sessions are bounded, so the run
# is chunked: each chunk is `timeout -k 180 3300` (55 min; SIGTERM -> --preempt_save
# writes a full mid-epoch checkpoint, ~60 s device_get over the relay) and the next
# chunk resumes exactly (per-step resume, train/driver.py). This is the preemption
# machinery exercised for real, not a workaround.
#
# Data (once):
#   python -m tcow_tpu.data.synthetic --out /tmp/rich256    --num_scenes 256 \
#       --frames 40 --height 360 --width 480 --objects 8 --rich --seed 1000
#   python -m tcow_tpu.data.synthetic --out /tmp/rich_eval16 --num_scenes 16 \
#       --frames 40 --height 360 --width 480 --objects 8 --rich --seed 7777
#   python tools/warm_cache.py --data_path /tmp/rich256    --num_frames 30 --max_delay 6 \
#       --workers 2 --phases train
#   python tools/warm_cache.py --data_path /tmp/rich_eval16 --num_frames 30 --max_delay 6 \
#       --workers 2 --phases test
#
# --max_objects 12: the rich generator emits <=10 instances/scene, so the packed-mask
# transfer + collate run at M=12 instead of the reference padding M=36 (3x less host
# work; supervision/metrics are padding-invariant, tests/test_native.py).
set -u
cd "$(dirname "$0")/.."
CKPT=${CKPT:-/tmp/rich_ckpt}
LOGS=${LOGS:-/tmp/rich_logs}
NAME=${NAME:-rich256}
mkdir -p "$CKPT" "$LOGS"

common=(--batch_size 2 --num_queries 3 --num_frames 30 --num_epochs 36
        --val_every 6 --checkpoint_every 6 --checkpoint_light 1
        --num_workers 2 --avoid_wandb 2 --max_objects 12
        --checkpoint_root "$CKPT" --log_root "$LOGS")

chunk=0
while true; do
  chunk=$((chunk + 1))
  if [ "$chunk" -eq 1 ] && [ ! -d "$CKPT/$NAME" ]; then
    args=(--name "$NAME" --data_path /tmp/rich256)
  else
    args=(--resume "$NAME" --data_path /tmp/rich256)
  fi
  echo "=== chunk $chunk ==="
  timeout -k 180 3300 python train.py "${args[@]}" "${common[@]}" \
      > "$LOGS/$NAME.chunk$chunk.log" 2>&1
  code=$?
  echo "chunk $chunk exit=$code"
  [ "$code" -eq 0 ] && break           # schedule complete
  # Trajectory point: score the latest checkpoint on the fixed rich eval set.
  timeout -k 60 1800 python eval/test.py --resume "$NAME" --name "e_${NAME}_c$chunk" \
      --data_path /tmp/rich_eval16 --checkpoint_root "$CKPT" --log_root "$LOGS" \
      --num_workers 2 --avoid_wandb 2 --test_device_batch 4 \
      > "$LOGS/$NAME.eval_c$chunk.log" 2>&1
  grep -E "weighted_mean" "$LOGS/$NAME.eval_c$chunk.log" | tail -8
done
echo ALL_DONE
