#!/bin/bash
# Rope far-horizon campaign (VERDICT round-4 task 2).
#
# Trains the flagship config of record (identical to tools/rich_campaign.sh: B=2, Q=3,
# T=30 @ 240x320, causal ViT-B, AdamW 1e-4 with the 2/5-3/5-4/5 decay, 256 --rich
# scenes) with the RELATIVE time encoding stack turned on:
#   --temporal_rope 1       rotary relative time replaces the absolute time embedding
#   --rope_time_coords 1    TRUE source-frame timestamps drive the rotary tables
#   --rope_time_stretch 4   per-example log-uniform [1,4] stretch of those coordinates,
#                           training long relative offsets for far-horizon streaming
# The resulting checkpoint is scored by tools/stream_eval.py on the same 8x160-frame
# long scenes as the round-4 no-rope table (docs/stream_eval_r4.json, BASELINE.md):
# the no-rope model provably loses snitch identity past the trained horizon
# (0.05 -> ~0.001 beyond 4x); rope keeps relative offsets in-distribution at any
# absolute t. Reference contrast: fixed-T offline clips only
# (/root/reference/data/data_utils.py:301-342).
#
# Chunked exactly like rich_campaign.sh (55-min SIGTERM-preempt chunks, exact-step
# resume; the axon relay allows one TPU process at a time).
set -u
cd "$(dirname "$0")/.."
CKPT=${CKPT:-/tmp/rich_ckpt}
LOGS=${LOGS:-/tmp/rich_logs}
NAME=${NAME:-rope256}
DATA=${DATA:-/tmp/rich256}
EPOCHS=${EPOCHS:-36}
CHUNK_SECS=${CHUNK_SECS:-3300}
mkdir -p "$CKPT" "$LOGS"

common=(--batch_size 2 --num_queries 3 --num_frames 30 --num_epochs "$EPOCHS"
        --val_every 6 --checkpoint_every 6 --checkpoint_light 1
        --num_workers 2 --avoid_wandb 2 --max_objects 12
        --temporal_rope 1 --rope_time_coords 1 --rope_time_stretch 4
        --checkpoint_root "$CKPT" --log_root "$LOGS")

chunk=0
while true; do
  chunk=$((chunk + 1))
  if [ "$chunk" -eq 1 ] && [ ! -d "$CKPT/$NAME" ]; then
    args=(--name "$NAME" --data_path "$DATA")
  else
    args=(--resume "$NAME" --data_path "$DATA")
  fi
  echo "=== chunk $chunk ==="
  timeout -k 180 "$CHUNK_SECS" python train.py "${args[@]}" "${common[@]}" \
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
