#!/bin/bash
# Containment-generalization data-axis campaign (VERDICT round-4 task 1, round 5).
#
# The 36-epoch rich256 campaign proved 256 containment episodes (~1/scene) memorize
# without generalizing (train cont_mask IoU -> 0.31, eval 0.000 at every checkpoint —
# BASELINE.md). This campaign trains the same config of record on /tmp/rich512mix:
# 512 scenes = the original 256 rich scenes + 256 NEW --rich_cont_episodes 3 scenes
# (~2-3 independent containment episodes each, tcow_tpu/data/synthetic.py), i.e. ~3x the
# distinct containment episodes with much higher per-scene diversity. Assembled by
# tools/mix_dataset.py (symlinks; warm caches shared).
#
# Each chunk evaluates BOTH fixed held-out sets: the original rich_eval16 (50 contained
# frames — comparable to every prior table row) and the containment-heavy rich_eval16c
# (~68-91 contained frames — better statistics for the containment families).
set -u
cd "$(dirname "$0")/.."
CKPT=${CKPT:-/tmp/rich_ckpt}
LOGS=${LOGS:-/tmp/rich_logs}
NAME=${NAME:-mix512}
DATA=${DATA:-/tmp/rich512mix}
EPOCHS=${EPOCHS:-12}
CHUNK_SECS=${CHUNK_SECS:-3300}
mkdir -p "$CKPT" "$LOGS"

common=(--batch_size 2 --num_queries 3 --num_frames 30 --num_epochs "$EPOCHS"
        --val_every 6 --checkpoint_every 6 --checkpoint_light 1
        --num_workers 2 --avoid_wandb 2 --max_objects 12
        --checkpoint_root "$CKPT" --log_root "$LOGS")

evalboth () {
  local tag=$1
  for ev in /tmp/rich_eval16:e_${NAME}_${tag} /tmp/rich_eval16c:e_${NAME}16c_${tag}; do
    local dp=${ev%%:*} nm=${ev##*:}
    timeout -k 60 1800 python eval/test.py --resume "$NAME" --name "$nm" \
        --data_path "$dp" --checkpoint_root "$CKPT" --log_root "$LOGS" \
        --num_workers 2 --avoid_wandb 2 --test_device_batch 4 \
        > "$LOGS/$NAME.eval_$nm.log" 2>&1
    grep -E "weighted_mean" "$LOGS/$NAME.eval_$nm.log" | tail -8
  done
}

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
  if [ "$code" -eq 0 ]; then
    evalboth final
    break
  fi
  evalboth "c$chunk"
done
echo ALL_DONE
