#!/bin/bash
# Resume wrapper for tools/scaling_study.sh after a driver restart: waits for any
# in-flight train.py to release the chip, evals checkpoints that exist but have no
# eval log, and runs the remaining sizes. Idempotent — safe to re-run.
set -u
cd "$(dirname "$0")/.."
SIZES=(${@:-16 32 64 128})
CKPT=/tmp/scale_ckpt
LOGS=/tmp/scale_logs
mkdir -p "$CKPT" "$LOGS"

# Wait for any live train.py/eval process to release the single TPU chip.
while :; do
  live=0
  for p in $(pgrep -x python 2>/dev/null); do
    if tr '\0' ' ' < /proc/$p/cmdline 2>/dev/null | grep -qE 'train\.py|eval/test\.py|bench\.py'; then
      live=1
    fi
  done
  [ "$live" = 0 ] && break
  sleep 30
done

for n in 16 32 64 128; do
  d=/tmp/kub$n
  if [ "$n" != 128 ] && [ ! -d "$d" ]; then
    mkdir -p "$d"
    for s in $(ls /tmp/kub128 | head -$n); do
      ln -sfn /tmp/kub128/$s $d/$s
    done
  fi
done

for n in "${SIZES[@]}"; do
  epochs=$((768 / n))
  val_every=$((epochs / 6)); [ "$val_every" -lt 1 ] && val_every=1
  name=sc$n
  done_epoch=$(cat $CKPT/$name/checkpoint_epoch.txt 2>/dev/null || echo -2)
  if [ "${done_epoch%%.*}" -lt "$((epochs - 1))" ]; then
    echo "=== $name: $n scenes, $epochs epochs (384 steps), val every $val_every ==="
    timeout -k 180 7200 python train.py --name $name --data_path /tmp/kub$n \
      --batch_size 2 --num_queries 3 --num_frames 30 --num_epochs $epochs \
      --val_every $val_every --checkpoint_every $epochs --checkpoint_light 1 \
      --num_workers 2 --avoid_wandb 2 \
      --checkpoint_root $CKPT --log_root $LOGS > $LOGS/$name.train.log 2>&1
    echo "train $name exit=$?"
  else
    echo "=== $name: checkpoint exists, skipping train ==="
  fi
  if ! grep -q "weighted_mean\|mean_snitch" $LOGS/$name.eval.log 2>/dev/null; then
    timeout -k 60 3600 python eval/test.py --resume $name --name e_$name \
      --data_path /tmp/kub_eval16 --checkpoint_root $CKPT --log_root $LOGS \
      --num_workers 2 --avoid_wandb 2 --test_device_batch 4 \
      > $LOGS/$name.eval.log 2>&1
    echo "eval $name exit=$?"
  fi
  grep -E "weighted_mean|mean_snitch|mean_occl|mean_cont" $LOGS/$name.eval.log | tail -8
done
echo ALL_DONE
