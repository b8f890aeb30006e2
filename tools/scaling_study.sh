#!/bin/bash
# Data-scaling study (VERDICT round 2, task 3): train the flagship config of record
# (B=2, Q=3, T=30 @ 240x320, causal ViT-B, AdamW 1e-4 with the 2/5-3/5-4/5 decay) on
# nested scene subsets (16 c 32 c 64 c 128 — prefixes of ONE 128-scene synthetic dataset,
# so bigger runs strictly add data) at a CONSTANT optimization budget of 384 train steps,
# then score every final checkpoint on a FIXED held-out 16-scene eval set (seed 7777) —
# killing the ~0.06 fresh-eval-set sampling noise round 2 measured. Approximates the
# reference's 4000-scene regime (/root/reference/gen_kubric/export_kub_rand.py:26-52).
#
# Usage: bash tools/scaling_study.sh [sizes...]   (default: 16 32 64 128)
# Expects /tmp/kub128 (128 scenes) + /tmp/kub_eval16 to exist (tcow_tpu.data.synthetic).
set -u
cd "$(dirname "$0")/.."
SIZES=(${@:-16 32 64 128})
CKPT=/tmp/scale_ckpt
LOGS=/tmp/scale_logs
mkdir -p "$CKPT" "$LOGS"

# Nested subsets as symlink dirs: scene dirs link into /tmp/kub128 so the npz
# preprocessing cache (written inside each scene dir) is shared across runs.
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
  epochs=$((768 / n))       # 384 steps at B=2: scenes*Q=3 queries -> n*3/2 steps/epoch...
  # steps/epoch = ceil(n / B) = n/2; constant 384 steps -> epochs = 768/n.
  val_every=$((epochs / 6)); [ "$val_every" -lt 1 ] && val_every=1
  name=sc$n
  echo "=== $name: $n scenes, $epochs epochs (384 steps), val every $val_every ==="
  timeout -k 180 7200 python train.py --name $name --data_path /tmp/kub$n \
    --batch_size 2 --num_queries 3 --num_frames 30 --num_epochs $epochs \
    --val_every $val_every --checkpoint_every $epochs --checkpoint_light 1 \
    --num_workers 2 --avoid_wandb 2 \
    --checkpoint_root $CKPT --log_root $LOGS > $LOGS/$name.train.log 2>&1
  echo "train $name exit=$?"
  timeout -k 60 3600 python eval/test.py --resume $name --name e_$name \
    --data_path /tmp/kub_eval16 --checkpoint_root $CKPT --log_root $LOGS \
    --num_workers 2 --avoid_wandb 2 --test_device_batch 4 \
    > $LOGS/$name.eval.log 2>&1
  echo "eval $name exit=$?"
  grep -E "weighted_mean|mean_snitch|mean_occl|mean_cont" $LOGS/$name.eval.log | tail -8
done
echo ALL_DONE
