#!/bin/bash
# Full-size distillation-ladder validation (VERDICT r3 next #6): the round-3
# ladder only ever trained at equivalence scale (4 layers, d=128). Here an
# 8-layer d=512 teacher (the flagship config, reference scale) is trained on
# the same stratified synthetic corpus, distilled down the 50 -> 25 -> 13
# rungs, and one rung gets the five-metric eval — validating stage-loss
# plateaus, stage timing, and memory at production scale.
#
# Runs on the real TPU (full-size training is impractical on the 1-core CPU
# host); the eqrun3 eval models score the generations (the evaluator is
# independent of generator size — same data, same stats).
#
# Prereq: /tmp/eqrun3 (results/eqrun3_allfive/run.sh).
set -e
cd /root/repo
ROOT=/tmp/eqrun3
DATA=$ROOT/data
CKPT=$ROOT/ckpt

if [ ! -d "$CKPT/synthetic_mul/full_interaction/model/latest" ]; then
  echo "=== stage 1: train full-size teacher (8 layers, d=512) ==="
  python tools/train.py --name full_interaction --dataset_name synthetic_mul \
    --data_root $DATA --checkpoints_dir $CKPT \
    --label_path $DATA/pseudo_labels.json \
    --batch_size 64 --times 4 --num_epochs 30 --log_every 10 \
    --save_latest 1000 --eval_every_e 100
fi

echo "=== stage 2: distill 50 -> 25 -> 13 ==="
python tools/distill.py --opt_path $CKPT/synthetic_mul/full_interaction/opt.txt \
  --stages 25,13 --epochs_per_stage 4 --times 2 --lr 5e-5 --log_every 20

echo "=== stage 3: five-metric eval — teacher DDIM-50 vs distilled-13 ==="
cd $ROOT
python /root/repo/tools/evaluation.py \
  --opt_path $CKPT/synthetic_mul/full_interaction/opt.txt \
  --eval_model_dir $CKPT/synthetic_mul/eval_model/model \
  --consistency_model_dir $CKPT/synthetic_mul/consistency_eval_model/model \
  --sampler ddim --gen_T 91 --replication_times 3 --gen_batch 64 \
  --file_id _full_ddim50
python /root/repo/tools/evaluation.py \
  --opt_path $CKPT/synthetic_mul/full_interaction_distill13/opt.txt \
  --eval_model_dir $CKPT/synthetic_mul/eval_model/model \
  --consistency_model_dir $CKPT/synthetic_mul/consistency_eval_model/model \
  --gen_T 91 --replication_times 3 --gen_batch 64 --file_id _full_distill13
echo "=== done ==="
for F in $ROOT/result/full_interaction/latest/summary_full_ddim50.json \
         $ROOT/result/full_interaction_distill13/latest/summary_full_distill13.json; do
  echo "--- $F ---"; cat $F; echo
done
