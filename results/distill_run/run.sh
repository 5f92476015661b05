#!/bin/bash
# Round-3 progressive-distillation experiment: halve the production DDIM-50
# grid (25 -> 13 -> 7) on the eqrun3 equivalence teacher and show five-metric
# parity at each stage with tools/evaluation.py, plus the ablation that the
# UNdistilled teacher degrades when simply evaluated at DDIM-7.
#
# Prereq: the round-3 equivalence world at /tmp/eqrun3
# (results/eqrun3_allfive/run.sh builds it from scratch: stratified synthetic
# corpus, trained f32 generator eq_interaction, trained eval models).
set -e
cd /root/repo
ROOT=/tmp/eqrun3
CKPT=$ROOT/ckpt
TEACHER=$CKPT/synthetic_mul/eq_interaction

echo "=== stage A: progressive distillation 50 -> 25 -> 13 -> 7 ==="
python tools/distill.py --opt_path $TEACHER/opt.txt \
  --stages 25,13,7 --epochs_per_stage 4 --times 2 --lr 5e-5 \
  --log_every 20

echo "=== stage B: five-metric evaluation of every stage ==="
cd $ROOT
for N in 25 13 7; do
  echo "--- distilled DDIM-$N ---"
  python /root/repo/tools/evaluation.py \
    --opt_path $CKPT/synthetic_mul/eq_interaction_distill$N/opt.txt \
    --eval_model_dir $CKPT/synthetic_mul/eval_model/model \
    --consistency_model_dir $CKPT/synthetic_mul/consistency_eval_model/model \
    --gen_T 91 --replication_times 3 --gen_batch 128 --file_id _distill$N
done

echo "=== stage C: ablation — the raw teacher at DDIM-7 (no distillation) ==="
python /root/repo/tools/evaluation.py \
  --opt_path $TEACHER/opt.txt \
  --eval_model_dir $CKPT/synthetic_mul/eval_model/model \
  --consistency_model_dir $CKPT/synthetic_mul/consistency_eval_model/model \
  --sampler ddim --ddim_steps 7 \
  --gen_T 91 --replication_times 3 --gen_batch 128 --file_id _teacher_ddim7

echo "=== done ==="
for F in $ROOT/result/eq_interaction_distill25/latest/summary_distill25.json \
         $ROOT/result/eq_interaction_distill13/latest/summary_distill13.json \
         $ROOT/result/eq_interaction_distill7/latest/summary_distill7.json \
         $ROOT/result/eq_interaction/latest/summary_teacher_ddim7.json; do
  echo "--- $F ---"; cat $F; echo
done
