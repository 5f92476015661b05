#!/bin/bash
# The final rung: distill the 2-step student to ONE denoiser call.
# Requires the teacher-grid-snapped midpoints (distill_grids teacher_steps=2:
# the 2-step teacher is only defined on {999, 0}) and the ddim_timesteps
# num_steps=1 fix (grid [999], not [0]).
#
# Ablation: the raw eq_interaction teacher evaluated at DDIM-1 — one x0
# prediction from pure noise by a model never trained for few-step sampling.
# (DPM-Solver-1 is skipped: at N=1 its single step IS the DDIM-1 update.)
set -e
cd /root/repo
ROOT=/tmp/eqrun3
CKPT=$ROOT/ckpt
TEACHER=$CKPT/synthetic_mul/eq_interaction

echo "=== stage F: distill 2 -> 1 ==="
python tools/distill.py \
  --opt_path $CKPT/synthetic_mul/eq_interaction_distill7_distill2/opt.txt \
  --stages 1 --epochs_per_stage 4 --times 2 --lr 5e-5 --log_every 20

echo "=== stage G: one-step evaluations ==="
cd $ROOT
python /root/repo/tools/evaluation.py \
  --opt_path $CKPT/synthetic_mul/eq_interaction_distill7_distill2_distill1/opt.txt \
  --eval_model_dir $CKPT/synthetic_mul/eval_model/model \
  --consistency_model_dir $CKPT/synthetic_mul/consistency_eval_model/model \
  --gen_T 91 --replication_times 3 --gen_batch 128 --file_id _distill1

python /root/repo/tools/evaluation.py \
  --opt_path $TEACHER/opt.txt \
  --eval_model_dir $CKPT/synthetic_mul/eval_model/model \
  --consistency_model_dir $CKPT/synthetic_mul/consistency_eval_model/model \
  --sampler ddim --ddim_steps 1 \
  --gen_T 91 --replication_times 3 --gen_batch 128 --file_id _teacher_ddim1

echo "=== done ==="
for F in $ROOT/result/eq_interaction_distill7_distill2_distill1/latest/summary_distill1.json \
         $ROOT/result/eq_interaction/latest/summary_teacher_ddim1.json; do
  echo "--- $F ---"; cat $F; echo
done
