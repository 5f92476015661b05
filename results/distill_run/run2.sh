#!/bin/bash
# Follow-up to run.sh: the very-few-step regime, where the methods separate.
# - distill one more halving (7 -> 4) off the distill7 student
# - evaluate: distilled-4 vs the raw teacher at DDIM-4 and at DPM-Solver-4
#   (training-free second-order), plus teacher DPM-7 for the 7-step row.
set -e
cd /root/repo
ROOT=/tmp/eqrun3
CKPT=$ROOT/ckpt
TEACHER=$CKPT/synthetic_mul/eq_interaction

echo "=== stage D: distill 7 -> 4 -> 2 ==="
python tools/distill.py \
  --opt_path $CKPT/synthetic_mul/eq_interaction_distill7/opt.txt \
  --stages 4,2 --epochs_per_stage 4 --times 2 --lr 5e-5 --log_every 20

echo "=== stage E: very-few-step evaluations ==="
cd $ROOT
for N in 4 2; do
  python /root/repo/tools/evaluation.py \
    --opt_path $CKPT/synthetic_mul/eq_interaction_distill7_distill$N/opt.txt \
    --eval_model_dir $CKPT/synthetic_mul/eval_model/model \
    --consistency_model_dir $CKPT/synthetic_mul/consistency_eval_model/model \
    --gen_T 91 --replication_times 3 --gen_batch 128 --file_id _distill$N
done

for CONF in "ddim 4 _teacher_ddim4" "dpm 4 _teacher_dpm4" "dpm 7 _teacher_dpm7" \
            "ddim 2 _teacher_ddim2"; do
  set -- $CONF
  echo "--- teacher $1-$2 ---"
  python /root/repo/tools/evaluation.py \
    --opt_path $TEACHER/opt.txt \
    --eval_model_dir $CKPT/synthetic_mul/eval_model/model \
    --consistency_model_dir $CKPT/synthetic_mul/consistency_eval_model/model \
    --sampler $1 --ddim_steps $2 \
    --gen_T 91 --replication_times 3 --gen_batch 128 --file_id $3
done

echo "=== done ==="
for F in $ROOT/result/eq_interaction_distill7_distill4/latest/summary_distill4.json \
         $ROOT/result/eq_interaction_distill7_distill2/latest/summary_distill2.json \
         $ROOT/result/eq_interaction/latest/summary_teacher_ddim4.json \
         $ROOT/result/eq_interaction/latest/summary_teacher_ddim2.json \
         $ROOT/result/eq_interaction/latest/summary_teacher_dpm4.json \
         $ROOT/result/eq_interaction/latest/summary_teacher_dpm7.json; do
  echo "--- $F ---"; cat $F; echo
done
