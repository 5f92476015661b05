#!/bin/bash
# Classifier-free-guidance quality evidence (VERDICT r3 next #3).
#
# Design: instead of training a 30-epoch CFG twin from scratch, WARM-START
# from the trained eqrun3 generator with tools/add_cfg_branch.py (graft the
# zero-init null branch onto eq_interaction@latest), finetune 10 epochs with
# --cond_drop_prob 0.2 (epochs 30->40), then sweep --guidance_scale w over
# the five-metric eval. This isolates the guidance effect from training-run
# variance — the w=1 sampler starts exactly at the donor's optimum — and is
# itself a framework feature the reference has no counterpart for (its only
# guidance hook is the classifier cond_fn,
# codes/models/gaussian_diffusion.py:567-604).
#
# The internal baseline for the sweep is the w=1 row (same weights, same
# sampler); eq_interaction's summary_ddim.json is the pre-finetune anchor
# (the finetuned model has 10 extra epochs — noted honestly).
#
# w order: informative points first (1 = unguided, then the standard 2-3
# band, then extremes) so a truncated run still tells the story. Every
# w != 1 eval pays two denoiser calls per step (bench row ddim50_cfg_w2).
#
# Prereq: /tmp/eqrun3 (results/eqrun3_allfive/run.sh).
set -e
cd /root/repo
ROOT=/tmp/eqrun3
DATA=$ROOT/data
CKPT=$ROOT/ckpt
SMALL="--num_layers 4 --latent_dim 128 --ff_size 256 --num_heads 8 \
 --num_text_layers 2 --text_latent_dim 64 --text_ff_size 128 --text_num_heads 4"

if [ ! -d "$CKPT/synthetic_mul/eq_interaction_cfg/model/latest" ]; then
  echo "=== stage 0: graft the null branch onto eq_interaction@latest ==="
  python tools/add_cfg_branch.py \
    --opt_path $CKPT/synthetic_mul/eq_interaction/opt.txt \
    --name eq_interaction_cfg --cond_drop_prob 0.2
fi

echo "=== stage 1: finetune the null branch (+10 epochs past the donor, drop 0.2) ==="
# FT_EPOCHS = donor epoch + 10; round-3 world donors sit at 30 (default 40),
# the round-5 TPU rebuild trains the donor to 60 (pass FT_EPOCHS=70)
python tools/train.py --name eq_interaction_cfg --dataset_name synthetic_mul \
  --data_root $DATA --checkpoints_dir $CKPT \
  --label_path $DATA/pseudo_labels.json $SMALL --cond_drop_prob 0.2 \
  --batch_size 32 --times 4 --num_epochs ${FT_EPOCHS:-40} --log_every 10 \
  --save_latest 1000 --eval_every_e 100 --is_continue

echo "=== stage 2: guidance-scale sweep, DDIM-50, five metrics ==="
cd $ROOT
for W in 1 2 3 1.5 5 7.5; do
  TAG=$(echo $W | tr . p)
  echo "--- w = $W ---"
  python /root/repo/tools/evaluation.py \
    --opt_path $CKPT/synthetic_mul/eq_interaction_cfg/opt.txt \
    --eval_model_dir $CKPT/synthetic_mul/eval_model/model \
    --consistency_model_dir $CKPT/synthetic_mul/consistency_eval_model/model \
    --sampler ddim --guidance_scale $W --gen_T 91 --replication_times 3 \
    --gen_batch ${GEN_BATCH:-128} --file_id _cfg_w$TAG
  cat $ROOT/result/eq_interaction_cfg/latest/summary_cfg_w$TAG.json; echo
done

# stage 3 (optional, DISTILL_W=<w> to enable): fixed-w guided distillation —
# distill the guided trajectory at the sweep's winning w into a student that
# samples UNGUIDED (one denoiser call/step; tools/distill.py --distill_w),
# then eval the student at w=1 against the teacher's w=$DISTILL_W row. This
# also quantifies the branchwise-vs-guided distillation gap (advisor r4 low,
# diffusion/distill.py docstring).
if [ -n "${DISTILL_W:-}" ]; then
  echo "=== stage 3: guided distillation at w=$DISTILL_W (50 -> 25) ==="
  cd /root/repo
  python tools/distill.py \
    --opt_path $CKPT/synthetic_mul/eq_interaction_cfg/opt.txt \
    --stages 25 --epochs_per_stage 4 --times 2 --lr 5e-5 --log_every 20 \
    --distill_w $DISTILL_W
  cd $ROOT
  python /root/repo/tools/evaluation.py \
    --opt_path $CKPT/synthetic_mul/eq_interaction_cfg_distill25/opt.txt \
    --eval_model_dir $CKPT/synthetic_mul/eval_model/model \
    --consistency_model_dir $CKPT/synthetic_mul/consistency_eval_model/model \
    --gen_T 91 --replication_times 3 --gen_batch ${GEN_BATCH:-128} \
    --file_id _cfgdistill25
  cat $ROOT/result/eq_interaction_cfg_distill25/latest/summary_cfgdistill25.json; echo
fi
echo "=== done ==="
