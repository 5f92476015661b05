#!/bin/bash
# Stronger-conditioning branch of the strong_op hypothesis (round 5).
#
# results/strong_op/ showed that generated Accuracy stays at the chance
# shelf (1/26) at this model scale no matter the epochs, and
# results/cfg_run/ showed WHY guidance can't fix it: eps_c ~= eps_u — the
# generator never learns class identity THROUGH THE TEXT TOWER at 4L/d128
# on this corpus. strong_op's README names the confirmed branch: "a bigger
# model, stronger conditioning, or more data".
#
# This run executes the stronger-conditioning arm with the framework's own
# lever: --cap_id replaces the frozen-CLIP text tower with a learned
# class-embedding conditioner (models/text_encoder.py::ClassConditioner —
# the reference's PIT conditioning, interaction_transformer.py:436). Same
# corpus, labels, recipe, scale and evaluator pair as strong_op's e40 rows;
# ONLY the conditioning pathway differs. If Accuracy clears chance by a CI
# margin, the fifth metric becomes a live axis and the limitation is
# pinned on the text pathway at this scale — not on the data, the codec,
# or the diffusion stack.
set -e
cd /root/repo
ROOT=/tmp/eqrun3
DATA=$ROOT/data
CKPT=$ROOT/ckpt
SMALL="--num_layers 4 --latent_dim 128 --ff_size 256 --num_heads 8 \
 --num_text_layers 2 --text_latent_dim 64 --text_ff_size 128 --text_num_heads 4"

echo "=== stage 1: train the cap_id twin (40 epochs, matches strong_op e40) ==="
python tools/train.py --name eq_capid --dataset_name synthetic_mul \
  --data_root $DATA --checkpoints_dir $CKPT \
  --label_path $DATA/pseudo_labels.json $SMALL --cap_id \
  --batch_size 32 --times 4 --num_epochs ${EPOCHS:-40} --log_every 10 \
  --save_latest 1000 --eval_every_e 100

echo "=== stage 2: five-metric eval, DDPM + DDIM (same evaluator pair) ==="
cd $ROOT
for S in ddpm ddim; do
  python /root/repo/tools/evaluation.py \
    --opt_path $CKPT/synthetic_mul/eq_capid/opt.txt \
    --sampler $S \
    --eval_model_dir $CKPT/synthetic_mul/eval_model/model \
    --consistency_model_dir $CKPT/synthetic_mul/consistency_eval_model/model \
    --gen_T 91 --replication_times 3 --gen_batch 128 --file_id _capid_$S
  cat $ROOT/result/eq_capid/latest/summary_capid_$S.json; echo
done
echo "=== done $(date -u) ==="
