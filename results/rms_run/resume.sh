#!/bin/bash
# Resume of run.sh after the round-3 session died at epoch 4/30 (driver_run.log).
# Identical config + --is_continue (restores orbax `latest`, rollback-safe).
set -e
cd /root/repo
ROOT=/tmp/eqrun3
DATA=$ROOT/data
CKPT=$ROOT/ckpt
SMALL="--num_layers 4 --latent_dim 128 --ff_size 256 --num_heads 8 \
 --num_text_layers 2 --text_latent_dim 64 --text_ff_size 128 --text_num_heads 4"

echo "=== stage 1 (resumed): train rms_norm twin ==="
python tools/train.py --name eq_interaction_rms --dataset_name synthetic_mul \
  --data_root $DATA --checkpoints_dir $CKPT \
  --label_path $DATA/pseudo_labels.json $SMALL --rms_norm \
  --batch_size 32 --times 4 --num_epochs 30 --log_every 10 --save_latest 1000 \
  --eval_every_e 100 --is_continue

echo "=== stage 2: five-metric eval, DDIM-50 ==="
cd $ROOT
python /root/repo/tools/evaluation.py \
  --opt_path $CKPT/synthetic_mul/eq_interaction_rms/opt.txt \
  --eval_model_dir $CKPT/synthetic_mul/eval_model/model \
  --consistency_model_dir $CKPT/synthetic_mul/consistency_eval_model/model \
  --sampler ddim --gen_T 91 --replication_times 3 --gen_batch 128 --file_id _rms_ddim

echo "=== done ==="
cat $ROOT/result/eq_interaction_rms/latest/summary_rms_ddim.json; echo
