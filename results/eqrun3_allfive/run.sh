#!/bin/bash
# Round-3 DDPM-vs-DDIM metric-equivalence run (VERDICT r2 next #1 + #3):
# - corpus scaled + stratified so every class has 18 test clips
#   (> mm_num_times+1 = 16) => MultiModality is finally LIVE, nonzero for
#   both ground truth and generated.
# - adds a bf16 mixed-precision twin of the generator (same data, same
#   epochs) for loss-curve + metric parity vs f32 (the reference has no AMP).
set -e
cd /root/repo
ROOT=/tmp/eqrun3
DATA=$ROOT/data
CKPT=$ROOT/ckpt
mkdir -p $ROOT
SMALL="--num_layers 4 --latent_dim 128 --ff_size 256 --num_heads 8 \
 --num_text_layers 2 --text_latent_dim 64 --text_ff_size 128 --text_num_heads 4"

echo "=== stage 0: synthetic data (stratified, 90 clips/class) ==="
python tools/make_synthetic_data.py --root $DATA --clips_per_class 90 \
  --min_frames 40 --max_frames 120 --cpu

python - <<EOF
import json
names = open("$DATA/train_sub.txt").read().split()
json.dump({n: i % 2 for i, n in enumerate(names)}, open("$DATA/pseudo_labels.json", "w"))
print("labels:", len(names))
EOF

echo "=== stage 1: train interaction model, f32 ==="
python tools/train.py --name eq_interaction --dataset_name synthetic_mul \
  --data_root $DATA --checkpoints_dir $CKPT \
  --label_path $DATA/pseudo_labels.json $SMALL \
  --batch_size 32 --times 4 --num_epochs 30 --log_every 10 --save_latest 1000 \
  --eval_every_e 100

echo "=== stage 1b: train bf16 twin (identical data/schedule) ==="
python tools/train.py --name eq_interaction_bf16 --dataset_name synthetic_mul \
  --data_root $DATA --checkpoints_dir $CKPT \
  --label_path $DATA/pseudo_labels.json $SMALL --compute_dtype bfloat16 \
  --batch_size 32 --times 4 --num_epochs 30 --log_every 10 --save_latest 1000 \
  --eval_every_e 100

echo "=== stage 2: eval models ==="
python tools/train_evaluation_model.py --name eval_model --dataset_name synthetic_mul \
  --data_root $DATA --checkpoints_dir $CKPT $SMALL --batch_size 32 --num_epochs 40
python tools/train_consistency_evaluation_model.py --name consistency_eval_model \
  --dataset_name synthetic_mul --data_root $DATA --checkpoints_dir $CKPT $SMALL \
  --batch_size 32 --num_epochs 40

echo "=== stage 3: evaluation - f32 ddpm vs ddim, bf16 ddim ==="
cd $ROOT
for S in ddpm ddim; do
  echo "--- f32 sampler: $S ---"
  python /root/repo/tools/evaluation.py \
    --opt_path $CKPT/synthetic_mul/eq_interaction/opt.txt \
    --eval_model_dir $CKPT/synthetic_mul/eval_model/model \
    --consistency_model_dir $CKPT/synthetic_mul/consistency_eval_model/model \
    --sampler $S --gen_T 91 --replication_times 3 --gen_batch 128 --file_id _$S
done
echo "--- bf16 ddim ---"
python /root/repo/tools/evaluation.py \
  --opt_path $CKPT/synthetic_mul/eq_interaction_bf16/opt.txt \
  --eval_model_dir $CKPT/synthetic_mul/eval_model/model \
  --consistency_model_dir $CKPT/synthetic_mul/consistency_eval_model/model \
  --sampler ddim --gen_T 91 --replication_times 3 --gen_batch 128 --file_id _bf16_ddim
echo "=== done ==="
for F in $ROOT/result/eq_interaction/latest/summary_ddpm.json \
         $ROOT/result/eq_interaction/latest/summary_ddim.json \
         $ROOT/result/eq_interaction_bf16/latest/summary_bf16_ddim.json; do
  echo "--- $F ---"; cat $F; echo
done
