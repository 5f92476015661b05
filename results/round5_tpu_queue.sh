#!/bin/bash
# Round-5 TPU queue — the tunnel came back live this round (first time since
# round 2; TUNNEL.md). Serializes the TPU-gated measurement backlog, most
# degradation-sensitive first (the tunneled worker slows 6x+ for big donated
# training programs after hours of load — verify skill / NOTES.md:144-154):
#
#   bench      python bench.py (run FIRST, separately — headline numbers)
#   layout     layout_probe base-vs-lazy A/B with HLO copy-op histograms
#   fullstep   full-size (8L d=512) f32-vs-bf16 train-step timing, B=128
#              (replaces the round-3 number invalidated by worker decay)
#   world      eqrun3 equivalence world on the TPU: f32 teacher + bf16 twin
#              (30 epochs each) + both eval models (/tmp was wiped by the VM
#              restart; CPU rebuild costs ~2.7 h/model — TPU is the only way
#              the round fits). Prereq: make_synthetic_data (stage 0) done.
#   world_eval eqrun3 stage-3 five-metric evals (ddpm/ddim/bf16)
#   cfg        results/cfg_run/run.sh      (GEN_BATCH=64: >=256-row programs
#   strong     results/strong_op/run.sh     can kill the tunneled worker)
#   fullsize   results/distill_fullsize/run.sh
#
# Usage: bash results/round5_tpu_queue.sh layout fullstep world ...
set -e
cd /root/repo
ROOT=/tmp/eqrun3
DATA=$ROOT/data
CKPT=$ROOT/ckpt
SMALL="--num_layers 4 --latent_dim 128 --ff_size 256 --num_heads 8 \
 --num_text_layers 2 --text_latent_dim 64 --text_ff_size 128 --text_num_heads 4"

probe() { timeout 180 python -c "import jax; print(jax.devices())" || {
  echo "TUNNEL DEAD at stage $1 ($(date))"; exit 9; }; }

for STAGE in "$@"; do
probe "$STAGE"
echo "=== stage $STAGE start $(date) ==="
case $STAGE in
layout)
  for V in base lazy; do
    python tools/layout_probe.py --variant $V --hlo | tee /tmp/layout_$V.json
  done ;;
fullstep)
  # ~44 steps (1404 clips, B=128 pairs, times 4, 1 epoch); ms/step from the
  # log_every-5 elapsed deltas, compile excluded by dropping the first point
  for DT in float32 bfloat16; do
    rm -rf $CKPT/synthetic_mul/fullstep_$DT
    python tools/train.py --name fullstep_$DT --dataset_name synthetic_mul \
      --data_root $DATA --checkpoints_dir $CKPT \
      --label_path $DATA/pseudo_labels.json --compute_dtype $DT \
      --batch_size 128 --times 4 --num_epochs 1 --log_every 5 \
      --save_latest 100000 --eval_every_e 100
  done ;;
world)
  python tools/train.py --name eq_interaction --dataset_name synthetic_mul \
    --data_root $DATA --checkpoints_dir $CKPT \
    --label_path $DATA/pseudo_labels.json $SMALL \
    --batch_size 32 --times 4 --num_epochs 30 --log_every 10 \
    --save_latest 1000 --eval_every_e 100
  python tools/train.py --name eq_interaction_bf16 --dataset_name synthetic_mul \
    --data_root $DATA --checkpoints_dir $CKPT \
    --label_path $DATA/pseudo_labels.json $SMALL --compute_dtype bfloat16 \
    --batch_size 32 --times 4 --num_epochs 30 --log_every 10 \
    --save_latest 1000 --eval_every_e 100
  python tools/train_evaluation_model.py --name eval_model \
    --dataset_name synthetic_mul --data_root $DATA --checkpoints_dir $CKPT \
    $SMALL --batch_size 32 --num_epochs 40
  python tools/train_consistency_evaluation_model.py --name consistency_eval_model \
    --dataset_name synthetic_mul --data_root $DATA --checkpoints_dir $CKPT \
    $SMALL --batch_size 32 --num_epochs 40 ;;
world_eval)
  cd $ROOT
  for S in ddpm ddim; do
    python /root/repo/tools/evaluation.py \
      --opt_path $CKPT/synthetic_mul/eq_interaction/opt.txt \
      --eval_model_dir $CKPT/synthetic_mul/eval_model/model \
      --consistency_model_dir $CKPT/synthetic_mul/consistency_eval_model/model \
      --sampler $S --gen_T 91 --replication_times 3 --gen_batch 64 --file_id _$S
  done
  python /root/repo/tools/evaluation.py \
    --opt_path $CKPT/synthetic_mul/eq_interaction_bf16/opt.txt \
    --eval_model_dir $CKPT/synthetic_mul/eval_model/model \
    --consistency_model_dir $CKPT/synthetic_mul/consistency_eval_model/model \
    --sampler ddim --gen_T 91 --replication_times 3 --gen_batch 64 \
    --file_id _bf16_ddim
  cd /root/repo ;;
cfg)
  GEN_BATCH=64 bash results/cfg_run/run.sh ;;
strong)
  GEN_BATCH=64 EPOCHS=60 bash results/strong_op/run.sh train eval distill evald ;;
fullsize)
  bash results/distill_fullsize/run.sh ;;
*) echo "unknown stage $STAGE"; exit 1 ;;
esac
echo "=== stage $STAGE done $(date) ==="
done
