#!/bin/bash
# Classifier-free-guidance quality evidence (VERDICT r3 next #3):
# train a --cond_drop_prob 0.1 twin of the eqrun3 generator (identical
# data/size/schedule), then sweep --guidance_scale w over the five-metric
# eval. The reference's only guidance hook is the classifier cond_fn
# (codes/models/gaussian_diffusion.py:567-604); CFG is a beat-the-reference
# lever, so the claim needs a measured w-sweep, not just mechanics tests.
#
# w order: informative points first (1 = unguided baseline, then the
# standard 2-3 band, then the extremes) so a truncated run still tells the
# story. Each w != 1 eval costs two denoiser calls per step.
#
# Prereq: the eqrun3 world at /tmp/eqrun3 (results/eqrun3_allfive/run.sh).
set -e
cd /root/repo
ROOT=/tmp/eqrun3
DATA=$ROOT/data
CKPT=$ROOT/ckpt
SMALL="--num_layers 4 --latent_dim 128 --ff_size 256 --num_heads 8 \
 --num_text_layers 2 --text_latent_dim 64 --text_ff_size 128 --text_num_heads 4"

if [ ! -d "$CKPT/synthetic_mul/eq_interaction_cfg/model/latest" ] || [ "$1" == "--train" ]; then
  echo "=== stage 1: train CFG twin (cond_drop_prob 0.1) ==="
  python tools/train.py --name eq_interaction_cfg --dataset_name synthetic_mul \
    --data_root $DATA --checkpoints_dir $CKPT \
    --label_path $DATA/pseudo_labels.json $SMALL --cond_drop_prob 0.1 \
    --batch_size 32 --times 4 --num_epochs 30 --log_every 10 --save_latest 1000 \
    --eval_every_e 100 ${RESUME:+--is_continue}
fi

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
    --gen_batch 128 --file_id _cfg_w$TAG
  cat $ROOT/result/eq_interaction_cfg/latest/summary_cfg_w$TAG.json; echo
done
echo "=== done ==="
