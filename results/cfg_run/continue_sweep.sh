#!/bin/bash
# Resume the round-5 CFG w-sweep where the previous session's clock stopped
# it (w=1 done, "clock: stopping sweep before w=2" in /tmp/cfg_sweep.log).
# Identical settings to round5_final_queue.sh stage 3 so the rows are
# within-table comparable: same evaluator pair, DDIM-50, 3 replications,
# --gen_batch 64. Informative order: standard band first, extremes last, so
# a truncated run still tells the story.
set -u
cd /tmp/eqrun3
ROOT=/tmp/eqrun3
CKPT=$ROOT/ckpt
EVAL="--eval_model_dir $CKPT/synthetic_mul/eval_model/model \
 --consistency_model_dir $CKPT/synthetic_mul/consistency_eval_model/model \
 --gen_T 91 --replication_times 3"
HARD_END=${HARD_END:-$(date -u -d 'today 10:20' +%s)}

for W in 2 3 1.5 5 7.5; do
  [ $(date +%s) -lt $((HARD_END - 600)) ] || { echo "clock: stopping sweep before w=$W"; break; }
  TAG=$(echo $W | tr . p)
  [ -f "$ROOT/result/eq_interaction_cfg/latest/summary_cfg_w$TAG.json" ] && \
    { echo "w=$W already done"; continue; }
  echo "=== cfg eval w=$W $(date -u) ==="
  python /root/repo/tools/evaluation.py \
    --opt_path $CKPT/synthetic_mul/eq_interaction_cfg/opt.txt \
    --sampler ddim --guidance_scale $W $EVAL --gen_batch 64 \
    --file_id _cfg_w$TAG
  cat $ROOT/result/eq_interaction_cfg/latest/summary_cfg_w$TAG.json; echo
done
echo "=== sweep segment done $(date -u) ==="
