#!/bin/bash
# Round-5 endgame queue: fires the quality-evidence chain the moment the
# in-flight trainers finish. Launched mid-round with the three trainers
# already running (eq_interaction -> 60 epochs on the TPU, eval_model on
# CPU, consistency_eval_model on the TPU alongside the generator).
#
#   1. strong_op eval  — five-metric DDPM + DDIM at the 60-epoch operating
#                        point (VERDICT r4 #1/strong_op): does generated
#                        Accuracy clear chance?
#   2. cfg_run         — graft + 10-epoch finetune (drop 0.2) + w-sweep
#                        (VERDICT r4 #1/cfg_run); GEN_BATCH=64 because
#                        w!=1 doubles the per-step program.
#   3. reduced fullsize ladder — distill 50->25 from the 1-epoch full-size
#                        fullstep_float32 teacher: validates stage
#                        mechanics/memory/timing at 8L/d512 (the actual
#                        open question in VERDICT #5); quality eval of a
#                        1-epoch teacher would be meaningless and is
#                        skipped honestly.
#
# Usage: WAIT_PIDS="5795 5797 6720" bash results/round5_final_queue.sh
set -e
cd /root/repo
ROOT=/tmp/eqrun3
CKPT=$ROOT/ckpt

for P in ${WAIT_PIDS:-}; do
  while kill -0 "$P" 2>/dev/null; do sleep 20; done
  echo "pid $P finished at $(date)"
done

# sanity: all three artifacts must exist before burning eval time
for D in eq_interaction/model/latest eval_model/model consistency_eval_model/model; do
  [ -e "$CKPT/synthetic_mul/$D" ] || { echo "MISSING $D — aborting"; exit 1; }
done

# The donor may have been stopped short of 60 if the round clock demanded it
# (save_latest=1000 keeps `latest` ≤ ~6 epochs stale); label evals and set
# the finetune target from the epoch actually reached.
DONOR_E=$(python - <<'EOF'
import json
line = open('/tmp/eqrun3/ckpt/synthetic_mul/eq_interaction/metrics.jsonl').readlines()[-1]
print(json.loads(line)['epoch'] + 1)
EOF
)
echo "donor trained to epoch $DONOR_E"

echo "=== 1. strong_op eval (f32, e$DONOR_E, ddpm+ddim) $(date) ==="
EPOCHS=$DONOR_E GEN_BATCH=128 MODELS=eq_interaction \
  bash results/strong_op/run.sh eval 2>&1 | tee /tmp/strong_op_eval.log

echo "=== 2. cfg_run (graft -> finetune +10 -> w-sweep) $(date) ==="
FT_EPOCHS=$((DONOR_E + 10)) GEN_BATCH=64 \
  bash results/cfg_run/run.sh 2>&1 | tee /tmp/cfg_run.log

echo "=== 3. reduced full-size ladder (50->25 off the 1-epoch teacher) $(date) ==="
python tools/distill.py --opt_path $CKPT/synthetic_mul/fullstep_float32/opt.txt \
  --stages 25 --epochs_per_stage 2 --times 2 --lr 5e-5 --log_every 10 \
  2>&1 | tee /tmp/fullsize_distill.log

echo "=== queue done $(date) ==="
