#!/bin/bash
# Round-5 endgame queue: fires the quality-evidence chain the moment the
# in-flight trainers finish, inside a hard round-clock budget.
#
# Launched mid-round with three trainers already running (eq_interaction on
# the TPU toward 60 epochs, eval_model on CPU, consistency_eval_model on the
# TPU alongside the generator). The round clock cannot fit the full 60
# epochs plus the eval chain, so:
#
#   - at DEADLINE the generator (and the CPU eval_model, whose best
#     checkpoint is already saved) are stopped — the generator save-aware:
#     wait for the next save_latest=1000 boundary so `latest` is fresh,
#     capped at +8 min;
#   - strong_op five-metric evals (DDPM + DDIM at the reached epoch) run
#     CONCURRENT with the CFG graft + 10-epoch finetune (both small
#     programs; wall-time of either is not a reported metric);
#   - then the w-sweep (informative order: 1, 2, 3, then extremes), each
#     point gated on the remaining clock;
#   - then the reduced full-size ladder: distill 50->25 off the 1-epoch
#     8L/d512 fullstep_float32 teacher — validates stage mechanics, memory
#     and timing at production scale (VERDICT #5's actual open question);
#     a quality eval of a 1-epoch teacher would be meaningless and is
#     skipped honestly.
#
# Usage: EQ_PID=... EVAL_PID=... CONS_PID=... bash results/round5_final_queue.sh
cd /root/repo
ROOT=/tmp/eqrun3
CKPT=$ROOT/ckpt
METRICS=$CKPT/synthetic_mul/eq_interaction/metrics.jsonl
DEADLINE=${DEADLINE:-$(date -u -d 'today 04:00' +%s)}
HARD_END=${HARD_END:-$(date -u -d 'today 05:10' +%s)}

last_it() { tail -1 "$METRICS" 2>/dev/null | python -c 'import json,sys
try: print(json.load(sys.stdin)["it"])
except Exception: print(0)'; }

# --- 1. wait / deadline-stop the trainers --------------------------------
while :; do
  EQ_ALIVE=;   kill -0 "${EQ_PID:-0}"   2>/dev/null && EQ_ALIVE=1
  EV_ALIVE=;   kill -0 "${EVAL_PID:-0}" 2>/dev/null && EV_ALIVE=1
  CO_ALIVE=;   kill -0 "${CONS_PID:-0}" 2>/dev/null && CO_ALIVE=1
  [ -z "$EQ_ALIVE$EV_ALIVE$CO_ALIVE" ] && break
  NOW=$(date +%s)
  if [ "$NOW" -ge "$DEADLINE" ]; then
    if [ -n "$EQ_ALIVE" ]; then
      IT0=$(last_it); TARGET=$(( (IT0 / 1000 + 1) * 1000 ))
      echo "deadline: waiting for generator save at it $TARGET (now $IT0)"
      W0=$NOW
      while [ "$(last_it)" -lt "$TARGET" ] && [ $(($(date +%s) - W0)) -lt 480 ]; do
        sleep 15
      done
      sleep 25  # let the orbax save finish
      echo "stopping generator at it $(last_it) ($(date -u))"
      kill "$EQ_PID" 2>/dev/null
    fi
    [ -n "$EV_ALIVE" ] && { echo "stopping eval_model (best already saved)"; kill "$EVAL_PID" 2>/dev/null; }
    [ -n "$CO_ALIVE" ] && { echo "stopping consistency model (best already saved)"; kill "$CONS_PID" 2>/dev/null; }
    sleep 10; break
  fi
  sleep 20
done
sleep 5

for D in eq_interaction/model/latest eval_model/model consistency_eval_model/model; do
  [ -e "$CKPT/synthetic_mul/$D" ] || { echo "MISSING $D — aborting"; exit 1; }
done

# Label from the RESTORABLE state: `latest` is written every 1000 its, so
# when the trainer was deadline-killed the checkpoint trails the last
# metrics line by up to 999 its. its/epoch = 1404 clips x times 4 / B=32.
DONOR_E=$(python - <<'EOF'
import json
line = open('/tmp/eqrun3/ckpt/synthetic_mul/eq_interaction/metrics.jsonl').readlines()[-1]
it = json.loads(line)['it']
per_epoch = 1404 * 4 / 32
if it >= 60 * per_epoch - 20:          # ran to natural completion
    print(60)
else:
    print(int(it // 1000 * 1000 / per_epoch) + 1)
EOF
)
echo "donor checkpoint at ~epoch $DONOR_E"

EVAL="--eval_model_dir $CKPT/synthetic_mul/eval_model/model \
 --consistency_model_dir $CKPT/synthetic_mul/consistency_eval_model/model \
 --gen_T 91 --replication_times 3"

# --- 2. strong_op evals || CFG graft+finetune ----------------------------
(
  cd $ROOT
  for S in ddpm ddim; do
    echo "=== strong_op eval $S (e$DONOR_E) $(date -u) ==="
    python /root/repo/tools/evaluation.py \
      --opt_path $CKPT/synthetic_mul/eq_interaction/opt.txt \
      --sampler $S $EVAL --gen_batch 128 --file_id _e${DONOR_E}_$S
    cat $ROOT/result/eq_interaction/latest/summary_e${DONOR_E}_$S.json; echo
  done
) > /tmp/strong_op_eval.log 2>&1 &
A=$!

(
  echo "=== cfg graft $(date -u) ==="
  python tools/add_cfg_branch.py \
    --opt_path $CKPT/synthetic_mul/eq_interaction/opt.txt \
    --name eq_interaction_cfg --cond_drop_prob 0.2
  echo "=== cfg finetune +10 epochs (drop 0.2) $(date -u) ==="
  SMALL="--num_layers 4 --latent_dim 128 --ff_size 256 --num_heads 8 \
   --num_text_layers 2 --text_latent_dim 64 --text_ff_size 128 --text_num_heads 4"
  python tools/train.py --name eq_interaction_cfg --dataset_name synthetic_mul \
    --data_root $ROOT/data --checkpoints_dir $CKPT \
    --label_path $ROOT/data/pseudo_labels.json $SMALL --cond_drop_prob 0.2 \
    --batch_size 32 --times 4 --num_epochs $((DONOR_E + 10)) --log_every 10 \
    --save_latest 1000 --eval_every_e 100 --is_continue
) > /tmp/cfg_finetune.log 2>&1 &
B=$!

wait $A; echo "strong_op evals done $(date -u)"
wait $B; echo "cfg finetune done $(date -u)"

# --- 3. w-sweep, clock-gated ---------------------------------------------
(
  cd $ROOT
  for W in 1 2 3 1.5 5 7.5; do
    [ $(date +%s) -lt $((HARD_END - 360)) ] || { echo "clock: stopping sweep before w=$W"; break; }
    TAG=$(echo $W | tr . p)
    echo "=== cfg eval w=$W $(date -u) ==="
    python /root/repo/tools/evaluation.py \
      --opt_path $CKPT/synthetic_mul/eq_interaction_cfg/opt.txt \
      --sampler ddim --guidance_scale $W $EVAL --gen_batch 64 \
      --file_id _cfg_w$TAG
    cat $ROOT/result/eq_interaction_cfg/latest/summary_cfg_w$TAG.json; echo
  done
) 2>&1 | tee /tmp/cfg_sweep.log

# --- 4. reduced full-size ladder, clock-gated ----------------------------
# (skipped when the mid-round opportunistic run already produced it: the
# ladder was launched concurrently with the tail of the donor training at
# batch_size 32 — B=128 full-size distill approaches the worker-kill zone)
if [ -d "$CKPT/synthetic_mul/fullstep_float32_distill25/model" ]; then
  echo "full-size ladder already ran (fullstep_float32_distill25 exists)"
elif [ $(date +%s) -lt $((HARD_END - 900)) ]; then
  echo "=== reduced full-size ladder: distill 50->25 off fullstep_float32 $(date -u) ==="
  python tools/distill.py --opt_path $CKPT/synthetic_mul/fullstep_float32/opt.txt \
    --stages 25 --epochs_per_stage 2 --times 2 --batch_size 32 --lr 5e-5 \
    --log_every 10 2>&1 | tee /tmp/fullsize_distill.log
else
  echo "clock: skipping full-size ladder"
fi
echo "=== queue done $(date -u) ==="
