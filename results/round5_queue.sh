#!/bin/bash
# Round-5 CPU experiment queue (VERDICT r4 next #1/#2): the 1-core host can
# run exactly one experiment at a time, so this serializes the backlog —
# wait for the in-flight rms_run (train -> five-metric eval, resume.sh
# PID $RMS_PID) to finish, then run the two experiments scripted in round 4.
#
# Launch:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
#            bash results/round5_queue.sh & echo $! > /tmp/round5_queue.pid
cd /root/repo
RMS_PID=${RMS_PID:-8323}
while kill -0 "$RMS_PID" 2>/dev/null; do sleep 60; done
echo "=== rms_run (pid $RMS_PID) finished at $(date) ==="

echo "=== cfg_run: w-sweep (VERDICT r4 #1 / r3 #3) ==="
bash results/cfg_run/run.sh >> results/cfg_run/driver_run.log 2>&1
echo "=== cfg_run exited $? at $(date) ==="

echo "=== strong_op: off-chance-accuracy operating point (r4 #1 / r3 #4) ==="
# EPOCHS/MODELS trimmed to the wall-clock left in the round (see run.sh)
EPOCHS=${EPOCHS:-45} MODELS=${MODELS:-eq_interaction} \
  bash results/strong_op/run.sh train eval \
  >> results/strong_op/driver_run.log 2>&1
echo "=== strong_op exited $? at $(date) ==="
