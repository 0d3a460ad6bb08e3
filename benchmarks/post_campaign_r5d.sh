#!/bin/bash
# Round-5 batch 5: second training seeds for the four new leave-one-out
# cheetah holdouts (actuators 1,2,3,5) + their holdout evaluations.
# Doubles every LOO cell to >=2 snapshots (actuator 4 already has two)
# and tests whether the act-3 negative gap replicates across training
# seeds or was snapshot-specific.
cd /root/repo

while ! grep -q "R5 BATCH4 COMPLETE" data/post_campaign_r5c.log 2>/dev/null; do
  sleep 30
done
echo "batch 4 complete — batch 5 (LOO second seeds)"

STALL_SECS=600
MAX_WALL=4500
ATTEMPTS=3

newest_mtime() {
  find "$1" -type f -printf '%T@\n' 2>/dev/null | sort -n | tail -1 | cut -d. -f1
}

run() {
  name=$1; dir=$2; shift 2
  if grep -q "Training finished" "$dir/log.txt" 2>/dev/null; then
    echo "=== $name already finished — skipping ==="
    return
  fi
  for att in $(seq 1 $ATTEMPTS); do
    extra=""
    if [ "$att" -gt 1 ] && [ -s "$dir/progress.csv" ]; then extra="--resume"; fi
    echo "=== $name attempt $att: $* $extra ==="
    start=$(date +%s)
    PYTHONFAULTHANDLER=1 "$@" $extra &
    pid=$!
    while kill -0 $pid 2>/dev/null; do
      sleep 30
      now=$(date +%s)
      mt=$(newest_mtime "$dir"); mt=${mt:-$start}
      if [ $((now - mt)) -gt $STALL_SECS ] || [ $((now - start)) -gt $MAX_WALL ]; then
        echo "=== $name attempt $att STALLED — killing $pid ==="
        kill -ABRT $pid 2>/dev/null; sleep 5; kill -9 $pid 2>/dev/null
        wait $pid 2>/dev/null
        sleep 10
        break
      fi
    done
    wait $pid 2>/dev/null
    rc=$?
    echo "=== $name attempt $att done rc=$rc in $(( $(date +%s) - start ))s ==="
    if grep -q "Training finished" "$dir/log.txt" 2>/dev/null; then break; fi
  done
}

ev() {
  name=$1; secs=$2; shift 2
  for att in 1 2; do
    echo "=== eval $name attempt $att: $* ==="
    start=$(date +%s)
    timeout "$secs" "$@"
    rc=$?
    echo "=== eval $name attempt $att rc=$rc in $(( $(date +%s) - start ))s ==="
    [ $rc -eq 0 ] && break
    sleep 15
  done
}

run grbal_loo1_s1 data/grbal/cheetah_loo1_r5_s1 \
  python run_scripts/run_grbal.py --task cripple --cripple_set 2,3,4,5 \
  --exp_name cheetah_loo1_r5_s1 --seed 1
run grbal_loo2_s1 data/grbal/cheetah_loo2_r5_s1 \
  python run_scripts/run_grbal.py --task cripple --cripple_set 1,3,4,5 \
  --exp_name cheetah_loo2_r5_s1 --seed 1
run grbal_loo3_s1 data/grbal/cheetah_loo3_r5_s1 \
  python run_scripts/run_grbal.py --task cripple --cripple_set 1,2,4,5 \
  --exp_name cheetah_loo3_r5_s1 --seed 1
run grbal_loo5_s1 data/grbal/cheetah_loo5_r5_s1 \
  python run_scripts/run_grbal.py --task cripple --cripple_set 1,2,3,4 \
  --exp_name cheetah_loo5_r5_s1 --seed 1

for k in 1 2 3 5; do
  ev loo${k}_s1_eval 3000 python benchmarks/meta_test.py \
    data/grbal/cheetah_loo${k}_r5_s1 --eval_set ${k} \
    --tag cheetah_act${k}_grbal_loo_s1 --seeds 0,1,2,3,4,5
done

echo "=== R5 BATCH5 COMPLETE ==="
