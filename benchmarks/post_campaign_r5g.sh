#!/bin/bash
# Round-5 batch 8: run batch 7's plan for real. The previous session
# committed post_campaign_r5f.sh but its results never landed (the
# session ended first, and the sandbox's data/ snapshots do not survive
# between sessions). This script retrains the three Ant leg leave-one-out
# GrBAL snapshots and meta-tests each on its own held-out leg — the
# cheetah LOO protocol on the second headline env — then extends the new
# snapshots to n=60 with disjoint eval seeds 6-11.
#
# Sequential: ONE TPU client at a time (axon chip-grant protocol).
cd /root/repo
mkdir -p results data

STALL_SECS=420
MAX_WALL=2400
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

for k in 0 1 2; do
  set1=$(python -c "print(','.join(str(i) for i in range(4) if i != $k))")
  run grbal_ant_loo${k} data/grbal/ant_loo${k}_r5_s0 \
    python run_scripts/run_grbal.py --env AntEnv --task cripple \
    --cripple_set "$set1" --exp_name ant_loo${k}_r5_s0 --seed 0
  ev ant_loo${k}_eval 3000 python benchmarks/meta_test.py \
    data/grbal/ant_loo${k}_r5_s0 --eval_set ${k} \
    --tag ant_leg${k}_grbal_loo --seeds 0,1,2,3,4,5
done

echo "=== R5 BATCH8 MAIN COMPLETE ==="

# n=30 -> n=60 on the new snapshots (disjoint eval seeds; pooled as _ext
# by benchmarks/summarize_meta_test.py)
for k in 0 1 2; do
  ev ant_loo${k}_ext 3000 python benchmarks/meta_test.py \
    data/grbal/ant_loo${k}_r5_s0 --eval_set ${k} \
    --tag ant_leg${k}_grbal_loo_ext --seeds 6,7,8,9,10,11
done

echo "=== R5 BATCH8 COMPLETE ==="
