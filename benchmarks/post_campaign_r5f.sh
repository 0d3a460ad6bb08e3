#!/bin/bash
# Round-5 batch 7: Ant leg leave-one-out — the cheetah LOO protocol on
# the second headline env. Three GrBAL snapshots, each trained with a
# different leg held out of the cripple distribution (the reference only
# ever holds out leg 3), meta-tested on their own holdout. Tail: extra
# eval seeds (6-11) for the cheetah LOO second-seed snapshots.
cd /root/repo

while ! grep -q "R5 BATCH6 COMPLETE" data/post_campaign_r5e.log 2>/dev/null; do
  sleep 30
done
echo "batch 6 complete — batch 7 (ant leg LOO)"

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

run grbal_ant_loo0 data/grbal/ant_loo0_r5_s0 \
  python run_scripts/run_grbal.py --env AntEnv --task cripple \
  --cripple_set 1,2,3 --exp_name ant_loo0_r5_s0 --seed 0
run grbal_ant_loo1 data/grbal/ant_loo1_r5_s0 \
  python run_scripts/run_grbal.py --env AntEnv --task cripple \
  --cripple_set 0,2,3 --exp_name ant_loo1_r5_s0 --seed 0
run grbal_ant_loo2 data/grbal/ant_loo2_r5_s0 \
  python run_scripts/run_grbal.py --env AntEnv --task cripple \
  --cripple_set 0,1,3 --exp_name ant_loo2_r5_s0 --seed 0

for k in 0 1 2; do
  ev ant_loo${k}_eval 3000 python benchmarks/meta_test.py \
    data/grbal/ant_loo${k}_r5_s0 --eval_set ${k} \
    --tag ant_leg${k}_grbal_loo --seeds 0,1,2,3,4,5
done

echo "=== R5 BATCH7 MAIN COMPLETE ==="

for k in 1 2 3 5; do
  ev loo${k}_s1_ext 3000 python benchmarks/meta_test.py \
    data/grbal/cheetah_loo${k}_r5_s1 --eval_set ${k} \
    --tag cheetah_act${k}_grbal_loo_s1_ext --seeds 6,7,8,9,10,11
done

echo "=== R5 BATCH7 COMPLETE ==="
