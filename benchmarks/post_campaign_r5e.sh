#!/bin/bash
# Round-5 batch 6: extra eval seeds (6-11) for the four ReBAL ablation
# snapshots, doubling every ablation mode to n=60 (the _ext files pool
# with the base tags in benchmarks/summarize_meta_test.py, protocol
# identity asserted).
cd /root/repo

while ! grep -q "R5 BATCH5 COMPLETE" data/post_campaign_r5d.log 2>/dev/null; do
  sleep 30
done
echo "batch 5 complete — batch 6 (rebal ablation seed extensions)"

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

ev rebal_ext_ant_s0 4000 python benchmarks/meta_test.py \
  data/rebal/ant_cripple_r3 --eval_set 3 --tag ant_leg3_rebal_s0_ext \
  --seeds 6,7,8,9,10,11
ev rebal_ext_ant_s1 4000 python benchmarks/meta_test.py \
  data/rebal/ant_cripple_r4_s1 --eval_set 3 --tag ant_leg3_rebal_s1_ext \
  --seeds 6,7,8,9,10,11
ev rebal_ext_ant_s2 4000 python benchmarks/meta_test.py \
  data/rebal/ant_cripple_r4_s2 --eval_set 3 --tag ant_leg3_rebal_s2_ext \
  --seeds 6,7,8,9,10,11
ev rebal_ext_hc_s0 4000 python benchmarks/meta_test.py \
  data/rebal/cheetah_holdout_r4_s0 --eval_set 4 \
  --tag cheetah_act4_rebal_s0_ext --seeds 6,7,8,9,10,11

echo "=== R5 BATCH6 COMPLETE ==="
