#!/bin/bash
# Round-5 batch 3 (chained): complete the 3-seed ReBAL hidden-state
# ablation set — the r3-trained 's0' Ant snapshot gets the same
# full/zero/frozen evaluation as the r4 seeds (replaces the r4 single-mode
# JSON under the same tag, so nothing double-counts).
cd /root/repo

while ! grep -q "R5 POST-CAMPAIGN COMPLETE" data/post_campaign_r5.log 2>/dev/null; do
  sleep 60
done
echo "post-campaign complete — batch 3"

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

ev rebal_abl_ant_s0 4000 python benchmarks/meta_test.py \
  data/rebal/ant_cripple_r3 --eval_set 3 --tag ant_leg3_rebal_s0 \
  --seeds 0,1,2,3,4,5

echo "=== R5 BATCH3 COMPLETE ==="
