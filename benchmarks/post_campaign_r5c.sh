#!/bin/bash
# Round-5 batch 4: in-distribution controls for the ReBAL hidden-state
# ablation. The 'zero' ablation removes BOTH task adaptation and generic
# state tracking (velocity estimation etc.); running the same ablations
# on nominal-dynamics and in-distribution snapshots measures the generic
# component, so the OOD recurrent gap can be read as (task adaptation +
# generic tracking) vs (generic tracking alone).
cd /root/repo

while ! grep -q "R5 BATCH3 COMPLETE" data/post_campaign_r5b.log 2>/dev/null; do
  sleep 30
done
echo "batch 3 complete — batch 4 (rebal ablation controls)"

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

# nominal cheetah (no task perturbation): pure generic-memory component
ev rebal_abl_nom_s0 4000 python benchmarks/meta_test.py \
  data/rebal/hc_r3 --tag hc_nominal_rebal_s0 --seeds 0,1,2,3,4,5
ev rebal_abl_nom_s1 4000 python benchmarks/meta_test.py \
  data/rebal/hc_r3_s1 --tag hc_nominal_rebal_s1 --seeds 0,1,2,3,4,5
# in-distribution cripple control (train legs) for an OOD-ablated snapshot
ev rebal_abl_ant_train 4000 python benchmarks/meta_test.py \
  data/rebal/ant_cripple_r4_s1 --eval_set 0,1,2 --tag ant_train_rebal_s1 \
  --seeds 0,1,2,3,4,5
# in-distribution cheetah-cripple control for the strongest OOD ablation
ev rebal_abl_hc_train 4000 python benchmarks/meta_test.py \
  data/rebal/cheetah_holdout_r4_s0 --eval_set 1,2,3,5 \
  --tag cheetah_train_rebal_s0 --seeds 0,1,2,3,4,5

echo "=== R5 BATCH4 COMPLETE ==="
