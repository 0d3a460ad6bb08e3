#!/bin/bash
# Precision pass on the round-4 meta-test: re-run the four holdout
# evaluations with SIX eval seeds (n=30 rollouts per mode; the first pass
# used three) to tighten the pooled OOD adaptation-gap SEM. Overwrites the
# same results/meta_test_<tag>.json files (supersets of the first pass —
# seeds 0-2 are re-run identically; rollout programs are compile-cached).
# Waits for post_campaign_r4.sh to release the chip.
cd /root/repo
while ! grep -q "POST-CAMPAIGN R4 COMPLETE" data/post_campaign_r4.log 2>/dev/null; do
  sleep 60
done
echo "=== post-campaign complete; starting 6-seed eval pass ==="
sleep 20

# preserve the pass-1 sensitivity sweeps before the overwrite
cp results/meta_test_ant_leg3_grbal_s0.json \
   results/meta_test_ant_leg3_grbal_s0_sweeps.json 2>/dev/null
cp results/meta_test_cheetah_act4_grbal_s0.json \
   results/meta_test_cheetah_act4_grbal_s0_sweeps.json 2>/dev/null

ev() {
  name=$1; shift
  echo "=== $name: $* ==="
  start=$(date +%s)
  timeout 3600 "$@"
  echo "=== $name rc=$? in $(( $(date +%s) - start ))s ==="
  sleep 10
}

S=0,1,2,3,4,5
ev ant_leg3_grbal_s0 python benchmarks/meta_test.py \
  data/grbal/ant_cripple_r4_s0 --eval_set 3 --tag ant_leg3_grbal_s0 --seeds $S
ev ant_leg3_grbal_s1 python benchmarks/meta_test.py \
  data/grbal/ant_cripple_r4_s1 --eval_set 3 --tag ant_leg3_grbal_s1 --seeds $S
ev hc_act4_grbal_s0 python benchmarks/meta_test.py \
  data/grbal/cheetah_holdout_r4_s0 --eval_set 4 --tag cheetah_act4_grbal_s0 \
  --seeds $S
ev hc_act4_grbal_s1 python benchmarks/meta_test.py \
  data/grbal/cheetah_holdout_r4_s1 --eval_set 4 --tag cheetah_act4_grbal_s1 \
  --seeds $S
ev ant_leg3_mbmpc_s0 python benchmarks/meta_test.py \
  data/mb_mpc/ant_cripple_r4_s0 --eval_set 3 --tag ant_leg3_mbmpc_s0 --seeds $S
ev ant_leg3_mbmpc_s1 python benchmarks/meta_test.py \
  data/mb_mpc/ant_cripple_r4_s1 --eval_set 3 --tag ant_leg3_mbmpc_s1 --seeds $S
ev hc_act4_mbmpc_s0 python benchmarks/meta_test.py \
  data/mb_mpc/cheetah_holdout_r4_s0 --eval_set 4 --tag cheetah_act4_mbmpc_s0 \
  --seeds $S
ev ant_train_grbal_s0 python benchmarks/meta_test.py \
  data/grbal/ant_cripple_r4_s0 --eval_set 0,1,2 --tag ant_train_grbal_s0 \
  --seeds $S
echo "=== R4B EVALS COMPLETE ==="
