#!/bin/bash
# Post-campaign TPU batch (serial, single client): third Ant-cripple seeds
# (both adaptive algorithms showed high cross-seed variance: GrBAL
# 187.6/52.7, ReBAL 178.1/22.1 — a third seed stabilizes the error bars),
# the leg-3 meta-test for the extra GrBAL seed, and the round-4 bench
# measurement (512-env saturating shape). Waits for run_r4.sh to release
# the chip.
cd /root/repo
while ! grep -q "R4 CAMPAIGN COMPLETE" data/campaign_r4.log 2>/dev/null; do
  sleep 60
done
echo "=== campaign complete; starting post-campaign batch ==="
sleep 20   # let the last python process release the chip grant

run_simple() {
  name=$1; secs=$2; shift 2
  echo "=== $name: $* ==="
  start=$(date +%s)
  timeout "$secs" "$@"
  echo "=== $name rc=$? in $(( $(date +%s) - start ))s ==="
  sleep 10
}

run_simple grbal_ant_s2 4500 python run_scripts/run_grbal.py --env AntEnv \
  --task cripple --exp_name ant_cripple_r4_s2 --seed 2
run_simple rebal_ant_s2 2400 python run_scripts/run_rebal.py --env AntEnv \
  --task cripple --n_itr 30 --exp_name ant_cripple_r4_s2 --seed 2
run_simple mbmpc_ant_s2 2400 python run_scripts/run_mb_mpc.py --env AntEnv \
  --task cripple --exp_name ant_cripple_r4_s2 --seed 2
run_simple ant_leg3_grbal_s2 3000 python benchmarks/meta_test.py \
  data/grbal/ant_cripple_r4_s2 --eval_set 3 --tag ant_leg3_grbal_s2
run_simple ant_leg3_mbmpc_s2 3000 python benchmarks/meta_test.py \
  data/mb_mpc/ant_cripple_r4_s2 --eval_set 3 --tag ant_leg3_mbmpc_s2
run_simple bench 3600 python bench.py
echo "=== POST-CAMPAIGN R4 COMPLETE ==="
