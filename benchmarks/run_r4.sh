#!/bin/bash
# Round-4 TPU campaign: the meta-test protocol on held-out dynamics
# (VERDICT round-3 next-steps #1/#4), second seeds for every single-seed
# BASELINE.md row (#5), and a corrected like-for-like cross-algorithm
# evaluation (the r3 GrBAL-vs-MB-MPC cripple comparison mixed 1000-step
# and 100-step returns; meta_test.py evaluates both snapshots at the same
# path length).
#
# Sequential: ONE TPU client at a time (the axon chip-grant protocol wedges
# forever if a second client claims while another holds the chip). A
# watchdog kills a training run whose exp dir stops progressing and retries
# it with --resume (full-fidelity resume as of round 4).
cd /root/repo
mkdir -p results

STALL_SECS=600
MAX_WALL=4500
ATTEMPTS=3

newest_mtime() {
  find "$1" -type f -printf '%T@\n' 2>/dev/null | sort -n | tail -1 | cut -d. -f1
}

run() {  # watchdogged training run
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
        echo "=== $name attempt $att STALLED (no progress $((now-mt))s, wall $((now-start))s) — killing $pid ==="
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

ev() {  # eval step (bounded, single attempt + one retry)
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

# ---------- phase T: training ----------
# the paper's second headline adaptive env gets its headline algorithm:
# GrBAL on Ant-cripple (train legs 0-2; leg 3 stays held out by default)
run grbal_ant_s0 data/grbal/ant_cripple_r4_s0 \
  python run_scripts/run_grbal.py --env AntEnv --task cripple \
  --exp_name ant_cripple_r4_s0 --seed 0
run grbal_ant_s1 data/grbal/ant_cripple_r4_s1 \
  python run_scripts/run_grbal.py --env AntEnv --task cripple \
  --exp_name ant_cripple_r4_s1 --seed 1
# the non-adaptive baseline on the SAME train distribution
run mbmpc_ant_s0 data/mb_mpc/ant_cripple_r4_s0 \
  python run_scripts/run_mb_mpc.py --env AntEnv --task cripple \
  --exp_name ant_cripple_r4_s0 --seed 0
run mbmpc_ant_s1 data/mb_mpc/ant_cripple_r4_s1 \
  python run_scripts/run_mb_mpc.py --env AntEnv --task cripple \
  --exp_name ant_cripple_r4_s1 --seed 1

# cheetah analog of the leg-3 split: actuator 4 held out of training
run grbal_hc_hold_s0 data/grbal/cheetah_holdout_r4_s0 \
  python run_scripts/run_grbal.py --task cripple --cripple_set 1,2,3,5 \
  --exp_name cheetah_holdout_r4_s0 --seed 0
run grbal_hc_hold_s1 data/grbal/cheetah_holdout_r4_s1 \
  python run_scripts/run_grbal.py --task cripple --cripple_set 1,2,3,5 \
  --exp_name cheetah_holdout_r4_s1 --seed 1
run mbmpc_hc_hold_s0 data/mb_mpc/cheetah_holdout_r4_s0 \
  python run_scripts/run_mb_mpc.py --task cripple --cripple_set 1,2,3,5 \
  --exp_name cheetah_holdout_r4_s0 --seed 0

# second seeds for the four single-seed BASELINE.md rows (r3 configs)
run grbal_hfield_s1 data/grbal/hfield_r4_s1 \
  python run_scripts/run_grbal.py --env HalfCheetahHFieldEnv --task hfield \
  --exp_name hfield_r4_s1 --seed 1
run grbal_arm_s1 data/grbal/arm_r4_s1 \
  python run_scripts/run_grbal.py --env Arm7DofEnv --n_itr 30 \
  --exp_name arm_r4_s1 --seed 1
run mbmpc_blocks_s1 data/mb_mpc/blocks_r4_s1 \
  python run_scripts/run_mb_mpc.py --env HalfCheetahBlocksEnv --task damping \
  --n_itr 30 --exp_name blocks_r4_s1 --seed 1
run rebal_ant_s1 data/rebal/ant_cripple_r4_s1 \
  python run_scripts/run_rebal.py --env AntEnv --task cripple --n_itr 30 \
  --exp_name ant_cripple_r4_s1 --seed 1

echo "=== TRAINING PHASE COMPLETE ==="

# ---------- phase E: meta-test evaluation ----------
# Ant leg-3 holdout: adapted vs pre-update vs MB-MPC, same path length
ev ant_leg3_grbal_s0 4500 python benchmarks/meta_test.py \
  data/grbal/ant_cripple_r4_s0 --eval_set 3 --tag ant_leg3_grbal_s0 \
  --inner_lrs 0.01,0.1 --windows 8,32
ev ant_leg3_grbal_s1 3000 python benchmarks/meta_test.py \
  data/grbal/ant_cripple_r4_s1 --eval_set 3 --tag ant_leg3_grbal_s1
ev ant_leg3_mbmpc_s0 3000 python benchmarks/meta_test.py \
  data/mb_mpc/ant_cripple_r4_s0 --eval_set 3 --tag ant_leg3_mbmpc_s0
ev ant_leg3_mbmpc_s1 3000 python benchmarks/meta_test.py \
  data/mb_mpc/ant_cripple_r4_s1 --eval_set 3 --tag ant_leg3_mbmpc_s1
# in-distribution control (train legs) for the same snapshots
ev ant_train_grbal_s0 3000 python benchmarks/meta_test.py \
  data/grbal/ant_cripple_r4_s0 --eval_set 0,1,2 --tag ant_train_grbal_s0
ev ant_train_mbmpc_s0 3000 python benchmarks/meta_test.py \
  data/mb_mpc/ant_cripple_r4_s0 --eval_set 0,1,2 --tag ant_train_mbmpc_s0

# cheetah held-out actuator 4
ev hc_act4_grbal_s0 4500 python benchmarks/meta_test.py \
  data/grbal/cheetah_holdout_r4_s0 --eval_set 4 --tag cheetah_act4_grbal_s0 \
  --inner_lrs 0.01,0.1 --windows 8,32
ev hc_act4_grbal_s1 3000 python benchmarks/meta_test.py \
  data/grbal/cheetah_holdout_r4_s1 --eval_set 4 --tag cheetah_act4_grbal_s1
ev hc_act4_mbmpc_s0 3000 python benchmarks/meta_test.py \
  data/mb_mpc/cheetah_holdout_r4_s0 --eval_set 4 --tag cheetah_act4_mbmpc_s0

# corrected cross-algorithm comparison at ONE path length (fixes the r3
# 1000-step-vs-100-step mismatch): evaluate the r3 cheetah-cripple
# snapshots of both algorithms under the identical protocol
ev hc_indist_grbal_r3 3000 python benchmarks/meta_test.py \
  data/grbal/cripple_r3 --eval_set 1,2,3,4,5 --tag cheetah_indist_grbal_r3
ev hc_indist_grbal_r3s1 3000 python benchmarks/meta_test.py \
  data/grbal/cripple_r3_s1 --eval_set 1,2,3,4,5 \
  --tag cheetah_indist_grbal_r3s1
ev hc_indist_mbmpc_r3 3000 python benchmarks/meta_test.py \
  data/mb_mpc/cripple_r3 --eval_set 1,2,3,4,5 --tag cheetah_indist_mbmpc_r3
ev hc_indist_mbmpc_r3s1 3000 python benchmarks/meta_test.py \
  data/mb_mpc/cripple_r3_s1 --eval_set 1,2,3,4,5 \
  --tag cheetah_indist_mbmpc_r3s1

echo "=== R4 CAMPAIGN COMPLETE ==="
