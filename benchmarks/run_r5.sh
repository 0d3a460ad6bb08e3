#!/bin/bash
# Round-5 TPU campaign (VERDICT round-4 next-steps #1/#2/#4/#5):
#   T1  leave-one-out cheetah holdouts: 4 new GrBAL snapshots, each with a
#       different actuator held out (holdout-4 already exists from r4) —
#       kills the "actuator 4 is easy" confound and quintuples the OOD set
#   T2  continuous-OOD families: GrBAL on hfield {gentle,hill} (eval
#       steep/basin) and on blocks damping U(0,10) (eval U(12,20)),
#       + an MB-MPC hfield control on the same train distribution
#   E   meta-test evaluations: LOO holdouts, terrain/damping holdouts with
#       in-distribution controls, ReBAL hidden-state ablations on the r4
#       recurrent snapshots, and extra eval seeds (6-11) on the five r4
#       holdout snapshots (pooled by benchmarks/summarize_meta_test.py)
#
# Sequential: ONE TPU client at a time (the axon chip-grant protocol wedges
# forever if a second client claims while another holds the chip). A
# watchdog kills a training run whose exp dir stops progressing and retries
# it with --resume (full-fidelity resume; the r5 resume guard asserts the
# task distribution matches).
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

# ---------- phase T1: leave-one-out cheetah trainings ----------
# (actuator 4's snapshot exists: data/grbal/cheetah_holdout_r4_s0/_s1)
run grbal_loo1 data/grbal/cheetah_loo1_r5_s0 \
  python run_scripts/run_grbal.py --task cripple --cripple_set 2,3,4,5 \
  --exp_name cheetah_loo1_r5_s0 --seed 0
run grbal_loo2 data/grbal/cheetah_loo2_r5_s0 \
  python run_scripts/run_grbal.py --task cripple --cripple_set 1,3,4,5 \
  --exp_name cheetah_loo2_r5_s0 --seed 0
run grbal_loo3 data/grbal/cheetah_loo3_r5_s0 \
  python run_scripts/run_grbal.py --task cripple --cripple_set 1,2,4,5 \
  --exp_name cheetah_loo3_r5_s0 --seed 0
run grbal_loo5 data/grbal/cheetah_loo5_r5_s0 \
  python run_scripts/run_grbal.py --task cripple --cripple_set 1,2,3,4 \
  --exp_name cheetah_loo5_r5_s0 --seed 0

# ---------- phase T2: continuous-OOD family trainings ----------
run grbal_hfield_hold_s0 data/grbal/hfield_holdout_r5_s0 \
  python run_scripts/run_grbal.py --env HalfCheetahHFieldEnv --task hfield \
  --terrain_set gentle,hill --exp_name hfield_holdout_r5_s0 --seed 0
run grbal_hfield_hold_s1 data/grbal/hfield_holdout_r5_s1 \
  python run_scripts/run_grbal.py --env HalfCheetahHFieldEnv --task hfield \
  --terrain_set gentle,hill --exp_name hfield_holdout_r5_s1 --seed 1
run grbal_blocks_s0 data/grbal/blocks_r5_s0 \
  python run_scripts/run_grbal.py --env HalfCheetahBlocksEnv --task damping \
  --n_itr 30 --exp_name blocks_r5_s0 --seed 0
run grbal_blocks_s1 data/grbal/blocks_r5_s1 \
  python run_scripts/run_grbal.py --env HalfCheetahBlocksEnv --task damping \
  --n_itr 30 --exp_name blocks_r5_s1 --seed 1
# non-adaptive control on the SAME terrain train distribution
run mbmpc_hfield_hold_s0 data/mb_mpc/hfield_holdout_r5_s0 \
  python run_scripts/run_mb_mpc.py --env HalfCheetahHFieldEnv --task hfield \
  --terrain_set gentle,hill --exp_name hfield_holdout_r5_s0 --seed 0

echo "=== R5 TRAINING PHASE COMPLETE ==="

# ---------- phase E1: leave-one-out evaluations (n=30 per mode) ----------
for k in 1 2 3 5; do
  ev loo${k}_eval 3000 python benchmarks/meta_test.py \
    data/grbal/cheetah_loo${k}_r5_s0 --eval_set ${k} \
    --tag cheetah_act${k}_grbal_loo --seeds 0,1,2,3,4,5
done

# ---------- phase E2: terrain + damping holdout evaluations ----------
for s in 0 1; do
  ev hf_steep_s${s} 3000 python benchmarks/meta_test.py \
    data/grbal/hfield_holdout_r5_s${s} --eval_set steep \
    --tag hfield_steep_grbal_s${s} --seeds 0,1,2,3,4,5
  ev hf_basin_s${s} 3000 python benchmarks/meta_test.py \
    data/grbal/hfield_holdout_r5_s${s} --eval_set basin \
    --tag hfield_basin_grbal_s${s} --seeds 0,1,2,3,4,5
  ev blocks_ood_s${s} 3000 python benchmarks/meta_test.py \
    data/grbal/blocks_r5_s${s} --eval_set 12:20 \
    --tag blocks_ood_grbal_s${s} --seeds 0,1,2,3,4,5
done
# in-distribution controls (gap should be ~null in-distribution)
ev hf_train_s0 3000 python benchmarks/meta_test.py \
  data/grbal/hfield_holdout_r5_s0 --eval_set gentle,hill \
  --tag hfield_train_grbal_s0 --seeds 0,1,2,3,4,5
ev blocks_train_s0 3000 python benchmarks/meta_test.py \
  data/grbal/blocks_r5_s0 \
  --tag blocks_train_grbal_s0 --seeds 0,1,2,3,4,5
# non-adaptive controls on the held-out distributions
ev hf_steep_mbmpc 2000 python benchmarks/meta_test.py \
  data/mb_mpc/hfield_holdout_r5_s0 --eval_set steep \
  --tag hfield_steep_mbmpc_s0 --seeds 0,1,2,3,4,5
ev hf_basin_mbmpc 2000 python benchmarks/meta_test.py \
  data/mb_mpc/hfield_holdout_r5_s0 --eval_set basin \
  --tag hfield_basin_mbmpc_s0 --seeds 0,1,2,3,4,5
ev blocks_ood_mbmpc 2000 python benchmarks/meta_test.py \
  data/mb_mpc/blocks_r4_s1 --eval_set 12:20 \
  --tag blocks_ood_mbmpc_s1 --seeds 0,1,2,3,4,5

# ---------- phase E3: ReBAL hidden-state ablations (r4 snapshots) -------
# same tags as the r4 files: the new JSONs (rebal + ablations, seeds 0-5)
# REPLACE the old single-mode ones, so nothing double-counts
ev rebal_abl_ant_s1 4000 python benchmarks/meta_test.py \
  data/rebal/ant_cripple_r4_s1 --eval_set 3 --tag ant_leg3_rebal_s1 \
  --seeds 0,1,2,3,4,5
ev rebal_abl_ant_s2 4000 python benchmarks/meta_test.py \
  data/rebal/ant_cripple_r4_s2 --eval_set 3 --tag ant_leg3_rebal_s2 \
  --seeds 0,1,2,3,4,5
ev rebal_abl_hc_s0 4000 python benchmarks/meta_test.py \
  data/rebal/cheetah_holdout_r4_s0 --eval_set 4 --tag cheetah_act4_rebal_s0 \
  --seeds 0,1,2,3,4,5

echo "=== R5 EVAL PHASES E1-E3 COMPLETE ==="

# ---------- phase E4: extra eval seeds on the r4 holdout snapshots ------
# (VERDICT #5: push n from 30 toward 60-90; _ext files pool with the base)
for s in 0 1 2; do
  ev ant_ext_s${s} 4000 python benchmarks/meta_test.py \
    data/grbal/ant_cripple_r4_s${s} --eval_set 3 \
    --tag ant_leg3_grbal_s${s}_ext --seeds 6,7,8,9,10,11
done
for s in 0 1; do
  ev hc_ext_s${s} 4000 python benchmarks/meta_test.py \
    data/grbal/cheetah_holdout_r4_s${s} --eval_set 4 \
    --tag cheetah_act4_grbal_s${s}_ext --seeds 6,7,8,9,10,11
done

echo "=== R5 CAMPAIGN COMPLETE ==="
