#!/bin/bash
# Round-3 canonical workload campaign: the three reference configs on
# HalfCheetah plus the two adaptive-task GrBAL runs (cripple, hfield).
# Sequential: ONE TPU client at a time (the axon chip-grant protocol wedges
# forever if a second client claims while another holds the chip — root
# cause of the round-2 verify death). A watchdog kills a run whose exp dir
# stops progressing and retries it with --resume.
cd /root/repo
mkdir -p results

STALL_SECS=600   # no file-mtime progress in the exp dir for this long = wedged
MAX_WALL=4500    # hard cap per attempt
ATTEMPTS=3

newest_mtime() {  # newest mtime (epoch) of any file under $1
  find "$1" -type f -printf '%T@\n' 2>/dev/null | sort -n | tail -1 | cut -d. -f1
}

run() {
  name=$1; dir=$2; shift 2
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
    # success = the run wrote all its iterations (trainer prints this)
    if grep -q "Training finished" "$dir/log.txt" 2>/dev/null; then break; fi
  done
}

run grbal_hc   data/grbal/hc_r3        python run_scripts/run_grbal.py  --exp_name hc_r3
run rebal_hc   data/rebal/hc_r3        python run_scripts/run_rebal.py  --exp_name hc_r3
run mbmpc_hc   data/mb_mpc/hc_r3       python run_scripts/run_mb_mpc.py --exp_name hc_r3
run grbal_crip data/grbal/cripple_r3   python run_scripts/run_grbal.py  --task cripple --exp_name cripple_r3
run grbal_hf   data/grbal/hfield_r3    python run_scripts/run_grbal.py  --env HalfCheetahHFieldEnv --task hfield --exp_name hfield_r3
echo "=== ALL RUNS COMPLETE ==="
