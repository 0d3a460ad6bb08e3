#!/bin/bash
# Round-5 follow-up TPU batch. Gates on the main campaign's COMPLETE
# marker (strict single-client TPU serialization), then:
#   - arm force-range extrapolation evals (third continuous-OOD family,
#     eval-only on the r4 arm-force snapshot)
#   - latency decomposition at the saturated headline shapes (VERDICT
#     round-4 weak #4)
#   - TWO consecutive robust bench captures (median-of-5-repeats CPU
#     baseline) to demonstrate the ratio reproduces within its stated
#     dispersion (VERDICT round-4 weak #1)
cd /root/repo

echo "waiting for main campaign to complete..."
while ! grep -q "R5 CAMPAIGN COMPLETE" data/campaign_r5.log 2>/dev/null; do
  sleep 60
done
echo "campaign complete — starting follow-up batch"

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

# ---------- arm force extrapolation (train U(0.1,2) -> eval U(3,6)) -----
ev arm_force_ood 3000 python benchmarks/meta_test.py \
  data/grbal/arm_force_r4 --eval_set 3:6 --tag arm_force_ood_s0 \
  --seeds 0,1,2,3,4,5
ev arm_force_train 3000 python benchmarks/meta_test.py \
  data/grbal/arm_force_r4 --tag arm_force_train_s0 --seeds 0,1,2,3,4,5

# ---------- saturated-shape latency decomposition -----------------------
ev decomp_512 2400 python benchmarks/bench_latency_decomp.py \
  --shape saturated --n_envs 512
ev decomp_256 2400 python benchmarks/bench_latency_decomp.py \
  --shape saturated --n_envs 256
ev decomp_canon 2400 python benchmarks/bench_latency_decomp.py \
  --shape canonical

# ---------- two consecutive robust bench captures -----------------------
ev bench_capture1 3600 bash -c \
  'python bench.py > results/bench_r5_capture1.json 2> results/bench_r5_capture1.aux'
ev bench_capture2 3600 bash -c \
  'python bench.py > results/bench_r5_capture2.json 2> results/bench_r5_capture2.aux'

echo "=== R5 POST-CAMPAIGN COMPLETE ==="
