#!/bin/bash
# Runs the TPU-dependent round-3 measurements AFTER the canonical campaign
# releases the chip (single-TPU-client discipline: the axon grant protocol
# wedges on overlapping clients). Polls the campaign log, then runs each
# step serially under timeout.
cd /root/repo
while ! grep -q "ALL RUNS COMPLETE" data/canonical_r3.log 2>/dev/null; do
  sleep 60
done
echo "=== campaign complete; starting TPU measurements ==="
sleep 15   # let the last python process release the chip grant

echo "=== pallas jacobi decision bench ==="
timeout 1800 python benchmarks/bench_pallas_jacobi.py
echo "rc=$?"
sleep 10
echo "=== adaptation gap ==="
timeout 2400 python benchmarks/adaptation_gap.py data/grbal/cripple_r3
echo "rc=$?"
sleep 10
echo "=== bench.py ==="
timeout 2400 python bench.py
echo "rc=$?"
echo "=== POST-CAMPAIGN COMPLETE ==="
