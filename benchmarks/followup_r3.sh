#!/bin/bash
# Follow-up TPU batch (serial, single client): the paper's actual
# adaptation claim is GrBAL vs non-adaptive MB-MPC under the SAME task
# distribution — train MB-MPC on cripple for the cross-algorithm
# comparison, and measure the within-model adaptation gap on the hfield
# snapshot as well.
cd /root/repo
echo "=== mb_mpc cripple ==="
timeout 3600 python run_scripts/run_mb_mpc.py --task cripple --exp_name cripple_r3
echo "rc=$?"
sleep 10
echo "=== adaptation gap: hfield ==="
timeout 2400 python benchmarks/adaptation_gap.py data/grbal/hfield_r3
echo "rc=$?"
echo "=== FOLLOWUP COMPLETE ==="
