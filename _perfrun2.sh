#!/bin/bash
cd /root/repo
echo "=== bench_step_ab ==="
python tools/bench_step_ab.py 2>/dev/null
echo "=== bench_mmtm_kernel (fixed) ==="
python tools/bench_mmtm_kernel.py --steps 30 2>/dev/null
echo "=== profile_step (fixed) ==="
python tools/profile_step.py 2>/dev/null
echo "=== ALL DONE2 ==="
