#!/bin/bash
cd /root/repo
echo "=== bench_step_ab ==="
python tools/bench_step_ab.py 2>&1 | grep -v -E "WARNING|warn|Platform 'axon'"
echo "=== bench_mmtm_kernel ==="
python tools/bench_mmtm_kernel.py --steps 30 2>&1 | grep -v -E "WARNING|warn|Platform 'axon'"
echo "=== ALL DONE3 ==="
