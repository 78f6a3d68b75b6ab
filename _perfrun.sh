#!/bin/bash
cd /root/repo
echo "=== bench.py ==="
python bench.py 2>/tmp/bench_stderr.log
echo "=== bench stderr tail ==="
tail -8 /tmp/bench_stderr.log
echo "=== bench_mmtm_kernel ==="
python tools/bench_mmtm_kernel.py --steps 30
echo "=== profile_step ==="
python tools/profile_step.py 2>&1 | grep -v -E "WARNING|warn|Platform"
echo "=== ALL DONE ==="
