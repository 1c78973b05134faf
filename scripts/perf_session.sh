#!/bin/bash
# Round-2 perf session: profile -> bench -> NMS A/B -> e2e (run serially on the chip).
set -x
cd /root/repo
echo "=== profile batch 8 ==="
timeout 3000 python scripts/profile_step.py --batch 8 --iters 5
echo "=== bench batch 8 (headline) ==="
timeout 1200 python bench.py --iters 20
echo "=== nms A/B ==="
timeout 1800 python scripts/nms_bench.py --block 1024 --iters 20
timeout 1800 python scripts/nms_bench.py --block 1024 --unroll 1 --iters 20
timeout 1800 python scripts/nms_bench.py --block 2048 --iters 20
echo "=== e2e loader-in-loop batch 8 ==="
timeout 3000 python bench.py --e2e --batch 8 --iters 30
echo "=== done ==="
