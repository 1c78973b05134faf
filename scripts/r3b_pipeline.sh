#!/bin/bash
# Round-3 continuation chip pipeline: bench health check (warms the wiped
# compile cache), proxy data rebuild, source-only init, then the two
# post-fix parity trajectories flagged as round-4 follow-ups in
# REPORT_accuracy.md (run Q seed replication).
set -u
cd /root/repo
mkdir -p .proxy_runs
echo "=== [1/5] bench (chip health + cache warm) $(date)"
timeout 3100 python bench.py >/root/repo/.proxy_runs/bench_head.json 2>/root/repo/.proxy_runs/bench_head.log
echo "bench exit $? $(date)"
cat /root/repo/.proxy_runs/bench_head.json
echo "=== [2/5] proxy data $(date)"
python scripts/make_daod_proxy.py --root /root/repo/.proxy_data
echo "=== [3/5] source-only init $(date)"
python scripts/run_accuracy_proxy.py --source-only --out /root/repo/.proxy_runs/source_only
echo "=== [4/5] Q2: parity at HEAD, default seed, post-fix init $(date)"
python scripts/run_accuracy_proxy.py --ema-keep 0.999 --burn 200 \
  --weights /root/repo/.proxy_runs/source_only/model_0003000 \
  --out /root/repo/.proxy_runs/pt_parity_head2
echo "=== [5/5] R: parity at HEAD, seed 7 $(date)"
python scripts/run_accuracy_proxy.py --ema-keep 0.999 --burn 200 --seed 7 \
  --weights /root/repo/.proxy_runs/source_only/model_0003000 \
  --out /root/repo/.proxy_runs/pt_parity_head_s7
echo "=== pipeline done $(date)"
