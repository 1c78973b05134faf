#!/bin/bash
# Round-3 continuation pipeline, take 2: the take-1 run (r3b_pipeline.sh) died
# with a session crash at source-only iter ~1620. Resume stage 3 from its last
# 500-iter checkpoint, then run the two post-fix parity trajectories flagged
# as round-4 follow-ups in REPORT_accuracy.md (run-Q seed replication).
set -u
cd /root/repo
mkdir -p .proxy_runs
echo "=== [3/5 resume] source-only init $(date)"
python scripts/run_accuracy_proxy.py --source-only --resume \
  --out /root/repo/.proxy_runs/source_only
echo "=== [4/5] Q2: parity at HEAD, default seed, post-fix init $(date)"
python scripts/run_accuracy_proxy.py --ema-keep 0.999 --burn 200 \
  --weights /root/repo/.proxy_runs/source_only/model_0003000 \
  --out /root/repo/.proxy_runs/pt_parity_head2
echo "=== [5/5] R: parity at HEAD, seed 7 $(date)"
python scripts/run_accuracy_proxy.py --ema-keep 0.999 --burn 200 --seed 7 \
  --weights /root/repo/.proxy_runs/source_only/model_0003000 \
  --out /root/repo/.proxy_runs/pt_parity_head_s7
echo "=== pipeline done $(date)"
