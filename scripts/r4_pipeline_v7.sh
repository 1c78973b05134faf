#!/bin/bash
# Round-4 chip queue, v7: run R — a fresh source-only init draw tests the
# bistability prediction (REPORT_accuracy.md "Pre-registered: run R").
#   1. wait for the q_s0_warmup resume (rescue completion) to release the chip
#   2. source_only_s101: fresh init draw (--seed 101), 3000 iters
#   3. run_r: reference-exact parity recipe from that checkpoint, 3000 iters
set -u
cd /root/repo
LOG=/root/repo/.proxy_runs/r4_pipeline.log

while kill -0 "$(cat /tmp/rescue_finish.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "[r4v7] chip free; starting source_only_s101 $(date)" >> "$LOG"

timeout 7200 python scripts/run_accuracy_proxy.py --source-only --seed 101 \
    --out /root/repo/.proxy_runs/source_only_s101 >> "$LOG" 2>&1
echo "[r4v7] === source_only_s101 done $(date) rc=$? ===" >> "$LOG"

W=/root/repo/.proxy_runs/source_only_s101/model_0003000
if [ ! -d "$W" ]; then
  echo "[r4v7] ABORT: no checkpoint at $W" >> "$LOG"
  exit 1
fi

timeout 10800 python scripts/run_accuracy_proxy.py --ema-keep 0.999 --burn 200 \
    --weights "$W" --iters 3000 \
    --out /root/repo/.proxy_runs/run_r >> "$LOG" 2>&1
echo "[r4v7] === run_r done $(date) rc=$? ===" >> "$LOG"

touch /root/repo/.proxy_runs/r4_pipeline_v7.done
echo "[r4v7] ALL DONE $(date)" >> "$LOG"
