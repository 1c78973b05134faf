#!/bin/bash
# Round-4 chip queue, v6: teacher-budget attribution runs, re-registered WITH
# the unsup-loss warmup ramp (REPORT_accuracy.md "q_s0_warmup verdict") so they
# read against a healthy control (q_s0_warmup: T 87.6 / S 86.1 @ iter 1000).
set -u
cd /root/repo
LOG=/root/repo/.proxy_runs/r4_pipeline.log
W=/root/repo/.proxy_runs/source_only/model_0003000

run_q () {  # name, timeout, extra args...
  local name=$1 tmo=$2; shift 2
  echo "[r4v6] === $name start $(date) ===" >> "$LOG"
  timeout "$tmo" python scripts/run_accuracy_proxy.py --ema-keep 0.999 --burn 200 \
      --unsup-warmup 600 --weights "$W" \
      --out "/root/repo/.proxy_runs/$name" "$@" >> "$LOG" 2>&1
  echo "[r4v6] === $name done $(date) rc=$? ===" >> "$LOG"
}

run_q q_tpre_w  3900 --iters 1000 --teacher-pre 6000
run_q q_tpost_w 3900 --iters 1000 --teacher-post 1000

touch /root/repo/.proxy_runs/r4_pipeline_v6.done
echo "[r4v6] ALL DONE $(date)" >> "$LOG"
