#!/bin/bash
# Round-4 chip-session queue, v3 (rescheduled ~04:10 UTC).
#
# Why v2 was cut short: BOTH seed-replication runs collapsed right after
# burn-in (teacher 73.5 -> 25.4 by iter 500; q_s7 terminal ~30 vs the 73-78
# healthy band), which is far outside the pre-registered "late-tail decay"
# question. Training code for this config is identical to round-3 HEAD (the
# only round-4 default-path diff is an NMS dispatch refactor calling the same
# blocked solver), and the proxy dataset is seed-deterministic, so the
# candidates are (a) seed sensitivity (F/P/Q all effectively SEED 0) and
# (b) the fresh source-only init / cross-round environment numerics.
# q_s13 was only re-confirming q_s7; its chip hours buy more as:
#   1. the fixed Pallas NMS kernel A/B at production shapes (VERDICT #3),
#   2. q_s0: the EXACT run-Q config (SEED -1 == 0) from TODAY'S init — the
#      one-variable experiment that splits (a) from (b),
#   3. the teacher budget attribution runs, interpretable iff q_s0 is healthy.
set -u
cd /root/repo
LOG=/root/repo/.proxy_runs/r4_pipeline.log
W=/root/repo/.proxy_runs/source_only/model_0003000

echo "[r4v3] === nms A/B start $(date) ===" >> "$LOG"
timeout 2700 python scripts/nms_bench.py --impl pallas --iters 20 >> "$LOG" 2>&1
echo "[r4v3] pallas rc=$? $(date)" >> "$LOG"
timeout 1800 python scripts/nms_bench.py --impl block --iters 20 >> "$LOG" 2>&1
echo "[r4v3] block rc=$? $(date)" >> "$LOG"

run_q () {  # name, timeout, extra args...
  local name=$1 tmo=$2; shift 2
  echo "[r4v3] === $name start $(date) ===" >> "$LOG"
  timeout "$tmo" python scripts/run_accuracy_proxy.py --ema-keep 0.999 --burn 200 \
      --weights "$W" --out "/root/repo/.proxy_runs/$name" "$@" >> "$LOG" 2>&1
  echo "[r4v3] === $name done $(date) rc=$? ===" >> "$LOG"
}

run_q q_s0 9000
run_q q_tpre  4200 --iters 1200 --teacher-pre 6000
run_q q_tpost 4200 --iters 1200 --teacher-post 1000

touch /root/repo/.proxy_runs/r4_pipeline.done
echo "[r4v3] ALL DONE $(date)" >> "$LOG"
