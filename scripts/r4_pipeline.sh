#!/bin/bash
# Round-4 chip-session queue (VERDICT r3 Next #2 + #3 measurements).
# Waits for the source-only init re-run to finish, then:
#   1. NMS A/B at production shapes (blocked fixed-point vs Pallas scan)
#   2. run-Q seed replication (seeds 7, 13) from the source-only init
#   3. teacher-pre vs teacher-post budget attribution runs (Q-class controls)
# Logs to /root/repo/.proxy_runs/r4_pipeline.log; marker file on completion.
set -u
cd /root/repo
LOG=/root/repo/.proxy_runs/r4_pipeline.log
W=/root/repo/.proxy_runs/source_only/model_0003000
mkdir -p /root/repo/.proxy_runs

echo "[r4] waiting for source_only (pid $(cat /tmp/proxy_run.pid 2>/dev/null))" >> "$LOG"
while kill -0 "$(cat /tmp/proxy_run.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done
echo "[r4] source_only done $(date)" >> "$LOG"

if [ ! -d "$W" ]; then
  echo "[r4] FATAL: $W missing" >> "$LOG"; exit 1
fi

echo "[r4] === profile at HEAD (batch 8, exact graph) ===" >> "$LOG"
timeout 2400 python scripts/profile_step.py --batch 8 --iters 5 >> "$LOG" 2>&1
echo "[r4] === nms A/B ===" >> "$LOG"
timeout 1200 python scripts/nms_bench.py --impl block  >> "$LOG" 2>&1
timeout 1800 python scripts/nms_bench.py --impl pallas >> "$LOG" 2>&1
echo "[r4] nms A/B done $(date)" >> "$LOG"

run_q () {  # name, extra args...
  local name=$1; shift
  echo "[r4] === $name start $(date) ===" >> "$LOG"
  timeout 9000 python scripts/run_accuracy_proxy.py --ema-keep 0.999 --burn 200 \
      --weights "$W" --out "/root/repo/.proxy_runs/$name" "$@" >> "$LOG" 2>&1
  echo "[r4] === $name done $(date) rc=$? ===" >> "$LOG"
}

run_q q_s7  --seed 7
run_q q_s13 --seed 13
run_q q_tpre  --teacher-pre 6000
run_q q_tpost --teacher-post 1000

touch /root/repo/.proxy_runs/r4_pipeline.done
echo "[r4] ALL DONE $(date)" >> "$LOG"
