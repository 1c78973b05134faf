#!/bin/bash
# Round-4 chip queue, v4: accuracy runs only (the NMS A/B and the fused-bwd
# bench ran interactively — results in DESIGN.md). Waits for any PID in $1 to
# exit first so it can be chained behind an in-flight chip job.
set -u
cd /root/repo
LOG=/root/repo/.proxy_runs/r4_pipeline.log
W=/root/repo/.proxy_runs/source_only/model_0003000

if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

run_q () {  # name, timeout, extra args...
  local name=$1 tmo=$2; shift 2
  echo "[r4v4] === $name start $(date) ===" >> "$LOG"
  timeout "$tmo" python scripts/run_accuracy_proxy.py --ema-keep 0.999 --burn 200 \
      --weights "$W" --out "/root/repo/.proxy_runs/$name" "$@" >> "$LOG" 2>&1
  echo "[r4v4] === $name done $(date) rc=$? ===" >> "$LOG"
}

# q_s0 at 2400 iters: the collapse signature (q_s7/q_s13) shows within ~300
# iters of the burn boundary and the healthy band is defined after 1500, so
# 2400 decides init-vs-seed while leaving wall for the attribution runs.
run_q q_s0 7800 --iters 2400
run_q q_tpre  3900 --iters 1000 --teacher-pre 6000
run_q q_tpost 3900 --iters 1000 --teacher-post 1000

touch /root/repo/.proxy_runs/r4_pipeline.done
echo "[r4v4] ALL DONE $(date)" >> "$LOG"
