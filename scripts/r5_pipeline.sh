#!/bin/bash
# Round-5 chip queue, v1: REPLAY run R — the pre-registered bistability test
# (REPORT_accuracy.md "Pre-registered: run R") whose round-4 execution was cut
# by the round boundary with its artifacts on the ephemeral container fs.
#
# Differences from the lost round-4 execution (scripts/r4_pipeline_v7.sh):
#   * run_accuracy_proxy.py now mirrors metrics.json/config.yaml into the
#     git-tracked docs/proxy_runs/<name>/ every 60 s while the run is live,
#     so ANY snapshot commit preserves the curve-so-far.
#   * this script additionally git-commits after each stage completes.
#
# Decision rules are pre-registered in REPORT_accuracy.md — do not adjust
# the recipe; only read the curve against them.
set -u
cd /root/repo
LOG=/root/repo/.proxy_runs/r5_pipeline.log
mkdir -p /root/repo/.proxy_runs

commit_stage() {  # commit_stage <run-name> <message>
  git add docs/proxy_runs/"$1" 2>/dev/null
  git commit -m "$2" --only docs/proxy_runs/"$1" >> "$LOG" 2>&1 || true
}

echo "[r5] starting source_only_s101 $(date)" >> "$LOG"
timeout 7200 python scripts/run_accuracy_proxy.py --source-only --seed 101 \
    --out /root/repo/.proxy_runs/source_only_s101 >> "$LOG" 2>&1
rc=$?
echo "[r5] === source_only_s101 done $(date) rc=$rc ===" >> "$LOG"
commit_stage source_only_s101 "run R stage 1: source_only_s101 curve (fresh init draw, seed 101)"

W=/root/repo/.proxy_runs/source_only_s101/model_0003000
if [ ! -d "$W" ]; then
  echo "[r5] ABORT: no checkpoint at $W" >> "$LOG"
  exit 1
fi

timeout 10800 python scripts/run_accuracy_proxy.py --ema-keep 0.999 --burn 200 \
    --weights "$W" --iters 3000 \
    --out /root/repo/.proxy_runs/run_r >> "$LOG" 2>&1
rc=$?
echo "[r5] === run_r done $(date) rc=$rc ===" >> "$LOG"
commit_stage run_r "run R stage 2: reference-exact mutual run from the s101 draw"

touch /root/repo/.proxy_runs/r5_pipeline.done
echo "[r5] ALL DONE $(date)" >> "$LOG"
