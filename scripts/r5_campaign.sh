#!/bin/bash
# Round-5 chip campaign (VERDICT r4 Next #4): finish pre-registered run R,
# then the init-draw distribution — >=3 fresh source-only draws -> parity
# mutual runs -> P(collapse | init draw) — with a warmup-ramp rescue run
# auto-queued for every collapsing draw. Decision rules are pre-registered in
# REPORT_accuracy.md ("Pre-registered: run R"); this script only executes the
# recipe and commits each stage's tracked curve.
#
# Chip handoff: `touch .proxy_runs/PAUSE` makes the campaign wait BETWEEN
# stages (e.g. to run bench measurements on the chip); `rm` it to continue.
#
# Collapse cutoff for the rescue queue: final teacher foggy mAP50 < 65 — the
# midpoint between the observed collapse ceiling (58, q_s0 family) and the
# healthy plateau floor (73, runs Q/L); REPORT_accuracy.md round-4 tables.
set -u
cd /root/repo
LOG=/root/repo/.proxy_runs/r5_campaign.log
mkdir -p /root/repo/.proxy_runs
# persistent-compile-cache forensics for VERDICT r4 Weak #2: each train_net
# compile logs cache get/put/miss events into the run's driver.log
export JAX_DEBUG_LOG_MODULES=jax._src.compilation_cache

say() { echo "[r5c] $* -- $(date)" >> "$LOG"; }

# Deadline: stop launching NEW stages after this epoch so the chip is free for
# the driver's end-of-round bench run (CAMPAIGN_DEADLINE env, default +inf).
DEADLINE=${CAMPAIGN_DEADLINE:-9999999999}

wait_if_paused() {
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then
    say "deadline passed; stopping before the next stage"
    touch /root/repo/.proxy_runs/r5_campaign.done
    exit 0
  fi
  while [ -e /root/repo/.proxy_runs/PAUSE ]; do
    say "paused (rm .proxy_runs/PAUSE to continue)"
    sleep 60
  done
}

stage_budget() {  # stage_budget <wanted-secs> -> min(wanted, time-to-deadline)
  local want=$1 left=$(( DEADLINE - $(date +%s) ))
  if [ "$left" -lt "$want" ]; then echo "$left"; else echo "$want"; fi
}

commit_stage() {  # commit_stage <run-name> <message>
  git add docs/proxy_runs/"$1" 2>/dev/null
  git commit -m "$2" --only docs/proxy_runs/"$1" >> "$LOG" 2>&1 || true
}

final_teacher_map() {  # last-eval teacher foggy mAP50 from the tracked curve
  python - "$1" <<'EOF'
import json, os, sys
path = os.path.join("/root/repo/docs/proxy_runs", sys.argv[1], "metrics.json")
best_it, val = -1, None
try:
    for line in open(path):
        try:
            d = json.loads(line)
        except ValueError:
            continue
        m = d.get("VOC2007_foggyval/mAP50", d.get("mAP50"))
        it = d.get("iteration", -1)
        if m is not None and it >= best_it:
            best_it, val = it, m
except OSError:
    pass
print("" if val is None else round(val, 2))
EOF
}

source_only() {  # source_only <seed> [extra run_accuracy_proxy args...]
  local seed=$1; shift
  local name=source_only_s$seed
  wait_if_paused
  say "start $name"
  timeout "$(stage_budget 7200)" python scripts/run_accuracy_proxy.py --source-only --seed "$seed" \
      "$@" --out /root/repo/.proxy_runs/"$name" >> "$LOG" 2>&1
  local rc=$?
  say "=== $name done rc=$rc ==="
  commit_stage "$name" "accuracy campaign: $name source-only curve (seed $seed)"
}

mutual() {  # mutual <name> <weights-dir> [extra args...]
  local name=$1 w=$2; shift 2
  if [ ! -d "$w" ]; then say "SKIP $name: no checkpoint at $w"; return 1; fi
  wait_if_paused
  say "start $name"
  timeout "$(stage_budget 10800)" python scripts/run_accuracy_proxy.py --ema-keep 0.999 --burn 200 \
      --weights "$w" --iters 3000 "$@" \
      --out /root/repo/.proxy_runs/"$name" >> "$LOG" 2>&1
  local rc=$?
  say "=== $name done rc=$rc ==="
  commit_stage "$name" "accuracy campaign: $name mutual curve"
}

# ---- Stage 1+2: the pre-registered run R (resume the interrupted s101 draw)
source_only 101 --resume
mutual run_r /root/repo/.proxy_runs/source_only_s101/model_0003000

# ---- Init-draw distribution: two more fresh draws + parity mutual runs
for seed in 102 103; do
  source_only "$seed"
  mutual run_r_s"$seed" /root/repo/.proxy_runs/source_only_s"$seed"/model_0003000
done

# ---- Rescue validation: warmup ramp 600 on every collapsing draw
for seed in 101 102 103; do
  if [ "$seed" = 101 ]; then run=run_r; else run=run_r_s$seed; fi
  m=$(final_teacher_map "$run")
  if [ -n "$m" ] && python -c "import sys; sys.exit(0 if float('$m') < 65 else 1)"; then
    say "$run collapsed (final teacher mAP50=$m); queueing rescue"
    mutual "${run}_rescue" /root/repo/.proxy_runs/source_only_s"$seed"/model_0003000 \
        --unsup-warmup 600
  else
    say "no rescue for $run (final teacher mAP50=$m)"
  fi
done

touch /root/repo/.proxy_runs/r5_campaign.done
say "ALL DONE"
