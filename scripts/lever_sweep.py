#!/usr/bin/env python
"""Round-3 perf-lever sweep (VERDICT r2 Next #2): serial real-chip A/B of the
algorithm-level levers against the conv-bound roofline.

Runs ``bench.py --worker`` once per lever combo (one chip — strictly serial),
collects each JSON record, and writes a table to stdout plus
``docs/lever_sweep_r3.json``. Each combo is a distinct jit graph, so the first
run of each pays a (persistent-cached) compile.

Combos target the non-conv 155 ms of the 373 ms batch-8 step (DESIGN.md
round-2 trace): RPN NMS while-loops (hybrid = 3x3 local-max prefilter + exact
NMS on survivors), and the teacher weak-pass budgets (8 img x 2000 post-NMS
proposals dominate ROIAlign volume: 16000 of 28288 pooled boxes/iter).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench

COMBOS = [
    # (name, extra worker args)
    ("baseline_exact", []),
    ("hybrid", ["--nms-impl", "hybrid"]),
    ("teacher1000", ["--teacher-pre", "6000", "--teacher-post", "1000"]),
    ("hybrid_teacher1000", ["--nms-impl", "hybrid",
                            "--teacher-pre", "6000", "--teacher-post", "1000"]),
    ("hybrid_teacher500", ["--nms-impl", "hybrid",
                           "--teacher-pre", "3000", "--teacher-post", "500"]),
    ("hybrid_teacher1000_cand2048", ["--nms-impl", "hybrid",
                                     "--teacher-pre", "6000",
                                     "--teacher-post", "1000",
                                     "--teacher-cand", "2048"]),
    # round-3c: the run-K production candidate — teacher-side levers ONLY
    # (student training path bit-exact; see diagnose_student_path.py for why
    # pre-topk/hybrid are excluded)
    ("teacher1000_cand2048", ["--teacher-pre", "6000", "--teacher-post", "1000",
                              "--teacher-cand", "2048"]),
    # round-3b: safe levers after the proxy collapse diagnosis — pre-NMS budget
    # cut (pure score ranking, no geometry approximation) replacing hybrid
    ("combo_safe", ["--pre-topk", "4000",
                    "--teacher-pre", "4000", "--teacher-post", "1000",
                    "--teacher-cand", "2048"]),
    # hybrid after the safe-channel fix (prefilter only on large anchors)
    ("combo_hybrid_safe", ["--nms-impl", "hybrid", "--pre-topk", "4000",
                           "--teacher-pre", "4000", "--teacher-post", "1000",
                           "--teacher-cand", "2048"]),
]


def main():
    only = sys.argv[1:] or None
    out_path = os.path.join(REPO, "docs", "lever_sweep_r3.json")
    results = {}
    if os.path.exists(out_path):
        results = json.load(open(out_path))
    for name, extra in COMBOS:
        if only and name not in only:
            continue
        if name in results and results[name].get("value", 0) > 0:
            print(f"[sweep] {name}: cached {results[name]['value']}", flush=True)
            continue
        worker_args = ["--iters", "8", "--windows", "3"] + extra
        print(f"[sweep] {name}: bench.py --worker {' '.join(worker_args)}",
              flush=True)
        t0 = time.time()
        rec = bench.spawn_worker(worker_args, timeout_s=2400)
        if rec is None:
            rec = {"value": 0.0, "error": "crash/timeout"}
        rec["wall_s"] = round(time.time() - t0, 1)
        results[name] = rec
        json.dump(results, open(out_path, "w"), indent=1)
        print(f"[sweep] {name}: {rec.get('value')} img/s/chip "
              f"(windows {rec.get('windows')}, wall {rec['wall_s']} s)", flush=True)
    print(json.dumps({k: v.get("value") for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
