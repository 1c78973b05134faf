#!/usr/bin/env python
"""Tabulate teacher/student mAP50 curves of several proxy runs side by side.

Usage: python scripts/compare_runs.py <run_dir_or_metrics.json> [...]
Accepts run output dirs (reads metrics.json) or committed docs/proxy_runs/<x>
dirs; prints one row per eval iteration with a column pair per run.
"""

import json
import os
import sys


def load(run):
    path = run if run.endswith(".json") else os.path.join(run, "metrics.json")
    out = {}
    with open(path) as f:
        for line in f:
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            it = d.get("iteration")
            t = next((v for k, v in d.items()
                      if k.endswith("/mAP50") or k == "mAP50"), None)
            s = next((v for k, v in d.items()
                      if k.endswith("mAP50_student")), None)
            npb = d.get("num_pseudo_boxes")
            if it is not None and (t is not None or s is not None):
                out[it] = (t, s, npb)
    return out


def main(argv):
    runs = {os.path.basename(os.path.normpath(r)): load(r) for r in argv}
    iters = sorted({i for r in runs.values() for i in r})
    # metrics.json carries the last eval value on every writer line; keep only
    # rows where some run's teacher/student value changes (fresh eval points)
    kept, prev = [], {}
    for it in iters:
        snap = {n: r.get(it, (None, None, None))[:2] for n, r in runs.items()}
        if any(v != prev.get(n) and v != (None, None) for n, v in snap.items()):
            kept.append(it)
            prev.update({n: v for n, v in snap.items() if v != (None, None)})
    iters = kept
    hdr = f"{'iter':>6}"
    for name in runs:
        hdr += f" | {name[:18]:>18} T/S/npb"
    print(hdr)
    for it in iters:
        row = f"{it:>6}"
        for name, r in runs.items():
            if it in r:
                t, s, npb = r[it]
                row += (f" | {t if t is not None else float('nan'):6.1f}"
                        f" {s if s is not None else float('nan'):6.1f}"
                        f" {npb if npb is not None else float('nan'):6.1f}")
            else:
                row += " | " + " " * 20
        print(row)


if __name__ == "__main__":
    main(sys.argv[1:])
