#!/usr/bin/env python
"""Capture an xplane trace of the mutual step and print per-HLO-category totals.

Usage: python scripts/profile_step.py [--batch 4] [--iters 5]
           [--nms-impl {exact,maxpool,hybrid}] [--teacher-pre N]
           [--teacher-post N] [--teacher-cand N]
Prints: device-time totals grouped by HLO category, plus the top-N single ops.
This is the ground-truth view for the throughput work (VERDICT.md Next #1).
"""

import argparse
import collections
import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def capture(fn, state, args, iters, tracedir):
    state, m = fn(state, *args)  # state is donated: must be re-threaded every call
    float(m["total_loss"])       # force full sync (tunneled backend: fetch a scalar)
    with jax.profiler.trace(tracedir):
        last = None
        for _ in range(iters):
            state, m = fn(state, *args)
            if last is not None:
                float(last)
            last = m["total_loss"]
        float(last)


def parse_xplane(tracedir, topn=40, iters=1, detail=False):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(tracedir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane.pb under {tracedir}"
    xspace = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xspace.ParseFromString(f.read())

    by_cat = collections.Counter()
    by_op = collections.Counter()
    op_count = collections.Counter()
    op_stats = {}
    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        stat_names = {sid: s.name for sid, s in plane.stat_metadata.items()}
        emeta = plane.event_metadata
        for line in plane.lines:
            # 'XLA Ops' is the synchronous compute stream; 'Async XLA Ops' holds
            # overlapping DMA spans (double-counting if summed).
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = emeta[ev.metadata_id]
                dur = ev.duration_ps / 1e12  # seconds
                cat = None
                for st in list(ev.stats) + list(md.stats):
                    if stat_names.get(st.metadata_id) == "hlo_category":
                        cat = st.str_value or None
                if cat is None:
                    cat = "<none>"
                by_cat[cat] += dur
                key = md.display_name or md.name
                by_op[(cat, key)] += dur
                op_count[(cat, key)] += 1
                if detail and (cat, key) not in op_stats:
                    # every string/number stat the runtime attached (source
                    # line, tf_op/jax scope, HLO expression, memory BW, ...)
                    rec = {}
                    for st in list(ev.stats) + list(md.stats):
                        name = stat_names.get(st.metadata_id, "?")
                        val = (st.str_value or st.int64_value or st.uint64_value
                               or st.double_value or "")
                        if val != "":
                            rec[name] = str(val)
                    op_stats[(cat, key)] = rec
    total = sum(by_cat.values())
    # Relayout attribution (VERDICT r4 Next #5): everything XLA spends moving
    # bytes without computing — copies, transposes, reshapes, converts,
    # bitcasts and fusions thereof — summed and itemized, so "the relayouts
    # are already free" (or not) is a printed number, not a guess.
    import re

    relayout_pat = re.compile(r"copy|transpose|reshape|bitcast|convert",
                              re.IGNORECASE)
    relayout_cats = {c for c in by_cat
                     if relayout_pat.search(c) or c in ("data formatting",)}
    rel_ops = [((c, op), t) for (c, op), t in by_op.items()
               if c in relayout_cats or relayout_pat.search(op)]
    rel_total = sum(t for _, t in rel_ops)
    print(f"\n== relayout attribution: {rel_total*1e3/iters:.2f} ms/iter "
          f"({100*rel_total/max(total,1e-12):.1f}% of device) ==")
    for (cat, op), t in sorted(rel_ops, key=lambda kv: -kv[1])[:20]:
        n = op_count[(cat, op)]
        print(f"  {t*1e3/iters:9.3f} ms  x{n//iters:<5d} [{cat}] {op[:100]}")
    for cat, t in by_cat.most_common():
        print(f"  {cat:35s} {t*1e3/iters:9.2f} ms  ({100*t/total:5.1f}%)")
    print(f"\n== top {topn} ops ==")
    for (cat, op), t in by_op.most_common(topn):
        n = op_count[(cat, op)]
        print(f"  {t*1e3/iters:9.3f} ms  x{n//iters:<5d} [{cat}] {op[:110]}")
        if detail:
            rec = op_stats.get((cat, op), {})
            for k in ("tf_op", "source", "source_info", "hlo_expression",
                      "memory_bandwidth", "bytes_accessed", "flops",
                      "long_name", "provenance"):
                if k in rec:
                    print(f"      {k}: {rec[k][:200]}")
            extra = {k: v for k, v in rec.items()
                     if k not in ("tf_op", "source", "source_info",
                                  "hlo_expression", "memory_bandwidth",
                                  "bytes_accessed", "flops", "long_name",
                                  "provenance")}
            if extra:
                print(f"      stats: {str(extra)[:220]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--nms-impl", default="exact",
                   choices=("exact", "maxpool", "hybrid", "pallas"))
    p.add_argument("--teacher-pre", type=int, default=-1)
    p.add_argument("--teacher-post", type=int, default=-1)
    p.add_argument("--keep", default=None, help="keep trace dir at this path")
    p.add_argument("--detail", action="store_true",
                   help="print every stat the runtime attached to each top op "
                        "(source scope, bytes, flops) — the attribution view")
    args = p.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    canvas, depth, amp = (608, 1216), 16, True
    budgets = (12000, 2000, 512, 512, 100)
    mutual, state, (limg, lgt, uimg) = bench.build(
        args.batch, canvas, depth, amp, budgets, args.nms_impl,
        args.teacher_pre, args.teacher_post)
    key = jax.random.key(0)

    tracedir = args.keep or tempfile.mkdtemp(prefix="ptprof_")
    t0 = time.perf_counter()
    capture(mutual, state, (limg, lgt, uimg, key), args.iters, tracedir)
    print(f"wall: {(time.perf_counter()-t0)/args.iters*1e3:.1f} ms/iter (incl warmup fetch)")
    parse_xplane(tracedir, iters=args.iters, detail=args.detail)
    if not args.keep:
        import shutil
        shutil.rmtree(tracedir, ignore_errors=True)


if __name__ == "__main__":
    main()
