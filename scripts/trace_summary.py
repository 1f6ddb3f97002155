"""Summarize a jax.profiler trace: device time by HLO category + achieved HBM
bandwidth per category.

Usage:
  python scripts/trace_summary.py /tmp/jaxtrace [steps]

where the trace dir was produced by jax.profiler.start_trace()/stop_trace()
around `steps` identical iterations (default 3).  Prints ms/step, op counts
and GB/s per category -- the quickest way to tell whether a step is
bandwidth-, MXU-, or latency-bound.
"""

import collections
import glob
import gzip
import json
import sys


def main() -> None:
    root = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    paths = sorted(glob.glob(f"{root}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        sys.exit(f"no trace.json.gz under {root}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")

    cat_t = collections.Counter()
    cat_b = collections.Counter()
    cat_n = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "TPU" not in pids.get(e.get("pid"), ""):
            continue
        a = e.get("args") or {}
        cat = a.get("hlo_category")
        if cat is None or cat == "while":  # 'while' double-counts its body
            continue
        cat_t[cat] += int(a.get("device_duration_ps", 0)) / 1e12
        cat_b[cat] += int(a.get("bytes_accessed", 0))
        cat_n[cat] += 1

    total = sum(cat_t.values())
    print(f"device time: {total / steps * 1e3:.1f} ms/step "
          f"(excl. while wrappers, {steps} steps)")
    print(f"{'ms/step':>9} {'ops':>7} {'GB/s':>7}  category")
    for cat, t in cat_t.most_common():
        if t / steps < 1e-5:
            continue
        bw = cat_b[cat] / t / 1e9 if t else 0.0
        print(f"{t / steps * 1e3:9.1f} {cat_n[cat] // steps:7d} {bw:7.0f}  {cat}")


if __name__ == "__main__":
    main()
