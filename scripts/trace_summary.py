"""Summarize a jax.profiler trace: top ops by total device time.

    python scripts/trace_summary.py [trace_dir] [top_n]

trace_dir defaults to artifacts/trace_grad; the NEWEST run under
plugins/profile/ is used.  Aggregates Trace Viewer complete events from
the TPU op tracks by (sanitized) op name so repeated while_loop iterations
sum up, and prints a total + top-N table to stderr-free stdout.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys


def load_latest(trace_dir: str) -> dict:
    runs = sorted(glob.glob(os.path.join(trace_dir, "plugins/profile/*")))
    if not runs:
        raise SystemExit(f"no profile runs under {trace_dir}")
    files = glob.glob(os.path.join(runs[-1], "*.trace.json.gz"))
    if not files:
        raise SystemExit(f"no trace.json.gz in {runs[-1]}")
    with gzip.open(files[0], "rt") as f:
        return json.load(f), runs[-1]


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "artifacts/trace_grad"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    data, run = load_latest(trace_dir)
    events = data.get("traceEvents", [])

    # map pid/tid -> track name to keep only device (TPU) op tracks
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")

    def is_device_op_track(pid, tid):
        # leaf ops only — "XLA Modules" / "Steps" are containers that would
        # double-count everything under them
        pn = pid_names.get(pid, "")
        tn = names.get((pid, tid), "")
        return ("TPU" in pn or "/device" in pn.lower()) and tn == "XLA Ops"

    agg = {}
    total = 0.0
    span_lo, span_hi = float("inf"), 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if not is_device_op_track(e["pid"], e["tid"]):
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = re.sub(r"[.\d]+$", "", e["name"])  # strip trailing op ids
        a = agg.setdefault(name, [0.0, 0])
        a[0] += dur
        a[1] += 1
        total += dur
        ts = e.get("ts", 0)
        span_lo = min(span_lo, ts)
        span_hi = max(span_hi, ts + e.get("dur", 0))

    print(f"run: {run}")
    print(f"device op tracks total: {total:.2f} ms busy "
          f"(span {max(0.0,(span_hi-span_lo))/1e3:.2f} ms)")
    print(f"{'op':60s} {'ms':>10s} {'count':>7s} {'%':>6s}")
    for name, (ms, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top_n]:
        print(f"{name[:60]:60s} {ms:10.2f} {cnt:7d} {100*ms/max(total,1e-9):6.1f}")


if __name__ == "__main__":
    main()
