"""Aggregate a jax.profiler trace.json.gz by op name: total device-time
per op, sorted. Usage: python benchmarks/analyze_trace.py /tmp/xp_wave
"""
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path


def main():
    root = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/xp_wave")
    traces = list(root.rglob("*.trace.json.gz"))
    if not traces:
        raise SystemExit(f"no trace.json.gz under {root}")
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pid whose name mentions TPU/device; fall back to all X events
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        agg[name] += dur
        cnt[name] += 1
        total += dur
    print(f"pids: { {p: pid_names.get(p, '?') for p in (dev_pids or set())} }")
    print(f"total device ms (sum of events, may double-count nesting): {total:.1f}")
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    for name, ms in rows:
        print(f"{ms:9.2f} ms  x{cnt[name]:<6} {name[:110]}")


main()
