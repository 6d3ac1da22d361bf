#!/usr/bin/env python
"""Summarize a jax.profiler trace: device-op time by category/shape/op.

``jax.profiler.trace(dir)`` works through the axon TPU relay and yields a
real ``/device:TPU:0`` lane with per-fusion device times (r3 finding —
see PERF_NOTES.md).  This tool aggregates the ``vm.trace.json.gz`` it
writes:

    python scripts/analyze_trace.py /tmp/probe/trace_dir [n_steps]

``n_steps`` (default 1) divides totals into per-step numbers when the
traced region ran that many identical steps.  The ``long_name`` field of
each event carries the HLO shape INCLUDING the chosen layout/tiling
(e.g. ``bf16[8,384,1280,16]{3,0,2,1:T(8,128)(2,1)}`` — C on the
128-lane minor dim = 8x physical padding), which is how the r3 layout
problems were found.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import sys


def load_events(trace_dir: str):
    files = sorted(
        glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    )
    if not files:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    data = json.load(gzip.open(files[-1]))
    events = data.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"]["name"]
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    return events, pids


def summarize(trace_dir: str, n_steps: int = 1, top: int = 25):
    events, pids = load_events(trace_dir)
    cat = collections.Counter()
    cat_n = collections.Counter()
    shape = collections.Counter()
    op = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if not pids.get(e["pid"], "").startswith("/device"):
            continue
        name = e.get("name", "")
        args = e.get("args", {})
        # skip the whole-program wrapper events (jit_<fn> and bare step
        # indices) so op-level numbers don't double count
        if name.startswith("jit_") or name.isdigit():
            continue
        dur = e.get("dur", 0)
        total += dur
        c = args.get("hlo_category", "?")
        cat[c] += dur
        cat_n[c] += 1
        op[name] += dur
        m = re.match(r"%\S+ = \(?(\w+\[[\d,]*\])", args.get("long_name", ""))
        if m:
            shape[m.group(1)] += dur

    k = 1e3 * n_steps
    print(f"device op time: {total / k:.2f} ms/step over "
          f"{sum(cat_n.values()) // n_steps} ops")
    print("\n== by hlo_category ==")
    for name, v in cat.most_common():
        print(f"{v / k:9.2f} ms  x{cat_n[name] / n_steps:7.1f}  {name}")
    print(f"\n== top {top} ops ==")
    for name, v in op.most_common(top):
        print(f"{v / k:9.2f} ms  {name[:90]}")
    print(f"\n== top {top} output shapes ==")
    for name, v in shape.most_common(top):
        print(f"{v / k:9.2f} ms  {name}")


if __name__ == "__main__":
    summarize(
        sys.argv[1],
        int(sys.argv[2]) if len(sys.argv) > 2 else 1,
        int(sys.argv[3]) if len(sys.argv) > 3 else 25,
    )
