#!/usr/bin/env python
"""Distill an XProf capture (MASP_PROFILE dir) into a committable occupancy
summary: device-busy fraction over the profiled window, the gap histogram,
and the top device ops by self time. Raw captures are ~1 GB and stay out of
git; this summary is the in-tree occupancy artifact.

Usage: python tools/xprof_summary.py <profile_dir> [out_md]
"""

import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path


def find_trace(profile_dir: Path) -> Path:
    traces = sorted(profile_dir.rglob("*.trace.json.gz"))
    if not traces:
        raise SystemExit(f"no .trace.json.gz under {profile_dir}")
    return traces[-1]


def main():
    profile_dir = Path(sys.argv[1])
    out_md = Path(sys.argv[2]) if len(sys.argv) > 2 else None
    trace_path = find_trace(profile_dir)
    with gzip.open(trace_path) as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data

    # identify the device pid and its thread names
    thread_names = {}
    device_pid = None
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "TPU" in e["args"].get("name", ""):
                device_pid = e["pid"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e["pid"], e.get("tid"))] = e["args"]["name"]
    if device_pid is None:
        raise SystemExit("no TPU process in trace")

    module_tid = next(
        (tid for (pid, tid), n in thread_names.items()
         if pid == device_pid and n == "XLA Modules"), None)
    ops_tid = next(
        (tid for (pid, tid), n in thread_names.items()
         if pid == device_pid and n == "XLA Ops"), None)

    modules = [e for e in events
               if e.get("ph") == "X" and e.get("pid") == device_pid
               and e.get("tid") == module_tid]
    ops = [e for e in events
           if e.get("ph") == "X" and e.get("pid") == device_pid
           and e.get("tid") == ops_tid]

    modules.sort(key=lambda e: e["ts"])
    t0 = modules[0]["ts"]
    t1 = max(e["ts"] + e["dur"] for e in modules)
    window = t1 - t0

    # busy time + gap histogram on the module timeline (module spans do not
    # overlap on a single core)
    busy = 0.0
    gaps = []
    prev_end = None
    per_module = defaultdict(float)
    module_calls = defaultdict(int)
    for e in modules:
        busy += e["dur"]
        per_module[e["name"]] += e["dur"]
        module_calls[e["name"]] += 1
        if prev_end is not None and e["ts"] > prev_end:
            gaps.append(e["ts"] - prev_end)
        prev_end = max(prev_end or 0, e["ts"] + e["dur"])

    gap_total = sum(gaps)
    gaps.sort(reverse=True)

    per_op = defaultdict(float)
    op_calls = defaultdict(int)
    for e in ops:
        key = e["name"].split(".")[0]
        per_op[key] += e["dur"]
        op_calls[key] += 1
    op_rows = sorted(per_op.items(), key=lambda kv: -kv[1])[:20]

    lines = []
    lines.append(f"# XProf occupancy summary — {profile_dir.name}")
    lines.append("")
    lines.append(f"Source capture: `{trace_path}` (not committed; ~1 GB). "
                 f"Regenerate with `MASP_PROFILE={profile_dir} python bench.py`"
                 " and re-run this tool.")
    lines.append("")
    lines.append(f"- profiled window: **{window/1e6:.3f} s**")
    lines.append(f"- device busy (XLA module spans): **{busy/1e6:.3f} s** = "
                 f"**{100*busy/window:.1f}% occupancy**")
    lines.append(f"- idle: {gap_total/1e6:.3f} s across {len(gaps)} gaps; "
                 f"top gaps (ms): "
                 + ", ".join(f"{g/1e3:.1f}" for g in gaps[:10]))
    lines.append("")
    lines.append("## Device time by XLA module")
    lines.append("")
    lines.append("| module | calls | total s | % of window |")
    lines.append("|---|---|---|---|")
    for name, dur in sorted(per_module.items(), key=lambda kv: -kv[1])[:15]:
        lines.append(f"| {name[:60]} | {module_calls[name]} | "
                     f"{dur/1e6:.3f} | {100*dur/window:.1f}% |")
    lines.append("")
    lines.append("## Top device ops (self time)")
    lines.append("")
    lines.append("| op | calls | total s |")
    lines.append("|---|---|---|")
    for name, dur in op_rows:
        lines.append(f"| {name[:60]} | {op_calls[name]} | {dur/1e6:.3f} |")
    lines.append("")
    text = "\n".join(lines)
    print(text)
    if out_md:
        out_md.write_text(text + "\n")
        print(f"\nwrote {out_md}", file=sys.stderr)


if __name__ == "__main__":
    main()
