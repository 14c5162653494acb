"""Join a device profile trace with compiled-HLO source metadata.

``tools_profile.py`` prints top device ops by time, but XLA fusion names
(``fusion.1097``) are opaque. This tool re-aggregates the same trace BY
SOURCE LOCATION: it parses the optimized HLO (``jit(...).lower().compile()
.as_text()``) to map each top-level instruction name to the op_name /
source_file:line recorded in its metadata, then attributes each trace
event's device time to that location. Fused computations are attributed to
the fusion root's metadata (the representative op XLA chose).

Usage:
  python tools_profile_annotate.py --trace-dir /tmp/vwtpu_trace_xxx \
      --hlo /tmp/flagship_hlo.txt [--iters 4] [--top 40] [--by file|line|op]
"""

import argparse
import glob
import gzip
import json
import os
import re
from collections import defaultdict


def load_trace(trace_dir: str):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(max(paths, key=os.path.getmtime)) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    device_pids = set()
    for e in ev:
        if (e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))):
            device_pids.add(e["pid"])
    total = defaultdict(float)
    count = defaultdict(int)
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            total[e["name"]] += e.get("dur", 0.0)
            count[e["name"]] += 1
    return total, count


_INSTR = re.compile(r"^\s+(?:ROOT\s+)?%([\w.\-]+) = .*?"
                    r"metadata=\{(.*?)\}", re.S)
_META_OP = re.compile(r'op_name="([^"]*)"')
_META_FILE = re.compile(r'source_file="([^"]*)"')
_META_LINE = re.compile(r'source_line=(\d+)')


def load_hlo_map(hlo_path: str):
    """instruction name -> (op_name, file, line) from optimized HLO text."""
    out = {}
    with open(hlo_path) as f:
        for line in f:
            m = re.match(r"\s+(?:ROOT\s+)?%([\w.\-]+) = ", line)
            if not m:
                continue
            name = m.group(1)
            meta = re.search(r"metadata=\{([^}]*)\}", line)
            if not meta:
                continue
            mm = meta.group(1)
            op = _META_OP.search(mm)
            fl = _META_FILE.search(mm)
            ln = _META_LINE.search(mm)
            out[name] = (op.group(1) if op else "",
                         fl.group(1) if fl else "",
                         int(ln.group(1)) if ln else 0)
    return out


def short_op(op_name: str, depth: int = 3) -> str:
    parts = [p for p in op_name.split("/") if p]
    return "/".join(parts[-depth:]) if parts else op_name


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", required=True)
    ap.add_argument("--hlo", required=True)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--by", choices=["file", "line", "op"], default="line")
    args = ap.parse_args()

    total, count = load_trace(args.trace_dir)
    hmap = load_hlo_map(args.hlo)

    agg = defaultdict(float)
    aggc = defaultdict(int)
    unattributed = 0.0
    for name, us in total.items():
        if name.startswith("jit_"):     # whole-program parent event
            continue
        meta = hmap.get(name)
        if meta is None:
            # trace names may drop the %; try stripping a trailing
            # ".N" remat suffix mismatch
            meta = hmap.get(name.split("{")[0])
        if meta is None:
            unattributed += us
            key = f"<unattributed> {name[:60]}"
            agg[key] += us
            aggc[key] += count[name]
            continue
        op, fl, ln = meta
        fl = fl.replace("/root/repo/", "")
        if args.by == "file":
            key = fl or "<nofile>"
        elif args.by == "line":
            key = f"{fl}:{ln}  {short_op(op)}"
        else:
            key = short_op(op, 5)
        agg[key] += us
        aggc[key] += count[name]
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    tot = sum(agg.values())
    print(f"{'ms/iter':>9}  {'%':>5}  {'calls':>6}  location")
    for key, us in rows[:args.top]:
        print(f"{us/1e3/args.iters:9.3f}  {100*us/tot:5.1f}  "
              f"{aggc[key]:6d}  {key[:140]}")
    print(f"total attributed device time: {tot/1e3/args.iters:.2f} ms/iter")


if __name__ == "__main__":
    main()
