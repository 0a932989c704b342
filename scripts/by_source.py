"""Aggregate a jax.profiler perfetto trace by source line / op-name stem.

Usage: python scripts/by_source.py [trace_dir] [iters]
Prints top source lines and top tf_op stems by device time per iteration.
(Companion to trace_step.py, which runs `iters`=3 traced iterations.)
"""
import glob
import gzip
import json
import re
import sys
from collections import defaultdict

TRACE_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gigagan_trace"
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

files = sorted(glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True))
if not files:
    sys.exit(f"no trace files under {TRACE_DIR}")
with gzip.open(files[-1], "rt") as f:
    data = json.load(f)
events = data.get("traceEvents", [])

pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
device_pids = {p for p, n in pid_names.items()
               if "TPU" in n or "Device" in n or "/device" in n.lower()}

by_source = defaultdict(float)
cnt_source = defaultdict(int)
by_tfop = defaultdict(float)
cnt_tfop = defaultdict(int)
for e in events:
    if e.get("ph") != "X" or e.get("pid") not in device_pids:
        continue
    name = e.get("name", "?")
    if name.startswith("jit_") or re.fullmatch(r"\d+", name):
        continue
    dur = e.get("dur", 0) / 1e3  # ms
    args = e.get("args") or {}
    src = args.get("source", "<none>")
    src = src.replace("/root/repo/gigagan_tpu/", "")
    by_source[src] += dur
    cnt_source[src] += 1
    tf_op = args.get("tf_op", "")
    # last path component, stripped of trailing indices
    stem = tf_op.rsplit("/", 1)[-1].rstrip(":")
    stem = re.sub(r"[.\d]+$", "", stem)
    # include one level of context (module scope) for disambiguation
    parts = tf_op.rstrip(":").split("/")
    ctx = parts[-2] if len(parts) > 1 else ""
    ctx = re.sub(r"_\d+", "_*", ctx)
    key = f"{ctx}/{stem}"
    by_tfop[key] += dur
    cnt_tfop[key] += 1

print("== top source lines (ms/iter) ==")
for src, ms in sorted(by_source.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{ms / ITERS:9.2f}  x{cnt_source[src] // ITERS:<5d} {src}")
print("\n== top tf_op stems (ms/iter) ==")
for op, ms in sorted(by_tfop.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{ms / ITERS:9.2f}  x{cnt_tfop[op] // ITERS:<5d} {op[:100]}")
