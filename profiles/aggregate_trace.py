"""Aggregate a jax.profiler trace (trace.json.gz) into per-op/per-category
device-time tables. Usage: python profiles/aggregate_trace.py profiles/l1024_r3
"""

import collections
import glob
import gzip
import json
import re
import sys


def main(root):
    paths = glob.glob(f"{root}/plugins/profile/*/*.trace.json.gz")
    assert paths, f"no trace under {root}"
    with gzip.open(paths[0]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    dev_pids = {
        e["pid"] for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in e.get("args", {}).get("name", "")
    }
    dev = [e for e in ev
           if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e]
    # each op appears once per traced run; count runs from the top-level jit
    runs = max(1, sum(1 for e in dev if e["name"].startswith("jit_")))

    cat = collections.Counter()
    agg = collections.defaultdict(lambda: [0, 0, "", ""])
    for e in dev:
        a = e.get("args", {})
        nm, c = e["name"], a.get("hlo_category", "(none)")
        if nm.startswith("jit_"):
            continue
        cat[c] += e["dur"]
        agg[nm][0] += e["dur"]
        agg[nm][1] += 1
        agg[nm][2] = c
        agg[nm][3] = a.get("long_name", "")

    print(f"runs: {runs}\nper-run totals by HLO category:")
    for c, d in cat.most_common(12):
        print(f"{d / runs / 1e3:9.1f} ms/run  {c}")
    print("\ntop ops:")
    for nm, (d, n, c, ln) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]:
        shape = re.match(r"%\S+ = (\S+)", ln)
        shape = shape.group(1)[:60] if shape else ""
        print(f"{d / runs / 1e3:8.1f} ms/run  {c[:22]:22s} {nm[:24]:24s} {shape}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "profiles/l1024_r3")
