"""Summarize a jax.profiler trace: ms/step by HLO category, source line, op.

Usage: python scripts/parse_profile.py /tmp/jaxtrace [steps_in_trace]

Pairs with scripts/profile_train.py (which traces 5 steps by default). Reads
the Chrome trace (<dir>/plugins/profile/*/*.trace.json.gz) directly — no
tensorboard required; the XLA Ops track carries per-op device durations,
`hlo_category`, and the Python source line each op was traced from.
"""

import collections
import glob
import gzip
import json
import sys


def load_ops(trace_dir: str):
    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(paths)[-1]) as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    # locate the device "XLA Ops" track
    xla_ops = {
        (e["pid"], e["tid"])
        for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and e["args"].get("name") == "XLA Ops"
    }
    return [e for e in events if (e.get("pid"), e.get("tid")) in xla_ops and e.get("ph") == "X"]


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    steps = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0
    ops = load_ops(trace_dir)
    total = sum(e["dur"] for e in ops)
    print(f"{len(ops)} device op events; {total / steps / 1e3:.2f} ms/step\n")

    for key, title, top in (
        (lambda a: a.get("hlo_category", "?"), "by hlo_category", 12),
        (lambda a: a.get("source", "?"), "by source line", 25),
        (None, "by op name", 20),
    ):
        agg = collections.Counter()
        for e in ops:
            agg[key(e.get("args", {})) if key else e["name"]] += e["dur"]
        print(f"=== {title} (ms/step) ===")
        for k, v in agg.most_common(top):
            print(f"{v / steps / 1e3:8.2f}  {k}")
        print()


if __name__ == "__main__":
    main()
