#!/usr/bin/env python3
"""Diff two debug traces (Tools/compareTraces analogue).

  python tools/compare_traces.py /tmp/run_gpu /tmp/run_ref [--top 20]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_tpu.obs.trace import compare_traces, print_compare


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_a")
    ap.add_argument("trace_b")
    ap.add_argument("--top", type=int, default=0, help="show only worst N")
    args = ap.parse_args()

    diffs = compare_traces(args.trace_a, args.trace_b)
    if args.top:
        diffs = sorted(diffs, key=lambda d: -d.max_abs_diff)[: args.top]
    print(print_compare(diffs))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
