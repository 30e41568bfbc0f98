#!/usr/bin/env python3
"""Collect bench JSON lines into a TSV summary (Tools/PerfSummary analogue).

  python tools/perf_summary.py BENCH_r*.json runs/*.json > summary.tsv
"""

import json
import sys


def main() -> int:
    rows = []
    for path in sys.argv[1:]:
        try:
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        d = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if "metric" in d:
                        rows.append((path, d))
        except OSError:
            continue

    print("source\tmetric\tvalue\tunit\tvs_baseline")
    for path, d in rows:
        print(
            f"{path}\t{d.get('metric')}\t{d.get('value')}\t"
            f"{d.get('unit')}\t{d.get('vs_baseline')}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
