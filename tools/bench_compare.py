"""Compare a bench run against the recorded per-query baseline floor.

Usage:
    python bench.py | tail -1 > /tmp/bench.json
    python tools/bench_compare.py /tmp/bench.json        # or pipe via stdin

Reads BENCH_BASELINE.json (round-1 driver numbers at sf0.1) and prints one
line per query: seconds, baseline seconds, ratio — flagging ratios above the
2.0x budget so regressions are detected per query, not by suite wall-clock
(machine-speed variance between rounds makes totals unreliable; ratios are
the signal).  Exit code 1 if any flagged query exists.
"""

from __future__ import annotations

import json
import os
import sys

BUDGET = 2.0


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH_BASELINE.json")) as fh:
        base = json.load(fh)["queries"]
    raw = (
        open(sys.argv[1]).read() if len(sys.argv) > 1 else sys.stdin.read()
    ).strip().splitlines()
    # the bench line is the last JSON-parseable line
    run = None
    for line in reversed(raw):
        try:
            run = json.loads(line)
            break
        except json.JSONDecodeError:
            continue
    if run is None:
        print("no JSON bench line found", file=sys.stderr)
        return 2
    flagged = []
    floorless = []
    for name, sec in run["queries"].items():
        b = base.get(name)
        if b is None:
            # a benched query with no floor is unguarded — hard error, so a
            # new entry can never ship guard-blind (round-9 verdict #1)
            print(f"  MISSING FLOOR  {name}: {sec:.2f}s (no baseline entry)")
            floorless.append(name)
            continue
        ratio = sec / b if b else float("inf")
        mark = "SLOW" if ratio > BUDGET else "ok"
        if ratio > BUDGET:
            flagged.append(name)
        print(f"  {mark:4}  {name}: {sec:.2f}s vs {b:.2f}s = {ratio:.2f}x")
    total_base = sum(v for k, v in base.items() if k in run["queries"])
    total_run = sum(v for k, v in run["queries"].items() if k in base)
    if total_base:
        print(f"comparable total: {total_run:.1f}s vs {total_base:.1f}s "
              f"= {total_run / total_base:.2f}x (budget {BUDGET}x per query)")
    if flagged:
        print("REGRESSIONS:", ", ".join(flagged))
    if floorless:
        print("FLOORLESS (add to BENCH_BASELINE.json):", ", ".join(floorless))
    return 1 if (flagged or floorless) else 0


if __name__ == "__main__":
    raise SystemExit(main())
