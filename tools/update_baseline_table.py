"""Append the round-10 baseline table to BASELINE.md from N sweep
JSONs: per-query MEDIAN across the sweeps, stalls included (the
VERDICT r9 #2 protocol -- no standalone best-of-N patching).

    python tools/update_baseline_table.py sweep1.json [sweep2.json ...]

Prints the table body to stdout (the caller appends it to BASELINE.md
with its preamble); does NOT modify BASELINE.md itself.
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> int:
    sweeps = [json.load(open(p))["queries"] for p in sys.argv[1:]]
    # Union names across ALL sweeps in first-seen order (ADVICE r10:
    # taking sweeps[0]'s keys silently dropped queries present only in
    # later sweeps), and warn when a query is missing from some sweep
    # so a short-count median is visible, not silent.
    names: list[str] = []
    seen: set[str] = set()
    for s in sweeps:
        for n in s:
            if n not in seen:
                seen.add(n)
                names.append(n)
    rows = []
    for n in names:
        vals = [s[n] for s in sweeps if n in s]
        if len(vals) < len(sweeps):
            print(f"warning: {n} present in only {len(vals)}/"
                  f"{len(sweeps)} sweeps", file=sys.stderr)
        rows.append((n, round(statistics.median(vals), 3)))
    print("| query | sec |")
    print("| --- | --- |")
    for n, v in rows:
        print(f"| {n} | {v} |")
    total = round(sum(v for _, v in rows), 3)
    print(f"\nmedian-table total: {total}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
