"""Regenerate COVERAGE.md's driver-check staleness table from the
CORRECTNESS_r0*.json artifacts + the live registry window.

Usage: python scripts/staleness_table.py   (prints the markdown table)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def latest_green() -> dict[str, int]:
    latest: dict[str, int] = {}
    # NB: r* not r0* — two-digit rounds (r10+) carry no leading zero.
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r0*(\d+)", path).group(1))
        data = json.load(open(path))
        rows = data.get("queries", data)
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            )
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> None:
    from tidb_spark.queries import _PRIORITY_WINDOW, all_queries

    qs = all_queries()
    latest = latest_green()
    this_round = max(latest.values()) + 1 if latest else 1
    window = set(_PRIORITY_WINDOW)
    print("| query | last driver check | r%d window |" % this_round)
    print("|---|---|---|")
    for name in sorted(qs):
        last = f"r{latest[name]}" if name in latest else "never"
        mark = f"r{this_round} (windowed)" if name in window else ""
        print(f"| {name} | {last} | {mark} |")
    stale = sorted(n for n in qs if n not in latest and n not in window)
    if stale:
        print(f"\nWARNING: never-checked AND not in window: {stale}")


if __name__ == "__main__":
    main()
