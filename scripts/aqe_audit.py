"""Corpus-wide AQE-coalescing audit (r9).

Round 9 found the same pathology twice (graph_common_neighbors 2.6→1.25 s,
dedup_semantic_ivf via its join shape): AQE coalesces a shuffle by its
MAP-OUTPUT size, but when the stage that READS the shuffle multiplies rows
(a self-join producing wedges/pairs, an explode), input-sized coalescing
serializes the expensive stage onto 1-2 tasks.  The fix is pinning that
exchange (REPARTITION_BY_NUM is exempt from coalescing) — but only where
the downstream stage actually expands, since pinning a genuinely small
exchange ADDS cost (measured: label propagation 3.2→3.6 s when pinned).

This script EXECUTES every registered query at sf0.1 (noop sink) and then
inspects the FINAL adaptive plan: it flags every `AQEShuffleRead coalesced`
whose reading stage contains a join or Generate(explode) above it — the
candidates for the pathology.  Flags are leads to MEASURE, not violations:
a coalesced read feeding a join is usually correct (that's AQE working);
it is only wrong when the join's output explodes.  The artifact records
each flag with the query's wall time so expensive queries with flagged
reads rise to the top for the next round's profiling.

Usage: python scripts/aqe_audit.py [out.json]   (default AQE_AUDIT.json)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_EXPANDER_RE = re.compile(
    r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|Generate|"
    r"CartesianProduct|BroadcastNestedLoopJoin"
)


def audit_plan(plan: str) -> list[dict]:
    """Flag coalesced AQE shuffle reads with an expanding operator above
    them IN THE SAME STAGE.  Tree text lists parents before children, so
    walking upward from the read visits its consumers; the first Exchange
    / ShuffleQueryStage passed going up is the boundary where this
    stage's output leaves for another stage — operators beyond it run
    under that exchange's own partitioning (possibly a pinned
    REPARTITION_BY_NUM: exactly the fix shape), so they must not count
    against this read.  Bounded to 12 lines as a same-subtree
    heuristic."""
    lines = plan.splitlines()
    flags = []
    for i, line in enumerate(lines):
        m = re.search(r"AQEShuffleRead.*coalesced", line)
        if not m:
            continue
        hits: list[str] = []
        for ln in reversed(lines[max(0, i - 12) : i]):
            if re.search(r"Exchange |ShuffleQueryStage|AQEShuffleRead", ln):
                break  # stage boundary — consumers beyond re-partition
            if _EXPANDER_RE.search(ln):
                hits.append(ln.strip()[:100])
        if hits:
            flags.append(
                {"read": line.strip()[:100], "expanders_above": hits[:2]}
            )
    return flags


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "AQE_AUDIT.json"
    from tidb_spark.queries import all_queries
    from tidb_spark.session import get_spark

    spark = get_spark(
        "tidb-spark-aqe-audit", **{"spark.ui.showConsoleProgress": "false"}
    )
    results: dict[str, dict] = {}
    n_flagged = 0
    for name, q in sorted(all_queries().items()):
        t = time.perf_counter()
        try:
            df = q.spark(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — record, keep auditing
            results[name] = {"error": str(exc)[:200]}
            continue
        secs = round(time.perf_counter() - t, 2)
        flags = audit_plan(plan)
        if flags:
            n_flagged += 1
            results[name] = {"secs": secs, "flags": flags}
    with open(out_path, "w") as fh:
        json.dump(
            {
                "sf_dir": SF_DIR,
                "n_queries": len(all_queries()),
                "n_flagged": n_flagged,
                "note": (
                    "flags are triage leads (coalesced read under an "
                    "expanding operator), not violations; see module doc"
                ),
                "queries": results,
            },
            fh,
            indent=1,
        )
    print(f"{len(all_queries())} queries audited, {n_flagged} flagged -> {out_path}")


if __name__ == "__main__":
    main()
