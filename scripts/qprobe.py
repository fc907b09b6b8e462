"""Per-query optimization probe (r12): isolate one or more registered
queries and break their wall time into the pieces the optimization guide
says to separate (§1): Python DataFrame construction, Catalyst
analysis+optimization+physical planning, and execution via the noop sink
(§1.4).  Optionally dumps `explain("formatted")` to a file per query.

Usage:
  python scripts/qprobe.py q1,q2,... [--sf DIR] [--reps N] [--plans OUTDIR] [--suffix S]

Runs in ONE session (like bench.py) with the same warmup posture:
each query is prewarmed at sf0.001 first so readings are warm
throughput, not JIT.  Prints one JSON line per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tidb_spark.queries import all_queries
from tidb_spark.session import get_spark


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    plans_dir = None
    suffix = "before"
    args = sys.argv[2:]
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--plans":
            plans_dir = args[i + 1]; i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]; i += 2
        else:
            raise SystemExit(f"unknown arg {args[i]}")

    spark = get_spark(
        "tidb-spark-qprobe", **{"spark.ui.showConsoleProgress": "false"}
    )
    registry = all_queries()
    prewarm_dir = "/root/testdata/sf0.001"
    for name in names:
        q = registry[name]
        spark.sparkContext.setJobDescription(f"qprobe:{name}")
        # prewarm: same plan shape at toy scale (JIT/codegen, bench.py's
        # per-query posture) — twice, the second run also warms any
        # session-cached shared state at the probe scale.
        try:
            q.spark(spark, prewarm_dir).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception as e:
            print(f"# prewarm failed for {name}: {e!r}", file=sys.stderr)
        rows = []
        for r in range(reps):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            df = q.spark(spark, sf_dir)
            t1 = time.perf_counter()
            # force analysis+optimization+physical planning without execution
            _ = df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t3 = time.perf_counter()
            rows.append(
                {
                    "build": round(t1 - t0, 4),
                    "plan": round(t2 - t1, 4),
                    "exec": round(t3 - t2, 4),
                    "wall": round(t3 - t0, 4),
                }
            )
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = q.spark(spark, sf_dir)
            with open(
                os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w"
            ) as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
        best = min(rows, key=lambda r: r["wall"])
        print(json.dumps({"query": name, "best": best, "reps": rows}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
