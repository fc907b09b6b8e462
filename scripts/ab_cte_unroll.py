"""Interleaved same-session A/B: cte_recursive driver-side fixpoint loop
(registered) vs a depth-bounded linear unroll that keeps frontier pruning
in-plan (3 step-joins + dedups + anti-joins, one adaptive execution, no
round-boundary count jobs).

The unroll is only legal because the recursion is structurally bounded
(`depth < 3` inside the step): round count is NOT data-dependent upward,
so no convergence probe is needed.  Unlike the graph_any_cheapest unroll
(reverted r13: it switched to full relaxation), this keeps the pruned
frontier dataflow identical — only the materialization boundaries differ.

Usage: python scripts/ab_cte_unroll.py [reps] [--sf DIR]
Prints per-rep walls for both variants plus a row-identity check.
"""

from __future__ import annotations

import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from tidb_spark.queries import all_queries
from tidb_spark.session import get_spark


def unrolled(spark, sf_dir: str) -> DataFrame:
    from tidb_spark.catalog import graph_views, load_all

    tables = load_all(spark, sf_dir)
    e_knows = graph_views(tables)["e_knows"].localCheckpoint(eager=False)
    seed = (
        tables["customer"]
        .where(F.col("c_custkey") < 5)
        .select(F.col("c_custkey").alias("id"), F.lit(0).alias("depth"))
    )
    levels = [seed]
    seen = seed.select("id")
    frontier = seed
    for _ in range(3):  # depth guard: step filters depth < 3
        nxt = (
            frontier.where(F.col("depth") < 3)
            .join(e_knows, frontier["id"] == e_knows["src"])
            .select(F.col("dst").alias("id"), (F.col("depth") + 1).alias("depth"))
            .dropDuplicates(["id"])
            .join(seen, on="id", how="left_anti")
        )
        levels.append(nxt)
        seen = seen.unionByName(nxt.select("id"))
        frontier = nxt
    reach = reduce(lambda a, b: a.unionByName(b), levels)
    return (
        reach.groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_reached"))
        .orderBy("depth")
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    spark = get_spark("ab-cte-unroll", **{"spark.ui.showConsoleProgress": "false"})
    reg = all_queries()
    old = reg["cte_recursive"].spark

    # result identity first (both scales the fixture ships)
    for d in ("/root/testdata/sf0.01", sf_dir):
        a = sorted(map(tuple, old(spark, d).collect()))
        b = sorted(map(tuple, unrolled(spark, d).collect()))
        print(f"identity @{d}: {'OK' if a == b else 'MISMATCH'} rows={a}")
        if a != b:
            raise SystemExit(f"MISMATCH: {a} vs {b}")

    prewarm = "/root/testdata/sf0.01"
    for fn, tag in ((old, "loop"), (unrolled, "unroll")):
        fn(spark, prewarm).write.mode("overwrite").format("noop").save()

    def run(fn):
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        return t1 - t0, time.perf_counter() - t1

    for r in range(reps):
        for fn, tag in ((old, "loop"), (unrolled, "unroll")):
            b, e = run(fn)
            print(
                f"rep{r} {tag:7s} build={b:.3f} exec={e:.3f} wall={b + e:.3f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
