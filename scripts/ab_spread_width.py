"""Interleaved same-session A/B for the r13 spread_small width change:
variant "old" monkeypatches dedup.spread_small back to the pre-r13
unconditional full-core fan-out; variant "new" is the shipped
size-derived width (size / _SPREAD_BYTES_PER_TASK capped at
defaultParallelism).  Identity-checks the first four queries at sf0.01,
then interleaves timed reps at sf0.1 with cache flush + GC between
readings.

Usage: python scripts/ab_spread_width.py q1[,q2...] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tidb_spark.data.dedup as dd
from tidb_spark.queries import all_queries
from tidb_spark.session import get_spark


def old_spread(df, *keys):
    """Pre-r13 behavior: any small input fans to every core."""
    spark = df.sparkSession
    sc = spark.sparkContext
    size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    if size >= (1 << 60):
        parts = df.rdd.getNumPartitions()
    else:
        mpb = dd._parse_byte_size(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        ) or (128 << 20)
        parts = max(1, (size + mpb - 1) // mpb)
    if parts < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism, *keys)
    return df


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("ab-spread-width", **{"spark.ui.showConsoleProgress": "false"})
    reg = all_queries()
    new_spread = dd.spread_small
    for nm in names[:4]:
        dd.spread_small = old_spread
        a = sorted(map(tuple, reg[nm].spark(spark, "/root/testdata/sf0.01").collect()))
        dd.spread_small = new_spread
        b = sorted(map(tuple, reg[nm].spark(spark, "/root/testdata/sf0.01").collect()))
        print(nm, "identity", "OK" if a == b else "MISMATCH", flush=True)
        if a != b:
            raise SystemExit(1)
    for nm in names:
        for v in (old_spread, new_spread):
            dd.spread_small = v
            reg[nm].spark(spark, "/root/testdata/sf0.01").write.mode(
                "overwrite"
            ).format("noop").save()
    res: dict[str, dict[str, list[float]]] = {}
    for rep in range(reps):
        for nm in names:
            for tag, v in (("old", old_spread), ("new", new_spread)):
                dd.spread_small = v
                dd.release_cached()
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                reg[nm].spark(spark, "/root/testdata/sf0.1").write.mode(
                    "overwrite"
                ).format("noop").save()
                res.setdefault(nm, {}).setdefault(tag, []).append(
                    time.perf_counter() - t0
                )
    dd.spread_small = new_spread
    print(f"{'query':24s} {'old best/mean':>14s} {'new best/mean':>14s}")
    for nm in names:
        o, n = res[nm]["old"], res[nm]["new"]
        print(
            f"{nm:24s} {min(o):6.2f}/{sum(o) / len(o):5.2f} "
            f"{min(n):6.2f}/{sum(n) / len(n):5.2f}"
        )


if __name__ == "__main__":
    main()
