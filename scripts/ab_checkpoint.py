"""Interleaved same-session A/B for localCheckpoint-based query changes:
variant "new" is the registered query as-is; variant "old" is the same
builder with DataFrame.localCheckpoint monkeypatched to a no-op, which
reconstructs the pre-checkpoint plan exactly.  ONLY valid for queries
whose checkpoints are all r12 additions (no pre-existing checkpoint the
patch would also remove) — check before trusting a reading.

Usage: python scripts/ab_checkpoint.py q1[,q2...] [reps] [--mode checkpoint|spread|persist]

--mode spread instead patches dedup.spread_small to a pass-through for the
"old" variant (valid only for queries whose ONLY spread is the r12
addition under test).
--mode persist patches DataFrame.persist to a no-op for the "old"
variant (valid only when the query's ONLY persist is the r12 addition).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Spark 4: the runtime class is pyspark.sql.classic.dataframe.DataFrame,
# which OVERRIDES localCheckpoint/persist — patching the pyspark.sql
# facade class is a silent no-op (discovered r12: every "old" variant
# built with the facade patch was identical to "new").  Patch the
# classic class.
from pyspark.sql.classic.dataframe import DataFrame

from tidb_spark.queries import all_queries
from tidb_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    mode = "checkpoint"
    if "--mode" in args:
        i = args.index("--mode")
        mode = args[i + 1]
        del args[i : i + 2]
    if mode not in ("checkpoint", "spread", "persist"):
        raise SystemExit(f"unknown --mode {mode!r} (checkpoint|spread|persist)")
    names = [n for n in args[0].split(",") if n]
    reps = int(args[1]) if len(args) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-checkpoint", **{"spark.ui.showConsoleProgress": "false"})
    reg = all_queries()
    real_lc = DataFrame.localCheckpoint

    def noop_lc(self, eager=True):
        return self

    import tidb_spark.data.dedup as dd

    real_spread = dd.spread_small

    def noop_spread(df, key, **kw):
        return df

    real_persist = DataFrame.persist

    def noop_persist(self, *a, **kw):
        return self

    for name in names:
        q = reg[name]

        def build(variant):
            if mode == "spread":
                dd.spread_small = noop_spread if variant == "old" else real_spread
            elif mode == "persist":
                DataFrame.persist = (
                    noop_persist if variant == "old" else real_persist
                )
            else:
                DataFrame.localCheckpoint = (
                    noop_lc if variant == "old" else real_lc
                )
            try:
                return q.spark(spark, sf_dir)
            finally:
                DataFrame.localCheckpoint = real_lc
                dd.spread_small = real_spread
                DataFrame.persist = real_persist

        a = sorted(map(tuple, build("old").collect()))
        b = sorted(map(tuple, build("new").collect()))
        print(f"{name}: rows old={len(a)} new={len(b)} equal={a == b}", flush=True)
        times = {"old": [], "new": []}
        for variant in ("old", "new"):
            build(variant).write.mode("overwrite").format("noop").save()
        for r in range(reps):
            for variant in ("old", "new") if r % 2 == 0 else ("new", "old"):
                spark.sparkContext.setJobDescription(f"ab:{name}:{variant}:{r}")
                t0 = time.perf_counter()
                build(variant).write.mode("overwrite").format("noop").save()
                times[variant].append(round(time.perf_counter() - t0, 3))
            dd.release_cached()
        for v, ts in times.items():
            print(f"{name} {v}: best={min(ts)} all={ts}", flush=True)


if __name__ == "__main__":
    main()
