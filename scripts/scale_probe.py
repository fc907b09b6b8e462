"""Quiet-window scale probe for the top-cost query families.

Runs named registry queries against a scale fixture dir (see
``gen_scale.py``) with N reps each, recording every rep's wall so the
artifact carries the spread, plus the same three fixed control probes
``bench.py`` uses so host noise is attributable in-run.

Usage: python scripts/scale_probe.py SF_DIR QUERY[,QUERY...] [reps] [out.json]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    out = sys.argv[4] if len(sys.argv) > 4 else None

    from bench import _run_controls  # same fixed control probes as bench.py
    from tidb_spark.queries import all_queries
    from tidb_spark.session import get_spark

    spark = get_spark(
        "tidb-spark-scale-probe",
        **{"spark.ui.showConsoleProgress": "false"},
    )
    reg = all_queries()
    controls_start = _run_controls(spark)
    results: dict[str, dict] = {}
    for name in names:
        q = reg[name]
        # Exact-plan JIT prewarm at toy scale, same as bench.py, so the
        # recorded reps are warm-throughput numbers.  A failed prewarm is
        # NOT silent (r11 ADVICE): rep 0 would then carry cold-JVM JIT
        # cost that the artifact would report as a warm best — print the
        # cause and flag the result row so cross-round diffs can see it.
        prewarmed = True
        try:
            q.spark(spark, "/root/testdata/sf0.001").write.mode(
                "overwrite"
            ).format("noop").save()
        except Exception as e:
            prewarmed = False
            print(f"PREWARM FAILED for {name}: {e!r}", file=sys.stderr, flush=True)
        walls = []
        for r in range(reps):
            # The dedup/similarity entries persist() intermediates and
            # never unpersist (the frames die with the query's session in
            # normal use); dropping them between reps keeps executor
            # memory identical for every rep instead of letting earlier
            # reps' cache evict/spill later ones at probe scale.
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.monotonic()
            df = q.spark(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            walls.append(round(time.monotonic() - t0, 4))
            print(f"{name} rep{r}: {walls[-1]}s", flush=True)
        results[name] = {
            "walls": walls, "best": min(walls), "prewarmed": prewarmed,
        }
    controls_end = _run_controls(spark)
    payload = {
        "sf_dir": sf_dir,
        "reps": reps,
        "queries": results,
        "controls": {"start": controls_start, "end": controls_end},
    }
    print(json.dumps(payload))
    if out:
        with open(out, "w") as f:
            json.dump(payload, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
