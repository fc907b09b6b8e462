"""Interleaved A/B for the bench prewarm scale (r13): does prewarming a
query at sf0.01 (the JIT-phantom fix) instead of sf0.001 change the
TIMED sf0.1 reading itself (e.g. by leaving GC/storage debt), beyond
removing first-run JIT latency?

For each query: alternate [prewarm@A, gc, time] / [prewarm@B, gc+quiesce,
time] rounds in one session, ABAB..., so host drift hits both arms
equally.  Prints one JSON line per query with both series.

Usage: python scripts/prewarm_ab.py q1,q2,... [--rounds N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from tidb_spark.queries import all_queries  # noqa: E402
from tidb_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    rounds = 3
    args = sys.argv[2:]
    if len(args) == 2 and args[0] == "--rounds":
        rounds = int(args[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "tidb-spark-prewarm-ab", **{"spark.ui.showConsoleProgress": "false"}
    )
    bench.warmup(spark, sf_dir)
    registry = all_queries()
    jvm = spark.sparkContext._jvm
    cbean = jvm.java.lang.management.ManagementFactory.getCompilationMXBean()

    def quiesce(max_wait: float = 2.0) -> None:
        deadline = time.perf_counter() + max_wait
        last = cbean.getTotalCompilationTime()
        while time.perf_counter() < deadline:
            time.sleep(0.1)
            cur = cbean.getTotalCompilationTime()
            if cur == last:
                return
            last = cur

    arms = {"a_sf001": "/root/testdata/sf0.001", "b_sf01": "/root/testdata/sf0.01"}
    for name in names:
        q = registry[name]
        series: dict[str, list[float]] = {k: [] for k in arms}
        for _ in range(rounds):
            for arm, pdir in arms.items():
                try:
                    q.spark(spark, pdir).write.mode("overwrite").format(
                        "noop"
                    ).save()
                except Exception as e:
                    print(f"# prewarm failed {name}@{arm}: {e!r}", file=sys.stderr)
                quiesce()
                jvm.System.gc()
                t0 = time.perf_counter()
                q.spark(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                series[arm].append(round(time.perf_counter() - t0, 4))
        print(
            json.dumps(
                {
                    "query": name,
                    **{k: v for k, v in series.items()},
                    **{f"min_{k}": min(v) for k, v in series.items()},
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
