"""Root-cause probe for the in-sweep "JIT-switch phantom" (r12 verdict
item 1): deep in a 180+-query sweep the FIRST sf0.1 run of a plan reads
1.5-6x its isolated cost, and the immediate second run is fast again.

Two competing attributions, separated PER QUERY inside one session (so
hypervisor-neighbor noise — which sank the r13 cross-session flush A/B,
control factors 0.67-2.25 within single sweeps — cancels out):

  JIT hypothesis    run1 >> run2 AND run1's JVM total-compilation-time
                    delta is large (the C2 queue is busy with 180 other
                    plans' methods, so run1 executes at C1/interpreted
                    speed while its own compiles are queued).
  cache hypothesis  run2 is fast because run1 left persisted/SQL-cache
                    blocks; then run3 — which runs after a FULL cache
                    flush — re-slows back toward run1.

Per watch query, in its natural bench position within a full-corpus
sweep (prewarm + gc identical to bench.py):

  run1 (timed, jit/gc deltas) -> run2 (timed, deltas)
  -> flush caches -> run3 (timed, deltas)

run1/run2 sizes the phantom; run3/run2 sizes the cache contribution;
jit_delta(run1) vs the others attributes the JIT share.  Non-watch
queries run once, keeping the sweep's plan-churn realistic.

Usage: python scripts/phantom_probe.py [--out FILE]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (warmup + flush helpers)
from tidb_spark.queries import all_queries  # noqa: E402
from tidb_spark.session import get_spark  # noqa: E402

WATCH = [
    "agg_approx_sketches", "cte_recursive", "dedup_cluster",
    "dedup_ensemble_cluster", "dedup_lsh_verified", "dedup_minhash_lsh",
    "dedup_semantic_ivf", "dedup_semantic_kmeans", "dedup_simhash",
    "dedup_substring", "embedding_kmeans", "graph_any_cheapest",
    "graph_any_shortest", "graph_common_neighbors", "graph_kcore",
    "graph_label_propagation", "graph_wcc", "multimodal_mp4_demux",
    "mysqlsql_collation_ci", "sample_diversity", "sim_ivf_topk",
    "sim_pq_topk", "stream_session_30m", "text_boilerplate_strip",
    "text_winnowing", "tpch_q1", "tpch_q21", "tpch_q9",
]


def main() -> None:
    out_path = "/tmp/phantom_probe.json"
    args = sys.argv[1:]
    if len(args) == 2 and args[0] == "--out":
        out_path = args[1]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "tidb-spark-phantom", **{"spark.ui.showConsoleProgress": "false"}
    )
    jvm = spark.sparkContext._jvm
    mgmt = jvm.java.lang.management.ManagementFactory
    comp = mgmt.getCompilationMXBean()

    def gc_ms() -> float:
        total = 0
        it = mgmt.getGarbageCollectorMXBeans().iterator()
        while it.hasNext():
            total += it.next().getCollectionTime()
        return float(total)

    def timed(q):
        """(wall_s, jit_compile_delta_ms, gc_delta_ms) of one noop run."""
        j0, g0 = comp.getTotalCompilationTime(), gc_ms()
        t0 = time.perf_counter()
        q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        return round(wall, 4), comp.getTotalCompilationTime() - j0, gc_ms() - g0

    bench.warmup(spark, sf_dir)
    registry = all_queries()
    names = sorted(registry)
    prewarm_dir = "/root/testdata/sf0.001"

    results: dict[str, dict] = {}
    for name in names:
        q = registry[name]
        try:
            q.spark(spark, prewarm_dir).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception:
            pass
        spark.sparkContext._jvm.System.gc()
        rec: dict = {}
        rec["run1"] = timed(q)
        if name in WATCH:
            rec["run2"] = timed(q)
            bench._flush_all_cache(spark)
            rec["run3_postflush"] = timed(q)
        results[name] = rec
        print(json.dumps({name: rec}), flush=True)

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"# wrote {out_path}")


if __name__ == "__main__":
    main()
