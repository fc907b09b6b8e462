"""Multimodal anti-scaling probe (r12 verdict item 3): the family runs
39% FASTER at 8 cores than at 32 (5.79 vs 9.47 s driver-visible), i.e.
the cost is per-task/per-stage overhead, not codec compute (pure-Python
floor for the whole mp4 query's mux+demux is 0.11 s single-threaded).

For each multimodal query: reps timed runs at the session's core count,
plus a breakdown from the Spark status API — number of jobs, stages,
tasks, and per-stage executor-run-time sums — so 8c vs 32c diffs show
WHERE the extra wall goes (more tasks × fixed overhead vs slower tasks).

Usage: SPARK_GRAFT_CPUS=32 python scripts/mm_probe.py [--reps N]
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

QUERIES = [
    "multimodal_meta", "multimodal_features", "multimodal_frames",
    "multimodal_jpeg_decode", "multimodal_mp4_demux",
    "multimodal_mpeg_scan", "multimodal_resize",
]


def main() -> None:
    reps = 3
    args = sys.argv[1:]
    if len(args) == 2 and args[0] == "--reps":
        reps = int(args[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "tidb-spark-mmprobe", **{"spark.ui.showConsoleProgress": "false"}
    )
    bench.warmup(spark, sf_dir)
    registry = all_queries()
    tracker = spark.sparkContext.statusTracker()

    for name in QUERIES:
        q = registry[name]
        # prewarm (plan shape + python workers)
        try:
            q.spark(spark, "/root/testdata/sf0.01").write.mode(
                "overwrite"
            ).format("noop").save()
        except Exception as e:
            print(f"# prewarm failed {name}: {e!r}", file=sys.stderr)
        spark.sparkContext._jvm.System.gc()
        walls = []
        jobs_before = set(tracker.getJobIdsForGroup(None) or [])
        for _ in range(reps):
            t0 = time.perf_counter()
            q.spark(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            walls.append(round(time.perf_counter() - t0, 4))
        jobs_after = set(tracker.getJobIdsForGroup(None) or [])
        new_jobs = sorted(jobs_after - jobs_before)
        n_stages = 0
        n_tasks = 0
        for jid in new_jobs:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is None:
                    continue
                n_stages += 1
                n_tasks += si.numTasks
        print(
            json.dumps(
                {
                    "query": name,
                    "walls": walls,
                    "best": min(walls),
                    "jobs": len(new_jobs),
                    "stages": n_stages,
                    "tasks": n_tasks,
                    "per_rep_jobs": round(len(new_jobs) / reps, 1),
                    "per_rep_stages": round(n_stages / reps, 1),
                    "per_rep_tasks": round(n_tasks / reps, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
